package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, EmptyBlock, ExprCode, FalseLiteral, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order key: round-robin bit-interleave of 2-4 per-column RANKS
  * (each a 16-bit value, 0..65535) into one long — bit j of child i
  * lands at position j*n + i, so a sort by the result clusters rows
  * that are close in EVERY dimension (the space-filling-curve layout
  * `OPTIMIZE … ZORDER BY` writes; the Delta/Iceberg clustering idiom).
  * Rank construction (min/max scaling, null→0) happens in the caller —
  * this is the pure bit kernel, codegen'd via a static call so the
  * clustering pass stays inside whole-stage codegen. Null inputs rank
  * as 0 (callers coalesce; defensive here so the expression is total). */
case class InterleaveBits(children: Seq[Expression]) extends Expression {
  require(children.size >= 2 && children.size <= 4,
    s"interleave_bits takes 2-4 rank columns, got ${children.size}")

  /** Ranks must be BIGINT (cast explicitly): without the check, a
    * non-long child passes analysis and the interpreted eval path
    * (constant folding, non-codegen contexts) throws CCE. */
  override def checkInputDataTypes(): TypeCheckResult =
    children.zipWithIndex.collectFirst {
      case (c, i) if c.dataType != LongType =>
        TypeCheckResult.TypeCheckFailure(
          s"interleave_bits argument ${i + 1} must be BIGINT, got " +
            c.dataType.sql)
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def prettyName: String = "interleave_bits"

  override def eval(input: InternalRow): Any = {
    val n = children.size
    var z = 0L
    var i = 0
    while (i < n) {
      val v = children(i).eval(input)
      val r = if (v == null) 0L else v.asInstanceOf[Long]
      var j = 0
      while (j < 16) {
        z |= ((r >>> j) & 1L) << (j * n + i)
        j += 1
      }
      i += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val args = evals
      .map(e => s"(${e.isNull} ? 0L : (long)${e.value})").mkString(", ")
    val codes = evals.map(_.code).padTo(4, EmptyBlock)
    val z = ctx.freshName("zval")
    ev.copy(
      code = code"""
        ${codes(0)}
        ${codes(1)}
        ${codes(2)}
        ${codes(3)}
        final long $z = graft.functions.ZOrderKernel.interleave($args);
      """,
      isNull = FalseLiteral,
      value = JavaCode.variable(z, LongType))
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
}

object ZOrderKernel {
  @inline private def spread(r: Long, n: Int, i: Int): Long = {
    var z = 0L
    var j = 0
    while (j < 16) {
      z |= ((r >>> j) & 1L) << (j * n + i)
      j += 1
    }
    z
  }
  def interleave(a: Long, b: Long): Long =
    spread(a, 2, 0) | spread(b, 2, 1)
  def interleave(a: Long, b: Long, c: Long): Long =
    spread(a, 3, 0) | spread(b, 3, 1) | spread(c, 3, 2)
  def interleave(a: Long, b: Long, c: Long, d: Long): Long =
    spread(a, 4, 0) | spread(b, 4, 1) | spread(c, 4, 2) | spread(d, 4, 3)
}
