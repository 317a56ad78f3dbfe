package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** `bounded_collect_long(x, cap)` — collect up to `cap` long values per
  * group into a SORTED array, or NULL once the group exceeds `cap`.
  *
  * The scale-safe replacement for `collect_set`/`collect_list` in
  * guarded pair-generation aggregates (dedup candidate generators cap
  * docs-per-key at a boilerplate threshold): a stock collect holds the
  * ENTIRE group in memory before any size filter can discard it, so one
  * pathological key — a universal boilerplate fingerprint at 100 TB —
  * OOMs the aggregate. This buffer saturates at `cap + 1` elements BY
  * CONSTRUCTION (update and merge both stop retaining past the
  * saturation point; saturation itself is preserved through merges), so
  * per-group state is O(cap) regardless of data. NULL output = "over
  * the cap", exactly the groups the guard drops.
  *
  * Contract: inputs are assumed DISTINCT per group (the callers feed
  * (key, doc_id) relations deduplicated in-row), so bag semantics
  * equal set semantics and no dedup pass is paid. */
case class BoundedCollectLongAgg(child: Expression, cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.ArrayBuffer[Long]] {

  require(cap > 0, s"bounded_collect_long cap must be positive: $cap")

  // Buffer holds at most cap + 1 values; length == cap + 1 ⟺ saturated.
  override def createAggregationBuffer(): mutable.ArrayBuffer[Long] =
    mutable.ArrayBuffer.empty

  override def update(buf: mutable.ArrayBuffer[Long],
      input: InternalRow): mutable.ArrayBuffer[Long] = {
    val v = child.eval(input)
    if (v != null && buf.length <= cap) buf += v.asInstanceOf[Long]
    buf
  }

  override def merge(buf: mutable.ArrayBuffer[Long],
      other: mutable.ArrayBuffer[Long]): mutable.ArrayBuffer[Long] = {
    var i = 0
    while (i < other.length && buf.length <= cap) {
      buf += other(i); i += 1
    }
    buf
  }

  override def eval(buf: mutable.ArrayBuffer[Long]): Any =
    if (buf.length > cap) null
    else {
      val a = buf.toArray
      java.util.Arrays.sort(a)
      new GenericArrayData(a)
    }

  override def serialize(buf: mutable.ArrayBuffer[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.ArrayBuffer[Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i < n) { buf += in.readLong(); i += 1 }
    buf
  }

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "bounded_collect_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"bounded_collect_long expects bigint, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(o: Int): BoundedCollectLongAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedCollectLongAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BoundedCollectLongAgg =
    copy(child = newChildren.head)
}

object BoundedCollect {

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bounded_collect_long", exprs => {
        val cap = exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"bounded_collect_long expects a literal int cap, got $other")
        }
        BoundedCollectLongAgg(exprs.head, cap).toAggregateExpression()
      }, "built-in")

  /** Sorted array of up to `cap` longs per group, NULL beyond. */
  def boundedCollectLong(spark: SparkSession, x: Column,
      cap: Int): Column = {
    register(spark)
    call_function("bounded_collect_long", x, lit(cap))
  }
}
