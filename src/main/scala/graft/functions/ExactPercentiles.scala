package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._

/** Exact interpolated percentiles over a CONTINUOUS double column as a
  * primitive-array aggregate.
  *
  * Spark's built-in `percentile` accumulates a value → count
  * OpenHashMap — the right shape for quantized domains (integer
  * quantities collapse to ≤ |domain| entries) and pure overhead for
  * continuous ones: nearly every count is 1, so the map pays boxing,
  * hashing, and an entry-array sort with weight bookkeeping to
  * represent what is just the value multiset. This aggregate stores
  * the raw doubles in a growable primitive array (the partials and the
  * exchange are exactly the 8-byte values — the information an exact
  * percentile irreducibly needs), merges by concatenation, sorts ONCE
  * per group at eval (dual-pivot primitive sort, no boxing), and
  * interpolates every requested quantile from the same sorted array:
  * `rank = q·(n−1); lo + (rank−⌊rank⌋)·(hi−lo)` — the formula both
  * Spark's `percentile` and DuckDB's `quantile_cont` implement, so
  * results agree with the built-in at 4-decimal resolution on every
  * tested domain.
  *
  * Scale bound, stated plainly: memory and exchange are O(rows in the
  * group) — the same bound the built-in already has (EXACT percentiles
  * require the values; there is no smaller sufficient statistic). The
  * mergeable-summary path for groups too large to hold is
  * `percentile_approx` (q_stats_approx's verdict protocol). NULLs are
  * skipped, matching the built-in. */
case class ExactPercentilesAgg(child: Expression, quantiles: Seq[Double],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ExactPercentilesAgg.Buf] {

  require(quantiles.nonEmpty && quantiles.forall(q => q >= 0 && q <= 1),
    s"quantiles must be in [0, 1]: $quantiles")

  override def createAggregationBuffer(): ExactPercentilesAgg.Buf =
    new ExactPercentilesAgg.Buf()

  override def update(buf: ExactPercentilesAgg.Buf,
      input: InternalRow): ExactPercentilesAgg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: ExactPercentilesAgg.Buf,
      other: ExactPercentilesAgg.Buf): ExactPercentilesAgg.Buf = {
    buf.addAll(other)
    buf
  }

  override def eval(buf: ExactPercentilesAgg.Buf): Any = {
    if (buf.n == 0) return null
    val a = buf.sortedValues()
    new GenericArrayData(quantiles.map { q =>
      val rank = q * (a.length - 1)
      val lo = rank.toInt
      val frac = rank - lo
      if (lo + 1 < a.length) a(lo) + frac * (a(lo + 1) - a(lo))
      else a(lo)
    }.toArray)
  }

  override def serialize(buf: ExactPercentilesAgg.Buf): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 + 8 * buf.n)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(buf.n)
    var i = 0
    while (i < buf.n) { out.putDouble(buf.values(i)); i += 1 }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): ExactPercentilesAgg.Buf = {
    val in = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val n = in.getInt
    val buf = new ExactPercentilesAgg.Buf(math.max(n, 8))
    var i = 0
    while (i < n) { buf.add(in.getDouble); i += 1 }
    buf
  }

  override def dataType: DataType =
    ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "exact_percentiles"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"exact_percentiles expects a double column, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(o: Int): ExactPercentilesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ExactPercentilesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ExactPercentilesAgg =
    copy(child = newChildren.head)
}

object ExactPercentilesAgg {
  /** Growable primitive double buffer — append, bulk-append, sort. */
  final class Buf(initialCapacity: Int = 64) {
    var values: Array[Double] = new Array[Double](initialCapacity)
    var n: Int = 0
    def add(v: Double): Unit = {
      if (n == values.length)
        values = java.util.Arrays.copyOf(values, values.length * 2)
      values(n) = v
      n += 1
    }
    def addAll(o: Buf): Unit = {
      if (n + o.n > values.length)
        values = java.util.Arrays.copyOf(values,
          math.max(values.length * 2, n + o.n))
      System.arraycopy(o.values, 0, values, n, o.n)
      n += o.n
    }
    def sortedValues(): Array[Double] = {
      val a = java.util.Arrays.copyOf(values, n)
      java.util.Arrays.sort(a)
      a
    }
  }
}

object ExactPercentiles {

  private def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "exact_percentiles", { args =>
        require(args.size >= 2, "exact_percentiles(col, q...)")
        val qs = args.tail.map {
          case Literal(d: Double, DoubleType) => d
          case other => throw new IllegalArgumentException(
            s"exact_percentiles quantiles must be double literals: $other")
        }
        ExactPercentilesAgg(args.head, qs)
      }, "built-in")

  /** `array(percentile(col, q), …)` — exact, one primitive buffer and
    * one sort for all requested quantiles; numeric inputs widen to
    * double. */
  def percentiles(spark: SparkSession, col: Column,
      qs: Double*): Column = {
    register(spark)
    call_function("exact_percentiles",
      (col.cast("double") +: qs.map(lit(_))): _*)
  }
}
