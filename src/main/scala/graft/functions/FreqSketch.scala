package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch as a native Catalyst aggregate —
  * the "novel sketch" slot of the builder brief's custom-operator list.
  *
  * Why a sketch: exact top-k over a high-cardinality column shuffles
  * EVERY distinct key (`groupBy(col).count()` — at 100 TB of tokens
  * that is billions of keys through the exchange). The sketch pass
  * shuffles nothing but one `capacity`-entry summary per partition
  * (partial aggregation merges them tree-wise), and the follow-up
  * recount touches only the ≤ `capacity` surviving candidates.
  *
  * Guarantees (classic MG + the mergeability result of Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with capacity m over N rows, every
  * estimate undercounts by at most N/(m+1), and — because [[merge]]
  * subtracts the (m+1)-th largest count rather than truncating — the
  * bound survives arbitrary distributed merge trees. Hence any item
  * with true frequency > N/(m+1) is GUARANTEED to survive with a
  * positive count; [[topKExact]] exploits that for exact top-k.
  *
  * Update is amortized O(1): each decrement-all costs O(m) but burns m
  * prior increments, and increments are bounded by rows seen.
  */
case class FreqSketchAgg(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  require(capacity > 0, s"freq_sketch capacity must be positive: $capacity")

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String]
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None if buf.size < capacity =>
          // Clone: unsafe-row UTF8Strings point into a reused buffer.
          buf.update(key.clone(), 1L)
        case None =>
          // Full and unseen: decrement everyone, drop the zeroed (the
          // new item is charged too, i.e. not inserted).
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c > 0)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long])
      : mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // Subtract the (capacity+1)-th largest count from everyone: the
      // error-preserving merge reduction (NOT a top-m truncation, which
      // would break the N/(m+1) bound).
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val v = counts(buf.size - capacity - 1)
      buf.mapValuesInPlace((_, c) => c - v)
      buf.filterInPlace((_, c) => c > 0)
    }
    buf
  }

  /** array<struct<item,count>> sorted by estimate desc, item asc —
    * deterministic output for a given buffer. */
  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    val entries = buf.toArray
    java.util.Arrays.sort(entries,
      (a: (UTF8String, Long), b: (UTF8String, Long)) => {
        val byCount = java.lang.Long.compare(b._2, a._2)
        if (byCount != 0) byCount else a._1.compareTo(b._1)
      })
    new GenericArrayData(entries.map { case (k, c) =>
      new GenericInternalRow(Array[Any](k, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long])
      : Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (k, c) =>
      val b = k.getBytes
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(UTF8String.fromBytes(b), in.readLong())
      i += 1
    }
    buf
  }

  override def dataType: DataType = FreqSketch.resultType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"freq_sketch expects a string column, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketch {

  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))),
    containsNull = false)

  private def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "freq_sketch", {
        case Seq(c) => FreqSketchAgg(c, 1024)
        case Seq(c, Literal(cap: Int, IntegerType)) => FreqSketchAgg(c, cap)
        case other => throw new IllegalArgumentException(
          s"freq_sketch(col[, capacity-literal]), got ${other.size} args")
      }, "built-in")

  /** The sketch as an aggregate Column:
    * `df.agg(FreqSketch.sketch(spark, col, m))` →
    * array<struct<item,count>> of ≤ m candidates, estimates
    * undercounting by ≤ N/(m+1). */
  def sketch(spark: SparkSession, col: Column, capacity: Int): Column = {
    register(spark)
    call_function("freq_sketch", col, lit(capacity))
  }

  /** Exact distributed top-k, SELF-CERTIFYING, ≤ 2 data passes on every
    * path. Convenience wrapper over [[topKExactDecided]] for callers
    * that only want the result. */
  def topKExact(df: DataFrame, column: String, k: Int,
      capacity: Int): DataFrame =
    topKExactDecided(df, column, k, capacity)._1

  /** Rows of the certifiability probe — a prefix window this size is
    * scanned (two driver-cheap jobs) before committing to a sketch
    * pass. 64k is large enough to see a head if one exists and small
    * enough to be planning-noise at any scale. */
  private val ProbeRows = 65536

  /** Exact distributed top-k with the chosen plan returned alongside
    * ("lossless" | "certified" | "fallback" | "probed-fallback") — the
    * decision is per-call state, not a shared var, so concurrent
    * callers cannot misreport each other (round-5 ADVICE).
    *
    * NULL semantics: NULL items are NOT candidates on ANY path — the
    * sketch never stores them, `n` counts only non-null rows, and the
    * exact fallback filters them — so the result is identical
    * whichever plan fires (round-5 ADVICE: previously the fallback
    * could seat a NULL group the sketch paths could never return, and
    * `count(lit(1))` inflated ε with rows the sketch never saw).
    *
    * Plan choice:
    *
    *  0. PROBE: a ≤ [[ProbeRows]] prefix is exactly counted and the
    *     certificate below is projected onto it with a 2× safety
    *     margin. If even the probe's k-th heaviest item cannot beat
    *     2× its projected ε while the probe's vocabulary already
    *     outgrew the capacity, the data is flat — the sketch pass
    *     cannot certify and would be pure overhead on top of the
    *     exact aggregate, so go straight to the exact plan (ONE full
    *     pass instead of two). The probe is a plan heuristic only:
    *     a wrong "flat" call costs speed never correctness (the
    *     exact plan is always right), and a wrong "skewed" call just
    *     restores the old sketch-then-fallback behavior.
    *  1. Sketch pass: aggregates the sketch plus the non-null count
    *     (shuffles one ≤ capacity-entry summary per partition, never
    *     the keys). The tight mergeable MG bound — every decrement
    *     burns capacity+1 units of mass, so any item ABSENT from the
    *     sketch has true count ≤ ε = (N − Σ estimates)/(capacity+1),
    *     and every estimate undercounts by ≤ ε — then decides:
    *     ε = 0 → the sketch IS the exact histogram, top-k returned
    *     directly (one pass total); k-th estimate > ε → pass 2
    *     exactly recounts the ≤ capacity candidates, PROVEN exact;
    *     otherwise the full exact aggregate (correctness never
    *     depends on the data shape, only the speed does). */
  def topKExactDecided(df: DataFrame, column: String, k: Int,
      capacity: Int, probeRows: Int = ProbeRows): (DataFrame, String) = {
    val spark = df.sparkSession
    val nonNull = df.filter(col(column).isNotNull)
    def exactPlan: DataFrame = nonNull
      .groupBy(col(column))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col(column).asc)
      .limit(k)
    // --- 0. certifiability probe ------------------------------------
    val window = nonNull.select(col(column).as("__v")).limit(probeRows)
    val topCounts = window.groupBy(col("__v"))
      .agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc).limit(capacity)
      .collect().map(_.getLong(1))
    val windowN = window.count()
    if (windowN >= probeRows) {
      val windowEps = (windowN - topCounts.sum) / (capacity + 1)
      val certifiable = topCounts.length >= k &&
        topCounts(k - 1) > 2 * windowEps
      val vocabOutgrown = windowEps > 0
      if (vocabOutgrown && !certifiable) return (exactPlan, "probed-fallback")
    }
    // --- 1. sketch pass ----------------------------------------------
    val first = df.agg(sketch(spark, col(column), capacity).as("s"),
        count(col(column)).as("n"))
      .selectExpr("transform(s, x -> x.item) AS items",
        "transform(s, x -> x.count) AS ests", "n")
      .collect()(0)
    val (cands, ests, n) = (first.getSeq[String](0),
      first.getSeq[Long](1), first.getLong(2))
    val eps = (n - ests.sum) / (capacity + 1)
    def local(rows: Seq[(String, Long)]): DataFrame = {
      import spark.implicits._
      rows.toDF(column, "cnt")
        .orderBy(col("cnt").desc, col(column).asc)
    }
    if (eps == 0L) { // lossless: estimates are the exact counts
      // eval() ordering is (count desc, item asc) already.
      (local(cands.zip(ests).take(k)), "lossless")
    } else if (ests.length >= k && ests(k - 1) > eps) {
      // certified: recount >= estimate > eps, known up front
      val recounted = df.filter(col(column).isin(cands: _*))
        .groupBy(col(column))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col(column).asc)
        .limit(k)
        .collect()
      (local(recounted.toIndexedSeq
        .map(r => (r.getString(0), r.getLong(1)))), "certified")
    } else {
      (exactPlan, "fallback")
    }
  }
}
