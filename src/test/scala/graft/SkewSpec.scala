package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salting correctness: salted shapes must be row-identical to their
  * unsalted equivalents — the skew mitigation may only change the
  * physical distribution, never the result. */
class SkewSpec extends SparkTestBase {

  import spark.implicits._

  // 90% of rows share one hot key — the shape AQE's splitter can help
  // with but a salted join handles without runtime re-planning.
  private lazy val big =
    spark.range(0, 20000).select(
      when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100)
        .as("k"),
      col("id").as("payload"))

  private lazy val small =
    (0L until 100L).map(k => (k, s"dim$k")).toDF("k", "name")

  test("AQE skew-join split fires on a hot-key shuffle join in local " +
      "mode (cluster-story: the runtime mitigation the operators lean on)") {
    // The Skew/RangeJoin scaladocs delegate hot-PROBE-partition
    // handling to AQE's skew-join splitter; this pins that the
    // mechanism actually engages on this engine's plans rather than
    // existing only in documentation. Thresholds are lowered so the
    // ~90%-hot-key exchange qualifies at test scale; the assertions
    // are on the FINAL adaptive plan.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val bigger = spark.range(0, 400000).select(
        when(col("id") % 10 =!= 0, lit(1L)).otherwise(col("id") % 100)
          .as("k"),
        concat(lit("payload_padding_padding_"), col("id")).as("payload"))
      val j = bigger.join(small, "k")
      // Execute THIS dataframe (count() would plan a separate query
      // execution and leave j's adaptive plan unexecuted), then read
      // the final adaptive plan. Every k has a dim row.
      assert(j.collect().length == 400000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true") || plan.contains("isSkew=true") ||
        plan.contains("skewed"),
        "AQE skew-join split did not engage:\n" + plan.take(3000))
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }

  test("saltedJoin ≡ plain join on a 90%-hot-key dataset") {
    val plain = big.join(small, "k")
      .select("k", "payload", "name").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
      .select("k", "payload", "name").collect().toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }

  test("saltedJoin never plans a static broadcast of the replicated side") {
    // Catalyst's estimate for the salt-explode misses the salt×
    // multiplication, so without the pinned strategy a column-pruned
    // small side under the broadcast threshold gets statically
    // broadcast — and materializes salt× bigger at runtime (the 300×
    // probe measured a 9.7 GiB attempt against the 8 GiB cap). The
    // small side here is KBs — the exact shape the estimate mis-plans.
    val plan = Skew.saltedJoin(big, small, "k", salt = 8)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastExchange"), plan.take(2000))
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
  }

  test("saltedJoin spreads the hot key over multiple sub-keys") {
    // Internal shape check: the salted big side must place the hot key
    // in >1 salt bucket, otherwise nothing was gained.
    val buckets = big.withColumn("__salt", (rand(42) * 8).cast("int"))
      .filter(col("k") === 1L)
      .select("__salt").distinct().count()
    assert(buckets > 1)
  }

  test("exact distinct per key runs as two hash aggregates, no per-key array") {
    // Scale invariant for q_skew_salted_agg: the plan must never
    // materialize a key's full distinct set in one row. Two codegen
    // HashAggregates (dedup on the composite, then count) — no
    // object-hash collect of arrays anywhere.
    val df = graft.queries.OperatorQueries.qSkewSaltedAgg(spark, sf)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ObjectHashAggregate"), plan.take(2000))
    assert(!plan.contains("collect_list") && !plan.contains("collect_set"),
      plan.take(2000))
    assert(plan.contains("HashAggregate"), plan.take(2000))
  }

  test("saltedAggregate collect_list merges to the same multiset") {
    val plain = big.groupBy("k").agg(count(lit(1)).as("n"),
        sum(col("payload")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedAggregate(big, Seq("k"),
        partial = struct(count(lit(1)).as("n"), sum("payload").as("s")),
        partialName = "p",
        merge = struct(sum("p.n").cast("long").as("n"),
          sum("p.s").cast("long").as("s")),
        mergeName = "m", salt = 8)
      .select(col("k"), col("m.n"), col("m.s"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == plain)
  }
}
