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
