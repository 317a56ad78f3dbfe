package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Plan-shape guards for the 100 TB path: these assertions pin the
  * physical-plan properties that keep the engine scalable — filter
  * pushdown reaching the parquet scan, column pruning shrinking
  * ReadSchema, broadcast joins for dimensions, and whole-stage codegen
  * over the hot expressions. A regression here doesn't change results
  * (the oracle gate stays green) but silently costs orders of magnitude
  * at scale — exactly the class of bug correctness tests can't catch. */
class PlanQualitySpec extends SparkTestBase {

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }

  private def planString(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filters are pushed down to the parquet scan") {
    val li = Tables(spark, sf, "lineitem")
      .filter(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val s = scans(li)
    assert(s.nonEmpty)
    val pushed = s.head.metadata("PushedFilters")
    assert(pushed.contains("GreaterThan(l_quantity"), pushed)
  }

  test("column pruning shrinks ReadSchema to the projected columns") {
    val li = Tables(spark, sf, "lineitem").select("l_orderkey", "l_tax")
    val schema = scans(li).head.requiredSchema.fieldNames.toSet
    assert(schema == Set("l_orderkey", "l_tax"), schema)
  }

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
  import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}

  // Collect across AQE stage boundaries (collect() alone stops at them).
  private def nodes(p: SparkPlan): Seq[SparkPlan] = p.collect {
    case a: AdaptiveSparkPlanExec => a +: nodes(a.executedPlan)
    case q: QueryStageExec => q +: nodes(q.plan)
    case n => Seq(n)
  }.flatten

  private def readsLineitem(p: SparkPlan): Boolean = nodes(p).exists {
    case f: FileSourceScanExec =>
      f.metadata.get("Location").exists(_.contains("lineitem"))
    case _ => false
  }

  // True iff fact-cardinality lineitem rows reach this node — i.e. the
  // subtree scans lineitem with no aggregate in between (a partial agg
  // collapses cardinality, so post-agg exchanges are cheap by design).
  private def factFlow(p: SparkPlan): Boolean = p match {
    case _ if p.getClass.getSimpleName.contains("Aggregate") => false
    case f: FileSourceScanExec =>
      f.metadata.get("Location").exists(_.contains("lineitem"))
    case a: AdaptiveSparkPlanExec => factFlow(a.executedPlan)
    case q: QueryStageExec => factFlow(q.plan)
    case n => n.children.exists(factFlow)
  }

  /** The scale invariant for fact-side joins: lineitem is never the
    * build side of a broadcast (a driver-built hash table of a
    * data-proportional relation cannot exist at 100×), and at most ONE
    * exchange ever carries fact-cardinality rows. */
  private def assertFactPlanSound(df: DataFrame): Unit = {
    df.collect() // finalize the adaptive plan
    val all = nodes(df.queryExecution.executedPlan)
    val liBroadcasts = all.collect {
      case b: BroadcastExchangeExec if readsLineitem(b) => b }
    assert(liBroadcasts.isEmpty, "lineitem must never be broadcast")
    val factShuffles = all.collect {
      case e: ShuffleExchangeExec if factFlow(e.child) => e }
    assert(factShuffles.size <= 1,
      s"lineitem shuffled at full cardinality ${factShuffles.size} times")
  }

  test("q5: bounded dims broadcast; lineitem never broadcast, shuffled at most once") {
    val df = graft.queries.AnalyticQueries.q5RegionRevenue(spark, sf)
    assertFactPlanSound(df) // runs (and finalizes) the query once
    // The bounded dimension chain (region -> nation -> supplier) still
    // broadcasts; data-proportional sides (orders, customer) must not
    // pin a driver-built hash table — shuffle-hash or AQE's choice.
    assert(nodes(df.queryExecution.executedPlan)
      .exists(_.getClass.getSimpleName.contains("BroadcastHashJoin")),
      "expected the dimension chain to broadcast")
  }

  test("q3: lineitem never broadcast, shuffled at most once") {
    assertFactPlanSound(
      graft.queries.AnalyticQueries.q3TopRevenue(spark, sf))
  }

  test("dedup scoring runs inside whole-stage codegen, computed once") {
    val df = graft.queries.DedupQueries.qDedupSimhash(spark, sf)
    df.collect() // finalize THIS query execution's adaptive plan
    // (count() would spawn a separate QueryExecution)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("simhash64"), plan.take(500))
    // The signature computation sits under a WholeStageCodegen span
    // (printed as a `*(n)` operator prefix in the finalized plan).
    assert("""\*\(\d+\) Project \[[^\n]*simhash64""".r
      .findFirstIn(plan).isDefined, plan.take(2000))
    // Non-nullable input keeps the kernel out of inlined isnotnull
    // filters — one evaluation per join side, never inside a Filter.
    assert(!plan.contains("isnotnull(simhash64"), plan.take(2000))
  }

  test("co-bucketed tables join with zero exchanges") {
    graft.sources.BucketedTables.create(spark, "bt_orders",
      Tables(spark, sf, "orders").select("o_orderkey", "o_totalprice"),
      "o_orderkey", 4)
    graft.sources.BucketedTables.create(spark, "bt_lineitem",
      Tables(spark, sf, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
      "o_orderkey", 4)
    val j = graft.sources.BucketedTables
      .colocatedJoin(spark, "bt_orders", "bt_lineitem", "o_orderkey")
    j.collect()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning"),
      "co-located join must not shuffle:\n" + plan.take(2000))
  }

  test("exported mpp tables aggregate and join with zero exchanges") {
    import java.nio.file.Files
    val e = new graft.mpp.MppEngine(spark,
      Files.createTempDirectory("graft-exb").toString)
    e.sql("CREATE TABLE li_d(k BIGINT, q DOUBLE) PARTITION BY (k) WITH BUCKETS 4")
    e.sql("CREATE TABLE ord_d(k BIGINT, p DOUBLE) PARTITION BY (k) WITH BUCKETS 4")
    e.insertInto("li_d", spark.range(0, 2000).toDF("k")
      .withColumn("q", col("k") * 0.5))
    e.insertInto("ord_d", spark.range(0, 500).toDF("k")
      .withColumn("p", col("k") * 2.0))
    e.exportBucketed("li_d", "exb_li")
    e.exportBucketed("ord_d", "exb_ord")
    // groupBy on the partition column: partial+final agg, NO Exchange.
    val agg = spark.table("exb_li").groupBy("k").count()
    agg.collect()
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      "co-located aggregate must not shuffle:\n" + aggPlan.take(2000))
    // join on the partition column: bucket-zipped, NO Exchange.
    val j = graft.sources.BucketedTables
      .colocatedJoin(spark, "exb_li", "exb_ord", "k")
    j.collect()
    val jPlan = j.queryExecution.executedPlan.toString
    assert(!jPlan.contains("Exchange hashpartitioning"),
      "co-located join must not shuffle:\n" + jPlan.take(2000))
    // And the export is row-faithful to the distributed table.
    assert(spark.table("exb_li").count() == e.table("li_d").count())
  }

  test("distributed-table point lookup schedules only the pruned bucket") {
    import java.nio.file.Files
    val e = new graft.mpp.MppEngine(spark,
      Files.createTempDirectory("graft-pq").toString)
    e.sql("CREATE TABLE pq(id BIGINT, v DOUBLE) PARTITION BY (id) WITH BUCKETS 8")
    e.insertInto("pq", spark.range(0, 1000).toDF("id")
      .withColumn("v", col("id") * 0.5))
    val q = e.table("pq").filter(col("id") === 123L)
    // Partition-directory pruning: the scan's selected partitions == 1.
    val scan = scans(q).head
    assert(scan.relation.location.listFiles(scan.partitionFilters, Nil)
      .size == 1)
  }
}
