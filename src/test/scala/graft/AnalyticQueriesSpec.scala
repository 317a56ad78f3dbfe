package graft

import org.apache.spark.sql.Row

import graft.queries.AnalyticQueries

class AnalyticQueriesSpec extends SparkTestBase {

  // Every inventory query runs and yields rows on the smoke scale factor.
  for ((name, fn) <- AnalyticQueries.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows on sf0.001") {
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned no rows")
    }
  }

  test("q1 aggregates are consistent with raw lineitem") {
    val li = Tables(spark, sf, "lineitem")
    val total = AnalyticQueries.q1PricingSummary(spark, sf)
      .agg(org.apache.spark.sql.functions.sum("count_order")).head().getLong(0)
    val expected = li.filter(org.apache.spark.sql.functions.col("l_shipdate") <=
      org.apache.spark.sql.functions.lit("2001-09-01").cast("timestamp")).count()
    assert(total == expected)
  }

  test("semi + anti join partition the customer table w.r.t. predicate") {
    val semi = AnalyticQueries.qSemiJoin(spark, sf).count()
    val urgentCusts = Tables(spark, sf, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .select("o_custkey").distinct().count()
    assert(semi == urgentCusts)
  }

  test("window topn emits at most 3 rows per customer") {
    val df = AnalyticQueries.qWindowTopN(spark, sf)
    val overLimit = df.groupBy("o_custkey").count()
      .filter(org.apache.spark.sql.functions.col("count") > 3).count()
    assert(overLimit == 0)
  }

  test("rollup contains the grand total row") {
    val rows = AnalyticQueries.qRollup(spark, sf)
      .filter("returnflag = 'ALL' AND linestatus = 'ALL'").collect()
    assert(rows.length == 1)
    val totalN = rows.head.getAs[Long]("n")
    assert(totalN == Tables(spark, sf, "lineitem").count())
  }

  test("cross join cardinality = |region| * |nation|") {
    assert(AnalyticQueries.qCrossJoin(spark, sf).count() == 5L * 25L)
  }

  test("broadcast hint survives into q5 physical plan") {
    val plan = AnalyticQueries.q5RegionRevenue(spark, sf)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"), "expected broadcast joins in q5")
  }
}
