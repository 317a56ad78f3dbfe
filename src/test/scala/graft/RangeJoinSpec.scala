package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

/** RangeJoin: exactness vs the brute-force cross-join filter, and the
  * plan invariant the operator exists for — NO nested-loop or cartesian
  * operator anywhere, only equi-joins on the bin key. */
class RangeJoinSpec extends SparkTestBase with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def assertNoNestedLoop(df: DataFrame): Unit = {
    df.count() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan
    val bad = collect(plan) {
      case p: SparkPlan
          if p.nodeName.contains("CartesianProduct") ||
            p.nodeName.contains("BroadcastNestedLoopJoin") => p.nodeName
    }
    assert(bad.isEmpty, s"range join fell back to ${bad.mkString(",")}:\n$plan")
  }

  // Points straddle bin edges, sit exactly on interval bounds, and cover
  // a negative domain (floorDiv must floor toward -inf, not truncate).
  private lazy val points = Seq(
    (1L, -25L), (2L, -10L), (3L, 0L), (4L, 7L), (5L, 10L), (6L, 13L),
    (7L, 20L), (8L, 29L), (9L, 30L), (10L, 47L), (11L, 100L),
  ).toDF("pid", "p")

  private lazy val intervals = Seq(
    (100L, -30L, -20L), (101L, -12L, 3L), (102L, 0L, 10L),
    (103L, 10L, 10L), (104L, 13L, 47L), (105L, 25L, 31L),
    (106L, 90L, 120L), (107L, 50L, 40L), // inverted: never matches
  ).toDF("iid", "lo", "hi")

  private def bruteforce: Seq[String] = sortedRows(
    points.as("l").crossJoin(intervals.as("r"))
      .filter($"p" >= $"lo" && $"p" <= $"hi")
      .select("pid", "p", "iid", "lo", "hi"))

  test("pointInInterval matches the cross-join oracle at several widths") {
    for (w <- Seq(1L, 7L, 10L, 1000L)) {
      val got = RangeJoin.pointInInterval(points, intervals,
        "p", "lo", "hi", binWidth = w)
      assert(sortedRows(got.select("pid", "p", "iid", "lo", "hi")) ==
        bruteforce, s"binWidth=$w")
    }
  }

  test("pointInInterval drops NULL points, NULL bounds, NULL keys") {
    val pts = Seq((1L, Option(5L), Option(1L)), (2L, None, Option(1L)),
      (3L, Option(5L), None)).toDF("pid", "p", "k")
    val ivs = Seq((10L, Option(0L), Option(9L), Option(1L)),
      (11L, None, Option(9L), Option(1L)),
      (12L, Option(0L), None, Option(1L))).toDF("iid", "lo", "hi", "k")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
      binWidth = 4L, keys = Seq("k"))
    assert(sortedRows(got.select("pid", "iid")) == Seq("[1,10]"))
  }

  test("keyed pointInInterval joins only within the key") {
    val pts = Seq((1L, 5L, "a"), (2L, 5L, "b")).toDF("pid", "p", "k")
    val ivs = Seq((10L, 0L, 9L, "a"), (11L, 0L, 9L, "c"))
      .toDF("iid", "lo", "hi", "k")
    val got = RangeJoin.pointInInterval(pts, ivs, "p", "lo", "hi",
      binWidth = 4L, keys = Seq("k"))
    assert(sortedRows(got.select("pid", "iid")) == Seq("[1,10]"))
  }

  test("intervalOverlap matches the cross-join oracle, no duplicates") {
    val left = Seq((1L, -25L, -5L), (2L, 0L, 100L), (3L, 10L, 12L),
      (4L, 40L, 41L), (5L, 60L, 50L)) // inverted: never matches
      .toDF("lid", "llo", "lhi")
    val right = Seq((10L, -10L, 2L), (11L, 11L, 90L), (12L, 200L, 300L),
      (13L, -100L, 150L)).toDF("rid", "rlo", "rhi")
    // Empty (inverted) intervals never match — documented semantics.
    val oracle = sortedRows(left.crossJoin(right)
      .filter($"llo" <= $"lhi" && $"rlo" <= $"rhi" &&
        $"llo" <= $"rhi" && $"rlo" <= $"lhi")
      .select("lid", "rid"))
    for (w <- Seq(1L, 7L, 64L, 1000L)) {
      val got = RangeJoin.intervalOverlap(left, right,
        "llo", "lhi", "rlo", "rhi", binWidth = w)
      val rows = got.select("lid", "rid").collect().map(_.toString).toSeq
      assert(rows.sorted == oracle, s"binWidth=$w")
      assert(rows.distinct.size == rows.size,
        s"duplicate pairs at binWidth=$w — first-shared-cell dedup broken")
    }
  }

  test("replication guard fails fast on a mis-sized binWidth") {
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    val wide = Seq((10L, 0L, 1000000L)).toDF("iid", "lo", "hi")
    // A 1M-cell interval at width 1 must raise, not OOM.
    val err = intercept[Exception] {
      RangeJoin.pointInInterval(pts, wide, "p", "lo", "hi",
        binWidth = 1L).count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(err).exists(_.contains("maxBinsPerInterval")), err)
    // The same interval passes with a sane width or a raised cap.
    assert(RangeJoin.pointInInterval(pts, wide, "p", "lo", "hi",
      binWidth = 1000L).count() == 1)
    assert(RangeJoin.pointInInterval(pts, wide, "p", "lo", "hi",
      binWidth = 1L, maxBinsPerInterval = 2000000).count() == 1)
  }

  test("no static broadcast of the bin-replicated side") {
    // Same estimate hole as Skew.saltedJoin: the explode's replication
    // (up to maxBinsPerInterval×) is invisible to the planner, so a
    // statically-chosen broadcast can blow the broadcast cap at scale.
    // Strategy is pinned shuffle-hash; AQE may upgrade from true sizes.
    val plan = RangeJoin.pointInInterval(points, intervals,
        "p", "lo", "hi", binWidth = 10L)
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("BroadcastExchange"), plan.take(2000))
    assert(plan.contains("ShuffledHashJoin"), plan.take(2000))
  }

  test("plan has no cartesian/nested-loop operator, keyed or keyless") {
    assertNoNestedLoop(RangeJoin.pointInInterval(points, intervals,
      "p", "lo", "hi", binWidth = 10L))
    val leftI = intervals.select($"iid".as("lid"), $"lo".as("llo"),
      $"hi".as("lhi"))
    assertNoNestedLoop(RangeJoin.intervalOverlap(leftI, intervals,
      "llo", "lhi", "lo", "hi", binWidth = 10L))
  }

  test("q_range_join is exact vs the unbinned equi-join formulation") {
    // Oracle: plain equi-join on user_id + range filter (correct, but
    // per-user quadratic — the shape the binned rewrite replaces).
    val ev = Tables(spark, sf, "events")
      .withColumn("t", date_trunc("second", col("ts")))
    val sessions = graft.streaming.EventStreams.sessionizeBatch(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("t").as("ts"), col("value")))
      .select(col("user_id"), col("session_start"), col("session_end"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t"), col("value"))
    val oracle = purchases.join(sessions, "user_id")
      .filter(col("t") >= col("session_start") &&
        col("t") <= col("session_end") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"), col("session_start"))
      .agg(count(lit(1)).as("n_purchases"),
        round(sum(col("value")), 4).as("purchase_value"))
    val got = graft.queries.OperatorQueries.qRangeJoin(spark, sf)
    assert(got.count() > 0, "q_range_join returned no rows at sf0.001")
    assert(sortedRows(got) == sortedRows(oracle))
  }
}
