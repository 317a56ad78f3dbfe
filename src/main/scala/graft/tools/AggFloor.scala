package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component decomposition for the residual perf-weak rows: times each
  * layer of a query separately so the gap to the DuckDB oracle can be
  * attributed to a specific cost (scan, exchange, per-row aggregate
  * update, final sort) rather than hand-waved.
  * Each variant runs `reps` times after one warm pass; caller takes
  * the min.
  *
  * Usage: runMain graft.tools.AggFloor <dir> [set]
  *   set = "stats" (default): q_distinct_agg / q_stats_approx layers
  *         (round-10 what's-wrong #1/#2 — BASELINE §19.3)
  *   set = "crossover": q_outer_join_agg / q_setops / q_retention /
  *         q_rollup layers (round-12 verdict items 3-4 — the two
  *         plan-fixed crossover rows and the two unexplained
  *         regressions; BASELINE §23)
  */
object AggFloor {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val set = args.lift(1).getOrElse("stats")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
    val li = graft.Tables(spark, dir, "lineitem")
    def bm(c: String) =
      graft.functions.BitmapDistinct.distinctCount(spark, col(c))
    def pct(c: String, ps: Double*) =
      graft.functions.ExactPercentiles.percentiles(spark, col(c), ps: _*)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      // -- q_distinct_agg layers --
      ("scan_group_count", () => li.groupBy("l_returnflag")
        .agg(count(col("l_orderkey")), count(col("l_partkey")),
          count(col("l_suppkey")))),
      ("bitmap_x1_orderkey", () => li.groupBy("l_returnflag")
        .agg(bm("l_orderkey"))),
      ("bitmap_x1_suppkey", () => li.groupBy("l_returnflag")
        .agg(bm("l_suppkey"))),
      ("bitmap_x3", () => li.groupBy("l_returnflag")
        .agg(bm("l_orderkey"), bm("l_partkey"), bm("l_suppkey"))),
      ("catalyst_distinct_x3", () => li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_orderkey")),
          countDistinct(col("l_partkey")),
          countDistinct(col("l_suppkey")))),
      // -- q_stats_approx layers --
      ("pct_map_qty", () => li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)"))),
      ("pct_array_price", () => li.groupBy("l_returnflag")
        .agg(pct("l_extendedprice", 0.9, 0.99))),
      ("pct_approx_both", () => li.groupBy("l_returnflag")
        .agg(expr("percentile_approx(l_quantity, 0.5, 2000)"),
          expr("percentile_approx(l_extendedprice, array(0.9,0.99), 2000)"))),
      ("stats_approx_all4", () => li.groupBy("l_returnflag")
        .agg(expr("percentile(l_quantity, 0.5)"),
          pct("l_extendedprice", 0.9, 0.99),
          expr("percentile_approx(l_quantity, 0.5, 2000)"),
          expr("percentile_approx(l_extendedprice, array(0.9,0.99), 2000)"))))
    // Crossover/regression layers: each variant adds exactly one plan
    // component, so min(variant_{i+1}) - min(variant_i) is that
    // component's cost and the first variant is the bare scan floor.
    val ords = graft.Tables(spark, dir, "orders")
    val cust = graft.Tables(spark, dir, "customer")
    val ev = graft.Tables(spark, dir, "events")
    def ordAgg = ords.groupBy(col("o_custkey"))
      .agg(count(col("o_orderkey")).as("n"),
        sum(col("o_totalprice")).as("sp"))
    def oja = cust
      .join(ordAgg, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(col("c_custkey"),
        coalesce(col("n"), lit(0L)).as("n_orders"),
        round(coalesce(col("sp"), lit(0.0)), 4).as("total_spent"))
    def setA = cust.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey").as("k"), lit(1).as("in_a"), lit(0).as("in_b"))
    def setB = ords.filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_custkey").as("k"), lit(0).as("in_a"), lit(1).as("in_b"))
    def setAgg = setA.unionAll(setB).groupBy(col("k"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    def setFull = setAgg.select(col("k"), explode(array(
        lit("union"),
        when(col("in_a") === 1 && col("in_b") === 1, "intersect"),
        when(col("in_a") === 1 && col("in_b") === 0, "except")))
        .as("tag"))
      .filter(col("tag").isNotNull)
      .select(col("tag"), col("k"))
    def retDays = ev.select(col("user_id"), col("ts").cast("date").as("d"))
    def retAgg = retDays.groupBy("user_id")
      .agg(min("d").as("cohort"), collect_set(col("d")).as("days"))
    def retFull = retAgg.select(col("cohort"), explode(col("days")).as("d"))
      .groupBy(col("cohort"),
        datediff(col("d"), col("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
    def rollPre = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("pn"), sum("l_quantity").as("pq"))
    def rollFull = rollPre
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("pn").as("n"), round(sum("pq"), 4).as("sum_qty"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("n"), col("sum_qty"))
    val crossover: Seq[(String, () => DataFrame)] = Seq(
      // -- q_outer_join_agg layers --
      ("oja_1_orders_scan", () => ords.select(col("o_custkey"),
        col("o_orderkey"), col("o_totalprice"))),
      ("oja_2_orders_agg", () => ordAgg),
      ("oja_3_join", () => oja),
      ("oja_4_full_sorted", () => oja.orderBy("c_custkey")),
      // -- q_setops layers --
      ("set_1_scans", () => setA.unionAll(setB)),
      ("set_2_agg", () => setAgg),
      ("set_3_explode", () => setFull),
      ("set_4_full_sorted", () => setFull.orderBy("tag", "k")),
      // -- q_retention layers --
      ("ret_1_events_scan", () => retDays),
      ("ret_2_minonly_agg", () => retDays.groupBy("user_id")
        .agg(min("d").as("cohort"))),
      ("ret_3_collect_set", () => retAgg),
      ("ret_4_reagg", () => retFull),
      ("ret_5_full_sorted", () => retFull.orderBy("cohort", "day_offset")),
      // -- q_rollup layers --
      ("roll_1_lineitem_scan", () => li.select(col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"))),
      ("roll_2_preagg", () => rollPre),
      ("roll_3_rollup", () => rollFull),
      ("roll_4_full_sorted", () => rollFull
        .orderBy("returnflag", "linestatus")))
    println("variant,rep,sec")
    (if (set == "crossover") crossover else variants).foreach {
      case (name, f) =>
      f().queryExecution.toRdd.count() // warm
      (1 to reps).foreach { rep =>
        System.gc()
        val t0 = System.nanoTime()
        f().queryExecution.toRdd.count()
        println(f"$name,$rep,${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
