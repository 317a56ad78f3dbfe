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
    // Round-14 flagged-row layers (verdict item 2): the five rows that
    // stayed >2× vs the PAIRED oracle even warmed-isolated
    // (q_range_join, q5_region_revenue, q3_top_revenue,
    // q_colocated_dsv2, q_asof_join). Each sequence adds one plan
    // component so min(v_{i+1}) − min(v_i) prices that component; the
    // first variant is the row's scan floor, the full row comes from
    // SparkEntry so the decomposition brackets exactly what the bench
    // times.
    def entry(n: String) = graft.SparkEntry.queries(n)(spark, dir)
    val evd = graft.Tables(spark, dir, "events")
      .withColumn("t", date_trunc("second", col("ts")))
    def rjSessions = graft.streaming.EventStreams.sessionizeBatch(
        evd.filter(col("event_type") === "click")
          .select(col("user_id"), col("t").as("ts"), col("value")))
      .select(col("user_id"), col("session_start"), col("session_end"))
    def ajClicks = evd.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("t"))
    def ajPurch = evd.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("t"))
      .agg(round(max(col("value")), 4).as("r_value"))
    val custf = cust.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ordf = ords.filter(col("o_orderdate") <
      lit("1998-06-01").cast("timestamp"))
    val lif = li.filter(col("l_shipdate") >
      lit("1998-06-01").cast("timestamp"))
    def q3ordc = ordf.join(custf.hint("shuffle_hash"),
        ordf("o_custkey") === custf("c_custkey"))
      .select(col("o_orderkey"), col("o_orderdate"))
    def q3join = lif.join(q3ordc.hint("shuffle_hash"),
      lif("l_orderkey") === col("o_orderkey"))
    def q3agg = q3join
      .groupBy(col("l_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") *
        (lit(1.0) - col("l_discount"))), 4).as("revenue"))
    val dsv2Cat = graft.queries.OperatorQueries.dsv2Catalog(spark, dir)
    def dsv2Join = spark.table(s"$dsv2Cat.cust")
      .join(spark.table(s"$dsv2Cat.ord"), "custkey")
    val flagged: Seq[(String, () => DataFrame)] = Seq(
      // -- q3_top_revenue layers --
      ("q3_1_li_filtered_scan", () => lif.select(col("l_orderkey"),
        col("l_extendedprice"), col("l_discount"))),
      ("q3_2_ord_cust_join", () => q3ordc),
      ("q3_3_li_join", () => q3join.select(col("l_orderkey"),
        col("o_orderdate"), col("l_extendedprice"), col("l_discount"))),
      ("q3_4_agg", () => q3agg),
      ("q3_5_full", () => entry("q3_top_revenue")),
      // -- q5_region_revenue layers --
      ("q5_1_li_scan", () => li.select(col("l_orderkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount"))),
      ("q5_2_full", () => entry("q5_region_revenue")),
      // -- q_range_join layers --
      ("rj_1_events_scan", () => evd.select(col("user_id"),
        col("event_type"), col("t"), col("value"))),
      ("rj_2_sessionize", () => rjSessions),
      ("rj_3_full", () => entry("q_range_join")),
      // -- q_asof_join layers --
      ("aj_1_events_scans", () => ajClicks
        .select(ajClicks.columns.map(c => col(c).cast("string")): _*)
        .unionAll(ajPurch
          .select(ajPurch.columns.map(c => col(c).cast("string")): _*))),
      ("aj_2_asof", () => graft.operators.AsofJoin.asof(
        ajClicks, ajPurch, "user_id", "t")),
      ("aj_3_full", () => entry("q_asof_join")),
      // -- q_colocated_dsv2 layers --
      ("co_1_dsv2_scans", () => {
        val c0 = spark.table(s"$dsv2Cat.cust")
        val o0 = spark.table(s"$dsv2Cat.ord")
          .select(col("custkey"), col("o_totalprice"), col("o_orderkey"))
        c0.select(c0.columns.take(2).map(c => col(c).cast("string")): _*)
          .unionAll(o0.select(o0.columns.take(2).map(c =>
            col(c).cast("string")): _*))
      }),
      ("co_2_join", () => dsv2Join.select(col("custkey"))),
      ("co_3_agg", () => dsv2Join.groupBy(col("custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"),
          round(sum(col("o_totalprice")), 4).as("total"))),
      ("co_4_full", () => entry("q_colocated_dsv2")))
    // Round-15 flagged-row layers (verdict item 2): the FOUR rows that
    // stayed >2× vs the paired oracle AT SF30 (BENCH_sf30_r15 — the
    // other seven of r14's flagged eleven dropped under 2× at scale
    // and closed as sub-second-regime artifacts). Same discipline:
    // each variant adds one plan component; the full row comes from
    // SparkEntry so the chain brackets exactly what the bench times.
    val docs = graft.Tables(spark, dir, "documents")
    val liq1 = li.filter(col("l_shipdate") <=
        lit("2001-09-01").cast("timestamp"))
      .select(col("l_returnflag"), col("l_linestatus"),
        col("l_quantity"), col("l_extendedprice"), col("l_discount"),
        col("l_tax"))
    def q1agg = liq1.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum("l_quantity"), 4).as("sum_qty"),
        round(sum("l_extendedprice"), 4).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
          4).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))), 4).as("sum_charge"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_extendedprice"), 4).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
    val openOrd = ords.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))
    def antiJoined = cust
      .join(openOrd, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
    def exactFp = docs.select(md5(col("text")).as("fp"), col("doc_id"))
    def exactAgg = exactFp.groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
    val li2col = li.select(col("l_returnflag"), col("l_suppkey"))
    val flagged15: Seq[(String, () => DataFrame)] = Seq(
      // -- q1_pricing_summary layers --
      ("p1_1_filtered_scan", () => liq1),
      ("p1_2_agg8", () => q1agg),
      ("p1_3_full_sorted", () => entry("q1_pricing_summary")),
      // -- q_anti_join layers --
      ("aj15_1_orders_scan", () => openOrd),
      ("aj15_2_cust_scan", () => cust.select(col("c_custkey"),
        col("c_name"))),
      ("aj15_3_anti_join", () => antiJoined),
      ("aj15_4_full_sorted", () => entry("q_anti_join")),
      // -- q_dedup_exact layers --
      ("de_1_docs_scan", () => docs.select(col("doc_id"),
        length(col("text")).as("l"))),
      ("de_2_md5", () => exactFp),
      ("de_3_agg", () => exactAgg),
      ("de_4_full_sorted", () => entry("q_dedup_exact")),
      // -- q_skew_salted_agg layers --
      ("sa_1_scan2col", () => li2col),
      ("sa_2_distinct", () => li2col.distinct()),
      ("sa_3_full_sorted", () => entry("q_skew_salted_agg")))
    println("variant,rep,sec")
    (set match {
      case "crossover" => crossover
      case "flagged" => flagged
      case "flagged15" => flagged15
      case _ => variants
    }).foreach {
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
