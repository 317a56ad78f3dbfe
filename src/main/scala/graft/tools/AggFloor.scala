package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component decomposition for the two residual perf-weak aggregate
  * rows (round-10 verdict "what's wrong" #1/#2): times each layer of
  * q_distinct_agg and q_stats_approx separately so the gap to the
  * DuckDB oracle can be attributed to a specific cost (scan, grouping,
  * per-row aggregate update, sketch build) rather than hand-waved.
  * Each variant runs `reps` times after one warm pass; caller takes
  * the min. Usage: runMain graft.tools.AggFloor <dir>
  */
object AggFloor {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
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
    println("variant,rep,sec")
    variants.foreach { case (name, f) =>
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
