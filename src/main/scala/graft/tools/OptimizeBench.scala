package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the round-9 compaction-then-prune story end-to-end
  * (BASELINE.md §15): a date-ranged aggregate over an append-grown
  * `mpp.` table BEFORE vs AFTER `OPTIMIZE … SORT BY(date)` with a
  * records-per-file budget, reporting the files the planner scheduled
  * (engine-path zone maps, [[graft.sources.ZoneMapFileIndex]]) and the
  * wall time (min of 3).
  *
  * Usage: runMain graft.tools.OptimizeBench [sfDir] — builds a
  * throwaway warehouse, loads `lineitem` in 6 arrival-order fragments
  * (each spanning the full shipdate domain — the real append pattern
  * zone maps cannot prune), times the window query, OPTIMIZEs, times
  * it again. */
object OptimizeBench {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft-sf3"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = new graft.mpp.MppEngine(spark,
      Files.createTempDirectory("graft-optbench").toString)
    val li = graft.Tables(spark, dir, "lineitem")
    li.createOrReplaceTempView("ob_lineitem")
    e.sql("CREATE TABLE li PARTITION BY (l_orderkey) WITH BUCKETS 8 " +
      "AS SELECT * FROM ob_lineitem WHERE 1 = 0")
    (0 until 6).foreach { i =>
      e.insertInto("li", li.filter(col("l_orderkey") % 6 === i))
    }
    def q() = e.table("li")
      .filter(col("l_shipdate") >= lit("1997-01-01") &&
        col("l_shipdate") < lit("1997-02-01"))
      .agg(count(lit(1)), sum("l_quantity"))
    def time3(): (Double, Int, Int) = {
      q().collect() // warm (listing, codegen)
      val times = (1 to 3).map { _ =>
        graft.sources.ZoneMapFileIndex.lastCounts = None
        val t0 = System.nanoTime()
        q().collect()
        (System.nanoTime() - t0) / 1e9
      }
      val (k, t) = graft.sources.ZoneMapFileIndex.lastCounts
        .getOrElse((-1, -1))
      (times.min, k, t)
    }
    val (tBefore, kB, tB) = time3()
    println(f"== BEFORE optimize: $tBefore%.3f s, files $kB/$tB")
    spark.conf.set("graft.optimize.maxRecordsPerFile", "1000000")
    val t0 = System.nanoTime()
    e.sql("OPTIMIZE li SORT BY (l_shipdate)")
    println(f"== OPTIMIZE took ${(System.nanoTime() - t0) / 1e9}%.3f s")
    val (tAfter, kA, tA) = time3()
    println(f"== AFTER optimize:  $tAfter%.3f s, files $kA/$tA")
    spark.stop()
  }
}
