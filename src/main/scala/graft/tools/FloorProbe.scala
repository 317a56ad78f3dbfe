package graft.tools

import org.apache.spark.sql.SparkSession

/** Scheduling-floor decomposition probe (round-10, verdict "missing"
  * #2): for each named query, separates the flat costs a sub-second
  * Spark job pays from the per-plan work, by timing
  *
  *  - `noop`: an empty 32-task job (pure scheduler round-trip),
  *  - `scan`: `toRdd.count()` over the query's dominant input table
  *    (parquet scan + one partial-agg stage — the data floor),
  *  - `query`: the full plan, AQE ON (the bench configuration),
  *  - `qNoAqe`: the full plan, AQE OFF (isolates AQE's per-stage
  *    re-planning + coalesce bookkeeping from the plan itself).
  *
  * Usage: runMain graft.tools.FloorProbe <dir> <table:query> [t:q …]
  * Each rep prints one CSV row; GRAFT_PROFILE_REPS controls reps
  * (min-of is the caller's job — this tool only measures).
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val specs = args.drop(1).map { a =>
      val Array(t, q) = a.split(":", 2); (t, q)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        graft.Bench.defaultInitParts(dir))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.queries.MppQueries.warm(spark, dir)
    catch { case _: Throwable => }
    val qs = graft.SparkEntry.queries
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    println("query,rep,noop,scan,query_aqe,query_noaqe")
    specs.foreach { case (table, q) =>
      val fn = qs(q)
      // Warm everything once (codegen, footers) before any timing.
      fn(spark, dir).queryExecution.toRdd.count()
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      fn(spark, dir).queryExecution.toRdd.count()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      (1 to reps).foreach { rep =>
        val noop = time {
          spark.sparkContext.parallelize(0 until cpus.toInt, cpus.toInt)
            .count()
        }
        val scan = time {
          graft.Tables(spark, dir, table).queryExecution.toRdd.count()
        }
        val qAqe = time { fn(spark, dir).queryExecution.toRdd.count() }
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        val qNo = time { fn(spark, dir).queryExecution.toRdd.count() }
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        println(f"$q,$rep,$noop%.3f,$scan%.3f,$qAqe%.3f,$qNo%.3f")
      }
    }
    spark.stop()
  }
}
