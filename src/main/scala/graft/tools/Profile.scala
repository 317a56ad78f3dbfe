package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch per-query profiler: times named queries (steady-state, N
  * reps) against a data dir and optionally prints the formatted plan.
  * Usage: runMain graft.tools.Profile <dir> <explain|time> <q1> [q2…]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mode = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.get("SPARK_GRAFT_INIT_PARTS").map(_.toInt)
          .getOrElse(graft.Bench.defaultInitParts(dir)))
      .config("spark.sql.join.preferSortMergeJoin",
        sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "false"))
      .config("spark.ui.enabled", "false")
    // Arbitrary probe confs, e.g. GRAFT_SPARK_CONFS=
    // "graft.lsh.bandPasses=4;spark.sql.adaptive.enabled=false".
    sys.env.get("GRAFT_SPARK_CONFS").foreach(_.split(';').filter(_.nonEmpty)
      .foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => builder = builder.config(k, v)
          case _ => sys.error(
            s"GRAFT_SPARK_CONFS: malformed entry '$kv' (expected key=value)")
        }
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // The mpp warm-up builds distributed tables for the q_mpp_* rows —
    // skip it when profiling pure-parquet queries (GRAFT_PROFILE_NOWARM).
    if (!sys.env.contains("GRAFT_PROFILE_NOWARM")) {
      try graft.queries.MppQueries.warm(spark, dir)
      catch { case _: Throwable => }
    }
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      val fn = qs(n)
      if (mode == "explain") {
        println(s"===== $n =====")
        fn(spark, dir).explain("formatted")
      } else {
        val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          // Full-plan execution, not Dataset.count() — see Bench.pass.
          fn(spark, dir).queryExecution.toRdd.count()
          println(f"$n rep$i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      }
    }
    spark.stop()
  }
}
