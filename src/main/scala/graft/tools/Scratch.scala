package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Throwaway decomposition harness (round 15: the q_anti_join sf30
  * plan probe — does pre-distincting the anti-join's build side, the
  * round-12 eager-aggregation-below-join trick, beat shuffling every
  * open-order row?). Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.queryExecution.toRdd.count() // warm
      val times = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label: min=${times.min}%.3f  ${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // Bulk-insert shape A/B (round 15): REBALANCE write shuffle vs
    // task-per-bucket, 2M-row batches - the IngestProbe statement
    // shape - at k=64 and k=512.
    spark.conf.set("graft.catalog.fs.assumeAtomic", "true")
    val wh = java.nio.file.Files.createTempDirectory("graft-ingestab").toString
    val e = new graft.mpp.MppEngine(spark, wh)
    def src(n: Long, seed: Long) = spark.range(seed, seed + n, 1, 32)
      .toDF("o_orderkey")
      .withColumn("o_custkey", col("o_orderkey") % 1000)
      .withColumn("o_totalprice", (col("o_orderkey") % 997) * 1.0)
    for (k <- Seq(64, 512)) {
      val tbl = s"ab_$k"
      e.createDistributedTable(tbl,
        "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
        "o_orderkey", k)
      e.insertInto(tbl, src(2000000, 0)) // warm (JIT, dirs exist)
      for (mode <- Seq("rebalance", "taskPerBucket")) {
        spark.conf.set("graft.insert.taskPerBucket",
          (mode == "taskPerBucket").toString)
        val times = (1 to 3).map { i =>
          val t0 = System.nanoTime()
          e.insertInto(tbl, src(2000000, 10000000L * i + k))
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[scratch] bulk_insert k=$k $mode: min=${times.min}%.2f  " +
          times.map(x => f"$x%.2f").mkString(","))
      }
      spark.conf.unset("graft.insert.taskPerBucket")
    }
    spark.stop()
  }
}
