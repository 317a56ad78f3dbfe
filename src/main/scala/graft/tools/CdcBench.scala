package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** CDC-upsert ingestion throughput probe: loads a synthetic
  * distributed table, then applies N micro-batches of change rows
  * through [[graft.streaming.EventStreams.upsertBatch]] — the exact
  * unit `upsertPipeline`'s foreachBatch runs — timing each apply.
  * Batches mix updates of existing keys with inserts of new keys
  * (deterministic key schedule, no RNG) and carry intra-batch
  * duplicates so the last-writer-wins reduce is on the measured path.
  *
  * Usage: runMain graft.tools.CdcBench <initRows> <nBatches>
  *        <batchRows> [buckets] [payloadBytes]
  * `payloadBytes` > 0 adds a padding string column of that size to the
  * table and every batch — the wide-row mode that validates the MERGE
  * broadcast decision on BYTES (`graft.merge.broadcastMaxBytes`): a
  * batch far below the 4M-row bound can still be a multi-GB broadcast,
  * and the crossover the §20.6 curve identified is a byte count, not a
  * row count.
  * Prints one JSON line: per-batch seconds + steady rows/sec.
  */
object CdcBench {
  def main(args: Array[String]): Unit = {
    val initRows = args(0).toLong
    val nBatches = args(1).toInt
    val batchRows = args(2).toLong
    val buckets = if (args.length > 3) args(3).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    var builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
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
    val wh = java.nio.file.Files.createTempDirectory("graft-cdcbench")
    val e = new graft.mpp.MppEngine(spark, wh.toString)
    val payloadBytes = if (args.length > 4) args(4).toInt else 0
    e.createDistributedTable("cdc_t",
      "k BIGINT, v DOUBLE, tag STRING" +
        (if (payloadBytes > 0) ", pad STRING" else ""),
      "k", buckets)
    def withPad(df: org.apache.spark.sql.DataFrame)
        : org.apache.spark.sql.DataFrame =
      if (payloadBytes <= 0) df
      // Deterministic, poorly-compressible padding: repeat the key's
      // hex digest to the requested width (a constant string would
      // dictionary-encode to nothing and understate broadcast bytes).
      else df.withColumn("pad", substring(repeat(
        md5(col("k").cast("string")), payloadBytes / 32 + 1),
        1, payloadBytes))
    e.insertInto("cdc_t", withPad(spark.range(0, initRows).toDF("k")
      .withColumn("v", col("k") * 1.0)
      .withColumn("tag", lit("base"))))
    // Change schedule for batch b: batchRows updates starting at key
    // (b * batchRows) % initRows, plus 10% inserts above the key
    // space, plus a duplicate slice at a stale seq (the reduce's work).
    def batch(b: Int) = {
      val start = (b.toLong * batchRows) % initRows
      val upd = withPad(spark.range(start, start + batchRows).toDF("k")
        .withColumn("v", col("k") * 2.0 + b)
        .withColumn("seq", lit(2L)))
      val ins = withPad(spark.range(0, batchRows / 10).toDF("i")
        .select((col("i") + initRows + b.toLong * batchRows).as("k"))
        .withColumn("v", lit(-1.0)).withColumn("seq", lit(2L)))
      val stale = withPad(spark.range(start, start + batchRows / 10)
        .toDF("k")
        .withColumn("v", lit(-999.0)).withColumn("seq", lit(1L)))
      upd.unionByName(ins).unionByName(stale)
    }
    val times = (0 until nBatches).map { b =>
      val df = batch(b)
      val t0 = System.nanoTime()
      val n = graft.streaming.EventStreams.upsertBatch(
        e, "cdc_t", "k", "seq", df)
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"batch $b: $dt%.2f s, $n rows merged")
      (dt, n)
    }
    // Steady = drop the first (JIT/planning warm-up) batch.
    val steady = times.drop(1)
    val rowsPerSec =
      steady.map(_._2).sum / math.max(steady.map(_._1).sum, 1e-9)
    println(s"""{"metric":"cdc_upsert","init_rows":$initRows,""" +
      s""""batch_rows":$batchRows,"batches":$nBatches,""" +
      s""""batch_secs":[${times.map(t => f"${t._1}%.2f").mkString(",")}],""" +
      f""""steady_rows_per_sec":$rowsPerSec%.0f}""")
    spark.stop()
  }
}
