package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loader for the driver-generated parquet testdata tables (TESTDATA.md).
  *
  * At 100 TB these would be bucketed/partitioned table roots; here each
  * logical table is a single parquet file per scale factor. All queries go
  * through this single entry so swapping in a real catalog (or the graft
  * distributed-table layer in [[graft.mpp.MppEngine]]) is one change.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // The driver's events.ts is parquet TIMESTAMP(NANOS), which Spark's
      // TimestampType (micros) rejects: read nanos as long and
      // floor-convert. Synthesized events (graft.tools.ScaleData) are
      // written as TIMESTAMP(micros) already — branch on the read type.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      if (raw.schema("ts").dataType ==
          org.apache.spark.sql.types.LongType)
        raw.withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
      else raw
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
