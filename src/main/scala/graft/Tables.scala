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
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's TimestampType
      // (micros) rejects; read nanos as long and floor-convert to micros.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts",
          org.apache.spark.sql.functions.timestamp_micros(
            (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
