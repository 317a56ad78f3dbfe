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

  /** Resolved-relation memo, keyed by (session identity, dir, table):
    * `spark.read.parquet` pays a file listing plus a footer read for
    * schema inference on EVERY call, which at ~80 queries × several
    * passes is a measured 100–200 ms of pure constant cost per query
    * (BASELINE.md §10). A DataFrame is immutable and its resolved
    * relation carries the listing, so reusing it removes that cost
    * from every steady-state invocation — the same thing a real
    * deployment's catalog (metastore-backed table with cached
    * statistics) provides. The testdata dirs are static by contract
    * (TESTDATA.md: read-only); a changed dir needs a new session or
    * [[clearCache]]. */
  private val cache = scala.collection.concurrent.TrieMap
    .empty[(SparkSession, String, String), DataFrame]

  private[graft] def clearCache(): Unit = cache.clear()

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    cache.getOrElseUpdate((spark, dir, name), load(spark, dir, name))

  private def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has varied across driver generations: TIMESTAMP(NANOS)
      // (unreadable by Spark's micros TimestampType — read nanos as long
      // and floor-convert) and, since round 7, plain TIMESTAMP(micros)
      // with isAdjustedToUTC=false (arrives as TimestampNTZType).
      // Normalize every shape to the session-zone TimestampType so all
      // downstream arithmetic (casts to long/date, window buckets) is
      // uniform; sessions pin UTC, so the NTZ wall-clock is preserved
      // verbatim and matches the DuckDB oracle's reading byte for byte.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.timestamp_micros(
              (org.apache.spark.sql.functions.col("ts") / 1000L).cast("long")))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts",
            org.apache.spark.sql.functions.col("ts").cast("timestamp"))
        case _ => raw
      }
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
