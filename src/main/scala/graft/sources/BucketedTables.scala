package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Co-located table storage: Spark-native bucketed tables as the
  * shuffle-free-join layer.
  *
  * The reference hash-places shards but never exploits co-location — its
  * README lists "co-located tables" as an unimplemented TODO
  * (`/root/reference/README.md:104-120`); every distributed join routes
  * through the coordinator. Under Spark, bucketed catalog tables deliver
  * the real thing: two tables bucketed on the same key with the same
  * bucket count join WITHOUT any exchange — each task zips bucket i of
  * both sides. At 100 TB this is the difference between a full network
  * shuffle of the fact table per join and none at all; the write-side
  * cost (one `repartition`-like clustering at load time) is paid once
  * and amortized over every subsequent join/aggregate on that key.
  *
  * This complements the `graft.mpp` bucket-directory layout (whose COW
  * DML needs per-bucket file ownership): use MppEngine tables for
  * DML-heavy surfaces, bucketed catalog tables for join-heavy marts.
  */
object BucketedTables {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table.
    * Idempotent across JVMs: the in-memory catalog forgets managed
    * tables on restart while their warehouse directories persist, so
    * any orphaned location is cleared before the write. */
  def create(spark: SparkSession, name: String, df: DataFrame, key: String,
      buckets: Int): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$name`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    loc.getFileSystem(spark.sessionState.newHadoopConf()).delete(loc, true)
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }

  /** Equi-join two co-bucketed tables on their bucket key. With equal
    * bucket counts the physical plan contains NO Exchange on either
    * side (asserted by PlanQualitySpec). */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
      key: String): DataFrame =
    spark.table(left).hint("merge").join(spark.table(right), Seq(key))
}
