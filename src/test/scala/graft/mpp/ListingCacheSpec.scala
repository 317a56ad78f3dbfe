package graft.mpp

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.sources.ColocatedFileIndex

/** Pins the manifest-pointer-keyed listing cache (round 14): cache
  * hits are zero-listing identity hits, commits rotate the key and the
  * rebuild picks up exactly the committed state, peer commits from a
  * SECOND engine invalidate through the published manifest diff, and
  * time-travel-off tables fall back to the mtime fingerprint. The RPC
  * economics (29 vs 81,951 RPCs per pruned point read) are recorded in
  * BASELINE §24 via tools/RpcProbe; this spec pins the CORRECTNESS
  * contract the economics ride on. */
class ListingCacheSpec extends SparkTestBase {

  private def freshEngine(): MppEngine =
    new MppEngine(spark, Files.createTempDirectory("graft-lc-test").toString)

  test("same manifest pointer = identity cache hit; a commit rotates " +
      "the key and the rebuild serves exactly the committed state") {
    val e = freshEngine()
    e.sql("CREATE TABLE lc(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("lc", spark.range(0, 100).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val root = s"${e.warehouse}/data/lc"
    val t = e.catalog.state.liveTable("lc").get
    val key = e.catalog.state.tableManifests.get(t.tableOid.toString)
    assert(key.isDefined)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "k BIGINT, v DOUBLE, bucket INT")
    val i1 = ColocatedFileIndex.get(spark, root, schema, key, 4,
      e.manifestDirDiff)
    val i2 = ColocatedFileIndex.get(spark, root, schema, key, 4,
      e.manifestDirDiff)
    assert(i1 eq i2, "same pointer must be an identity cache hit")
    // The index exposes the bucket partition column (pruning rides it).
    assert(i1.partitionSchema.fieldNames.map(_.toLowerCase)
      .contains("bucket"))
    // Commit → pointer rotates → rebuild sees the new rows.
    e.insertInto("lc", spark.range(500, 520).toDF("k")
      .withColumn("v", lit(1.0)))
    val key2 = e.catalog.state.tableManifests.get(t.tableOid.toString)
    assert(key2 != key, "a commit must advance the pointer")
    val i3 = ColocatedFileIndex.get(spark, root, schema, key2, 4,
      e.manifestDirDiff)
    assert(!(i3 eq i1))
    assert(i3.allFiles().size > i1.allFiles().size)
    assert(e.table("lc").count() == 120)
    // Uncommitted strays are invisible until a commit (snapshot-pointer
    // isolation): plant a file, same pointer → same listing.
    val bucketDir = java.nio.file.Paths.get(root, "bucket=0")
    java.nio.file.Files.createDirectories(bucketDir)
    java.nio.file.Files.write(bucketDir.resolve("part-stray.parquet"),
      Array.fill[Byte](16)(1))
    val i4 = ColocatedFileIndex.get(spark, root, schema, key2, 4,
      e.manifestDirDiff)
    assert(i4 eq i3, "an uncommitted stray must not invalidate")
    java.nio.file.Files.delete(bucketDir.resolve("part-stray.parquet"))
  }

  test("a PEER engine's commit is visible at this engine's next read " +
      "(invalidation derives from the PUBLISHED manifest diff, not " +
      "from local knowledge)") {
    val e1 = freshEngine()
    e1.sql("CREATE TABLE lp(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e1.insertInto("lp", spark.range(0, 100).toDF("k")
      .withColumn("v", col("k") * 1.0))
    assert(e1.table("lp").count() == 100) // warms e1's cached listing
    val e2 = new MppEngine(spark, e1.warehouse)
    e2.insertInto("lp", spark.range(1000, 1050).toDF("k")
      .withColumn("v", lit(2.0)))
    // e1 committed nothing; refresh-on-read aligns its catalog and the
    // rotated pointer re-lists exactly the dirs the peer touched.
    assert(e1.table("lp").count() == 150)
    // And a COW rewrite by the peer (files REPLACED, not added) also
    // lands: stale entries would serve swapped-away files and fail
    // the read loudly — neither may happen.
    e2.sql("UPDATE lp SET v = -1 WHERE k = 3")
    assert(e1.table("lp").filter(col("v") === -1).count() == 1)
    assert(e1.table("lp").count() == 150)
  }

  test("time travel OFF falls back to the mtime fingerprint — writes " +
      "stay visible without any manifest pointer") {
    spark.conf.set("graft.timetravel.enabled", "false")
    try {
      val e = freshEngine()
      e.sql("CREATE TABLE lo(k BIGINT, v DOUBLE) PARTITION BY (k) " +
        "WITH BUCKETS 2")
      e.insertInto("lo", spark.range(0, 10).toDF("k")
        .withColumn("v", col("k") * 1.0))
      assert(e.table("lo").count() == 10)
      e.insertInto("lo", spark.range(10, 25).toDF("k")
        .withColumn("v", lit(1.0)))
      assert(e.table("lo").count() == 25)
      assert(e.catalog.state.tableManifests.isEmpty)
    } finally spark.conf.unset("graft.timetravel.enabled")
  }
}
