package graft.mpp

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/** Pins `ALTER TABLE … REBUCKET n` — the online bucket-count change
  * (capability superset: the reference fixes shard count at creation,
  * create_distributed_table.cpp:134-140). The contract: one COW
  * rewrite into the new layout, exact rows before and after, pruning
  * and routing consistent with the NEW count immediately, shard
  * bookkeeping re-derived, time travel across the boundary intact,
  * and RESTORE bringing the old count back with the old files. */
class RebucketSpec extends SparkTestBase {

  private def freshEngine(): MppEngine =
    new MppEngine(spark, Files.createTempDirectory("graft-rb-test").toString)

  private def rows(e: MppEngine, t: String): Map[Long, Double] =
    e.table(t).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def liveBucketDirs(e: MppEngine, t: String): Set[Int] = {
    val root = java.nio.file.Paths.get(e.warehouse, "data", t)
    val s = java.nio.file.Files.list(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("bucket="))
        .map(_.getFileName.toString.stripPrefix("bucket=").toInt)
        .toSet
    } finally s.close()
  }

  test("REBUCKET grows and shrinks: exact rows, new-k pruning, " +
      "shard bookkeeping, inserts route under the new layout") {
    val e = freshEngine()
    e.sql("CREATE TABLE rb(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("rb", spark.range(0, 1000).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val expect = (0L until 1000L).map(k => k -> k.toDouble).toMap

    e.sql("ALTER TABLE rb REBUCKET 8")
    val t8 = e.catalog.state.liveTable("rb").get
    assert(t8.buckets == 8)
    assert(e.catalog.state.shards.count(_.tableOid == t8.tableOid) == 8)
    assert(rows(e, "rb") == expect)
    // Pruning hashes against the NEW modulus.
    assert(e.explainShards(e.table("rb").filter("k = 7")) == "Shards: 1/8")
    // A post-rebucket insert routes by the new layout and prunes back.
    e.insertInto("rb", spark.range(5000, 5001).toDF("k")
      .withColumn("v", lit(5.0)))
    assert(e.table("rb").filter("k = 5000").count() == 1)
    assert(e.table("rb").count() == 1001)

    e.sql("ALTER TABLE rb REBUCKET 3")
    val t3 = e.catalog.state.liveTable("rb").get
    assert(t3.buckets == 3)
    assert(e.catalog.state.shards.count(_.tableOid == t3.tableOid) == 3)
    assert(e.table("rb").count() == 1001)
    assert(rows(e, "rb") - 5000L == expect)
    assert(e.explainShards(e.table("rb").filter("k = 7")) == "Shards: 1/3")
    // Shrink leaves no live dir beyond the new k (old dirs archived).
    assert(liveBucketDirs(e, "rb").forall(_ < 3))
    // A SECOND engine on the same warehouse sees the new layout.
    val e2 = new MppEngine(spark, e.warehouse)
    assert(e2.table("rb").count() == 1001)
    assert(e2.catalog.state.liveTable("rb").get.buckets == 3)
  }

  test("time travel across REBUCKET: pre-rebucket versions read " +
      "exactly; RESTORE brings the old bucket count back") {
    val e = freshEngine()
    e.sql("CREATE TABLE rt(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("rt", spark.range(0, 200).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val vBefore = e.catalog.currentVersionOnDisk
    e.sql("ALTER TABLE rt REBUCKET 8")
    e.sql("UPDATE rt SET v = -1 WHERE k < 10")
    assert(e.tableAsOf("rt", vBefore).count() == 200)
    assert(e.tableAsOf("rt", vBefore)
      .filter(col("v") === -1).count() == 0)
    // RESTORE to the 4-bucket version: files AND k come back.
    e.sql(s"RESTORE TABLE rt TO VERSION AS OF $vBefore")
    val t = e.catalog.state.liveTable("rt").get
    assert(t.buckets == 4, s"bucket count not restored: ${t.buckets}")
    assert(e.catalog.state.shards.count(_.tableOid == t.tableOid) == 4)
    assert(e.table("rt").filter(col("v") === -1).count() == 0)
    assert(e.table("rt").count() == 200)
    assert(e.explainShards(e.table("rt").filter("k = 7")) == "Shards: 1/4")
  }

  test("RESTORE across a SHRINK (grow-back): the restored manifest " +
      "references every file in dirs beyond the current k — nothing " +
      "is stranded for a stray-sweeping VACUUM to delete") {
    val e = freshEngine()
    e.sql("CREATE TABLE rg(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 8")
    e.insertInto("rg", spark.range(0, 500).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val v8 = e.catalog.currentVersionOnDisk
    e.sql("ALTER TABLE rg REBUCKET 4")
    // Restore to the WIDER layout: files come back into bucket dirs
    // 4..7, beyond the pre-restore k=4 — the restored manifest must
    // reference them (a listing bounded by the current k would
    // silently drop them; review-found data-loss path).
    e.sql(s"RESTORE TABLE rg TO VERSION AS OF $v8")
    val t = e.catalog.state.liveTable("rg").get
    assert(t.buckets == 8)
    val mName = e.catalog.state.tableManifests(t.tableOid.toString)
    val manifest = e.loadManifest(mName).get
    assert((0 until 8).forall(k =>
      manifest.exists(_.startsWith(s"bucket=$k/"))),
      s"manifest misses wide-layout dirs: $manifest")
    assert(e.table("rg").count() == 500)
    assert(e.tableAsOf("rg",
      e.catalog.currentVersionOnDisk).count() == 500)
    assert(e.explainShards(e.table("rg").filter("k = 7")) == "Shards: 1/8")
    // End-to-end data-safety: an aggressive stray-sweeping vacuum
    // finds nothing unreferenced among the restored files.
    spark.conf.set("graft.vacuum.sweepStrays", "true")
    try {
      e.vacuumTimeTravel(graceMs = 0L)
      assert(e.table("rg").count() == 500)
    } finally spark.conf.unset("graft.vacuum.sweepStrays")
  }

  test("REBUCKET with time travel OFF still commits the metadata") {
    spark.conf.set("graft.timetravel.enabled", "false")
    try {
      val e = freshEngine()
      e.sql("CREATE TABLE rn(k BIGINT, v DOUBLE) PARTITION BY (k) " +
        "WITH BUCKETS 2")
      e.insertInto("rn", spark.range(0, 100).toDF("k")
        .withColumn("v", col("k") * 1.0))
      e.sql("ALTER TABLE rn REBUCKET 6")
      assert(e.catalog.state.liveTable("rn").get.buckets == 6)
      assert(e.table("rn").count() == 100)
      assert(e.explainShards(e.table("rn").filter("k = 7")) ==
        "Shards: 1/6")
    } finally spark.conf.unset("graft.timetravel.enabled")
  }

  test("both orderings of the writer-vs-REBUCKET race fail LOUDLY: " +
      "the layout guard trips a stale-modulus commit, and a rebucket " +
      "with a contended manifest base aborts") {
    val e = freshEngine()
    e.sql("CREATE TABLE rc(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("rc", spark.range(0, 100).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val tOld = e.catalog.state.liveTable("rc").get
    // Ordering A — writer commits AFTER a peer's REBUCKET: its rows
    // were routed under the old modulus; the commit must refuse.
    val peer = new MppEngine(spark, e.warehouse)
    peer.sql("ALTER TABLE rc REBUCKET 8")
    val exA = intercept[IllegalStateException] {
      e.commitManifest(tOld,
        addedFiles = Some(Vector.empty), deltaBase = Some(None))
    }
    assert(exA.getMessage.contains("bucket count changed mid-statement"),
      exA.getMessage)
    // Ordering B — a peer commits DURING the relay (the rebucket's
    // captured base is stale at its own commit): the rebucket aborts
    // instead of quietly committing a listing that lost the peer's
    // rows.
    val t8 = e.catalog.state.liveTable("rc").get
    val staleBase = e.catalog.state.tableManifests.get(t8.tableOid.toString)
    peer.insertInto("rc", spark.range(1000, 1010).toDF("k")
      .withColumn("v", lit(1.0)))
    val exB = intercept[IllegalStateException] {
      e.commitManifest(t8,
        replacedBuckets = Some(((0 until 8).toSet, Vector.empty)),
        deltaBase = Some(staleBase), failOnContention = true)
    }
    assert(exB.getMessage.contains("concurrent statement committed"),
      exB.getMessage)
    // Neither failed commit moved the table: the peer's rows survive.
    assert(new MppEngine(spark, e.warehouse).table("rc").count() == 110)
  }

  test("a PEER engine with a warm (stale) catalog converges on the " +
      "relaid layout at its next read — refresh-on-read") {
    val e1 = freshEngine()
    e1.sql("CREATE TABLE rp(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 2")
    e1.insertInto("rp", spark.range(0, 100).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val e2 = new MppEngine(spark, e1.warehouse)
    assert(e2.table("rp").count() == 100) // warms e2's cached state k=2
    e1.sql("ALTER TABLE rp REBUCKET 6")
    // e2 commits NOTHING — its next read alone must observe the new
    // metadata (bucket count became mutable; a stale k means pruning
    // under the wrong modulus).
    assert(e2.table("rp").count() == 100)
    assert(e2.catalog.state.liveTable("rp").get.buckets == 6,
      "peer reads must re-align with the published catalog")
    assert(e2.explainShards(e2.table("rp").filter("k = 7")) ==
      "Shards: 1/6")
  }

  test("REBUCKET to the same count is a no-op; other ALTER forms " +
      "still reject") {
    val e = freshEngine()
    e.sql("CREATE TABLE rs(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 2")
    e.insertInto("rs", spark.range(0, 10).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val vBefore = e.catalog.currentVersionOnDisk
    e.sql("ALTER TABLE rs REBUCKET 2")
    assert(e.catalog.currentVersionOnDisk == vBefore,
      "same-count REBUCKET must not commit a version")
    intercept[UnsupportedOperationException] {
      e.sql("ALTER TABLE rs RENAME TO rs2")
    }
    intercept[IllegalArgumentException] {
      e.rebucket("rs", 0)
    }
  }
}
