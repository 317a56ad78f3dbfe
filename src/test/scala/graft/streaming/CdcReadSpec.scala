package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.mpp.MppEngine

/** Pins the streaming READ side of CDC: `readStream` over a
  * distributed table's change feed with catalog-version offsets.
  * Every run uses `Trigger.AvailableNow` — catch up to the current
  * version, then stop — so the tests drive REAL micro-batch planning
  * (offset resolution, checkpoint resume, V1 getBatch re-basing)
  * with deterministic content. */
class CdcReadSpec extends SparkTestBase {

  private def freshEngine(): MppEngine =
    new MppEngine(spark,
      Files.createTempDirectory("graft-cdcread").toString)

  /** Run the feed to AvailableNow through foreachBatch (the memory
    * sink cannot RESUME a checkpoint; foreachBatch can) and return the
    * rows this run emitted. */
  private def runOnce(wh: String, table: String, checkpoint: String,
      starting: Option[String]): Seq[(String, Long, Double)] = {
    val buf = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Double)]
    val q = CdcRead.changeStream(spark, wh, table, starting)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val rows = b.collect().map(r => (r.getAs[String]("_change_type"),
          r.getAs[Long]("k"), r.getAs[Double]("v")))
        buf.synchronized { buf ++= rows }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(120000), "stream did not drain in 120 s")
    buf.synchronized(buf.toSeq)
  }

  test("version offsets: first run bootstraps from earliest, a resumed " +
      "run sees exactly the interval's net changes") {
    val e = freshEngine()
    e.sql("CREATE TABLE cs(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("cs", spark.range(0, 50).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val ckpt = Files.createTempDirectory("graft-cdcread-ckpt").toString

    val first = runOnce(e.warehouse, "cs", ckpt, Some("earliest"))
    assert(first.length == 50 && first.forall(_._1 == "insert"),
      s"bootstrap: ${first.length}")

    // Quiet interval: resuming with nothing new emits nothing.
    assert(runOnce(e.warehouse, "cs", ckpt, Some("earliest")).isEmpty)

    // Mutations: update (retract/add pair), delete, insert.
    e.sql("UPDATE cs SET v = -1 WHERE k % 10 = 3")   // 5 updates
    e.sql("DELETE FROM cs WHERE k >= 45")            // 5 deletes
    e.insertInto("cs", spark.range(100, 103).toDF("k")
      .withColumn("v", lit(0.0)))                    // 3 inserts
    val changes = runOnce(e.warehouse, "cs", ckpt, Some("earliest"))
      .sorted
    val updatedK = (0L until 50L).filter(k => k % 10 == 3 && k < 45)
    val deletedK = (45L until 50L)
    val want = (
      updatedK.map(k => ("delete", k, k.toDouble)) ++
      updatedK.map(k => ("insert", k, -1.0)) ++
      deletedK.map(k => ("delete", k,
        if (k % 10 == 3) -1.0 else k.toDouble)) ++
      (100L until 103L).map(k => ("insert", k, 0.0))).sorted
    assert(changes == want, s"got $changes")
  }

  test("earliest bootstraps the FULL state even when the table's " +
      "creation has aged out of the retention window") {
    // r11 advisor (medium): `earliest` used to diff from the oldest
    // RETAINED version; once history ages past the snapshot window
    // that version's manifest already holds data, and rows unchanged
    // since then were silently never emitted — a partial replica.
    val e = freshEngine()
    e.sql("CREATE TABLE tr(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 4")
    e.insertInto("tr", spark.range(0, 50).toDF("k")
      .withColumn("v", col("k") * 1.0))
    // Push the creation + initial insert out of the retention window
    // (20 snapshots) with single-key updates: each rewrites ONE
    // bucket, so a from-oldest-retained diff would only ever see that
    // bucket's rows — the silent-partial trap this test pins.
    (1 to 25).foreach(i =>
      e.sql(s"UPDATE tr SET v = ${i * 1000} WHERE k = 1"))
    assert(!e.catalog.retainedVersions.contains(2L),
      "precondition: history must be truncated past the initial insert")
    val ckpt = Files.createTempDirectory("graft-cdcread-ckpt").toString
    val first = runOnce(e.warehouse, "tr", ckpt, Some("earliest"))
    assert(first.length == 50 && first.forall(_._1 == "insert"),
      s"full-state bootstrap expected 50 inserts, got ${first.length}")
    assert(first.find(_._2 == 1L).exists(_._3 == 25000.0))
    // And the stream continues incrementally from the bootstrap cutoff.
    e.sql("DELETE FROM tr WHERE k = 2")
    val next = runOnce(e.warehouse, "tr", ckpt, Some("earliest"))
    assert(next.map(r => (r._1, r._2)) == Seq(("delete", 2L)),
      s"got $next")
  }

  test("startingVersion=latest consumes only post-start changes") {
    val e = freshEngine()
    e.sql("CREATE TABLE cl(k BIGINT, v DOUBLE) PARTITION BY (k) " +
      "WITH BUCKETS 2")
    e.insertInto("cl", spark.range(0, 20).toDF("k")
      .withColumn("v", col("k") * 1.0))
    val ckpt = Files.createTempDirectory("graft-cdcread-ckpt").toString
    // latest: history not replayed
    assert(runOnce(e.warehouse, "cl", ckpt, None).isEmpty)
    e.sql("UPDATE cl SET v = -2 WHERE k = 7")
    val got = runOnce(e.warehouse, "cl", ckpt, None)
      .map(r => (r._1, r._2)).sorted
    assert(got == Seq(("delete", 7L), ("insert", 7L)), got.toString)
  }

  test("replicaPipeline: change feed + MERGE apply converges the " +
      "replica to the source, including deletes, and replays converge") {
    val src = freshEngine()
    val dst = freshEngine()
    src.sql("CREATE TABLE rt(k BIGINT, v DOUBLE, tag STRING) " +
      "PARTITION BY (k) WITH BUCKETS 4")
    dst.sql("CREATE TABLE rt_rep(k BIGINT, v DOUBLE, tag STRING) " +
      "PARTITION BY (k) WITH BUCKETS 2") // different bucketing is fine
    src.insertInto("rt", spark.range(0, 40).toDF("k")
      .withColumn("v", col("k") * 1.0).withColumn("tag", lit("a")))
    src.sql("UPDATE rt SET tag = 'b' WHERE k % 4 = 1")
    val ckpt = Files.createTempDirectory("graft-cdcread-ckpt").toString

    def sync(): Unit = {
      val q = CdcRead.replicaPipeline(spark, src.warehouse, "rt",
        dst, "rt_rep", "k", ckpt, Trigger.AvailableNow())
      assert(q.awaitTermination(120000), "sync did not drain in 120 s")
      ()
    }
    def state(e: MppEngine, t: String) =
      e.table(t).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getString(2)))
        .sorted.toSeq

    sync()
    assert(state(dst, "rt_rep") == state(src, "rt"))

    src.sql("DELETE FROM rt WHERE k >= 30")
    src.sql("UPDATE rt SET v = v + 100 WHERE k < 5")
    src.insertInto("rt", spark.range(500, 505).toDF("k")
      .withColumn("v", lit(-1.0)).withColumn("tag", lit("n")))
    sync()
    assert(state(dst, "rt_rep") == state(src, "rt"))

    // Replay the same checkpoint with nothing new: no drift.
    sync()
    assert(state(dst, "rt_rep") == state(src, "rt"))

    // Fresh checkpoint from earliest re-applies everything: the
    // retract/add MERGE apply is convergent, not just incremental.
    val ckpt2 = Files.createTempDirectory("graft-cdcread-ckpt").toString
    val q2 = CdcRead.replicaPipeline(spark, src.warehouse, "rt",
      dst, "rt_rep", "k", ckpt2, Trigger.AvailableNow())
    assert(q2.awaitTermination(120000), "re-apply did not drain")
    assert(state(dst, "rt_rep") == state(src, "rt"))
  }
}
