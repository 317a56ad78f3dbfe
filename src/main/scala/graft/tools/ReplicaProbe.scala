package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Deep-scale probe for CDC table replication (round-11 verdict item
  * 7): `replicaPipeline` is driver-verified at sf0.1 per round; this
  * runs it once at the 150M-row decade with a MIXED
  * update/delete/insert history and records what a daily 100 TB
  * training-data mirror actually pays:
  *
  *  - bootstrap: the `earliest` first batch is the full source state
  *    as inserts (a snapshot SCAN, never a diff exchange) MERGEd into
  *    the empty replica — rows/s is the mirror's seeding cost;
  *  - incremental catch-up: after more mixed history, a resumed run
  *    (same checkpoint) consumes ONLY the interval's net feed — its
  *    wall-time must track the rewrite volume, not the table;
  *  - checkpoint-resume mid-history: offsets are catalog versions in
  *    the checkpoint, so a third run after further commits again
  *    consumes only the new interval;
  *  - convergence: source and replica agree on count/sum fingerprints
  *    after every sync.
  *
  * Usage: ReplicaProbe <srcWarehouse> <dstWarehouse> <parquetPath>
  *          <keyCol> <valCol> <buckets>
  */
object ReplicaProbe {

  private def sec(t0: Long): Double = (System.nanoTime() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    val Array(srcWh, dstWh, parquetPath, keyCol, valCol, bucketsS) =
      args.take(6)
    val buckets = bucketsS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel(sys.env.getOrElse("GRAFT_LOG","WARN"))
    // Full-rewrite intervals (the broad bulk-rescoring day) demand ~2×
    // table size of shuffle scratch in one exceptAll unless split into
    // sequential bucket passes — the §21.6 knob; 8 passes bounds peak
    // spill to ~table/4 (the first probe run thrashed at the disk edge
    // exactly here).
    spark.conf.set("graft.changes.bucketPasses",
      sys.env.getOrElse("GRAFT_CHANGES_PASSES", "8"))
    val src = new graft.mpp.MppEngine(spark, srcWh)
    val dst = new graft.mpp.MppEngine(spark, dstWh)
    def report(k: String, v: String): Unit = println(s"[replica-probe] $k: $v")

    val table = "orders_r"
    if (src.catalog.state.liveTable(table).isEmpty) {
      val df = spark.read.parquet(parquetPath)
      src.createDistributedTable(table, df.schema.toDDL, keyCol, buckets)
      val t0 = System.nanoTime()
      src.insertInto(table, df)
      report("source_build", f"${sec(t0)}%.1f s, $buckets buckets")
    }
    val schemaDdl = src.catalog.state.liveTable(table).get.schemaDdl
    if (dst.catalog.state.liveTable(table).isEmpty)
      dst.createDistributedTable(table, schemaDdl, keyCol, buckets)

    // Mixed daily-mirror history: narrow updates, a delete, an insert
    // batch. Values offset so nothing is value-identical (the
    // match-prune skips those commits). insertInto needs the full
    // schema; the batch is built generically from the table DDL.
    def insertBatch(round: Int): Unit = {
      val base = 10000000000L + round * 1000L
      val cols = org.apache.spark.sql.types.StructType
        .fromDDL(schemaDdl).fields
      var df = spark.range(base, base + 500).toDF("__id")
      cols.foreach { f =>
        df = df.withColumn(f.name,
          if (f.name.equalsIgnoreCase(keyCol)) col("__id")
          else f.dataType match {
            // INT does not cast to temporal types; go through a string.
            case _: org.apache.spark.sql.types.TimestampNTZType |
                _: org.apache.spark.sql.types.TimestampType |
                _: org.apache.spark.sql.types.DateType =>
              lit(s"2026-01-0${(round % 8) + 1}").cast(f.dataType)
            case _ => lit(round).cast(f.dataType)
          })
      }
      src.insertInto(table, df.select(cols.map(f => col(f.name)): _*))
    }

    def fingerprint(e: graft.mpp.MppEngine): (Long, Double, Long) = {
      val r = e.table(table).agg(count(lit(1)),
        sum(col(valCol)).cast("double"), sum(col(keyCol))).head()
      (r.getLong(0), r.getDouble(1), r.getLong(2))
    }

    // Deterministic checkpoint (arg 7 overrides) so a killed probe run
    // RESUMES instead of re-bootstrapping 150M rows into a full replica.
    val ckpt = if (args.length > 6) args(6)
      else s"$dstWh/_replica_ckpt"

    def sync(label: String): Unit = {
      val t0 = System.nanoTime()
      val q = graft.streaming.CdcRead.replicaPipeline(spark, srcWh,
        table, dst, table, keyCol, ckpt, Trigger.AvailableNow())
      require(q.awaitTermination(3600000), s"$label did not drain in 1 h")
      val t = sec(t0)
      val (sc2, sv, sk) = fingerprint(src)
      val (dc, dv, dk) = fingerprint(dst)
      // Count and key-sum must be EXACT; the double value-sum gets a
      // relative tolerance (summation order differs between the two
      // tables' partitionings — ~1e-15 relative on 1e13 sums).
      require(sc2 == dc && sk == dk &&
        math.abs(sv - dv) <= math.max(1.0, math.abs(sv)) * 1e-9,
        s"$label diverged: src=($sc2,$sv,$sk) dst=($dc,$dv,$dk)")
      report(label, f"$t%.1f s, converged at $sc2 rows")
    }

    // BUCKET-NARROW history statements: IN-lists on the partition
    // column prune to ≤|list| buckets, so a statement rewrites (and
    // archives) only its touched buckets — the CDC-workload shape.
    // A modulus/range predicate cannot prune a HASH-bucketed table:
    // it rewrites every bucket and archives a full table size per
    // statement (the first probe run ENOSPC'd exactly there).
    def keyList(round: Int, n: Int): String =
      (0 until n).map(i => 1000L + round * 100 + i).mkString(", ")
    def narrowHistory(r: Int): Unit = {
      src.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
        s"WHERE $keyCol IN (${keyList(r, 10)})")
      src.sql(s"UPDATE $table SET $valCol = $valCol + 2 " +
        s"WHERE $keyCol = ${42 + r}")
      src.sql(s"DELETE FROM $table WHERE $keyCol IN (${keyList(r, 5)})")
      insertBatch(r)
    }

    // GRAFT_REPLICA_SYNC_ONLY=1: generate no new history, only drain
    // whatever the checkpoint has not consumed (mid-history crash
    // recovery — the killed batch's interval replays and the MERGE
    // apply converges) and verify the quiet resume.
    if (sys.env.contains("GRAFT_REPLICA_SYNC_ONLY")) {
      sync("resume_after_kill")
      sync("quiet_resume")
      spark.stop()
      return
    }

    // History BEFORE the first sync: the bootstrap must carry it.
    src.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
      s"WHERE $keyCol IN (${keyList(0, 10)})")
    sync("bootstrap") // full state as inserts → MERGE into empty

    // Mixed daily history, then incremental catch-up.
    (1 to 2).foreach(narrowHistory)
    sync("incremental_catchup")

    // Checkpoint-resume mid-history: more commits, third run consumes
    // only the new interval — including ONE broad bulk-rescoring day
    // (a full-table rewrite: the feed pays the whole rewrite volume,
    // the honest heavy case).
    narrowHistory(3)
    src.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
      s"WHERE $keyCol % 9973 = 3")
    insertBatch(4)
    sync("resume_with_broad_day")

    // Quiet resume: nothing new, the run must be (near-)free.
    sync("quiet_resume")
    spark.stop()
  }
}
