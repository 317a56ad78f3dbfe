package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-scale probe for the versioned catalog's STORAGE story with
  * time travel ON — the as-shipped default (round-11 verdict item 1:
  * every recorded DML decade ran with archiving off, so the perf
  * story was the non-default config). Measures, on an EXISTING
  * 500M-row-class table:
  *
  *  - archive bytes growth per statement (narrow and broad UPDATEs),
  *    against the retention model: within the 20-snapshot window a
  *    rewrite retains its replaced bucket files until VACUUM;
  *  - the broad-UPDATE latency with archiving ON vs OFF (the archive
  *    is a RENAME per replaced bucket dir — the delta is the claim
  *    this probe prices);
  *  - `DESCRIBE HISTORY` wall-time and its `data_bytes` answer;
  *  - RESTORE latency at scale (rename-only both directions);
  *  - VACUUM wall-time and bytes reclaimed, parallel vs serial sweep
  *    (`graft.vacuum.parallel`), on a churned high-bucket table where
  *    the sweep has real fan-out.
  *
  * Usage: TimeTravelProbe <warehouse> <table> <keyCol> <valCol> [mod]
  *        [churnParquet churnBuckets]
  * The optional churn args build a SECOND table `<table>_churn`
  * (keyCol-partitioned, high bucket count) from a parquet path and
  * run the churn/VACUUM phase on it; without them only the big-table
  * phase runs. Results print as `[tt-probe]` lines; BASELINE.md §22
  * records them. */
object TimeTravelProbe {

  private def now(): Long = System.nanoTime()
  private def sec(t0: Long): Double = (now() - t0) / 1e9

  def main(args: Array[String]): Unit = {
    val Array(wh, table, keyCol, valCol) = args.take(4)
    val mod = if (args.length > 4) args(4).toLong else 1013L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = new graft.mpp.MppEngine(spark, wh)

    def archiveBytes(t: String): Long = {
      val p = new org.apache.hadoop.fs.Path(s"$wh/data/$t/.archive")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      if (!fs.exists(p)) 0L
      else fs.getContentSummary(p).getLength
    }
    def gb(b: Long): String = f"${b / 1e9}%.2f GB"
    def report(k: String, v: String): Unit = println(s"[tt-probe] $k: $v")

    // ---- phase 1: the big table, archiving ON (the default) ----------
    // GRAFT_TT_PHASE2_ONLY=1 skips it (phase 2 reruns don't need to
    // re-churn the 500M mirror).
    if (sys.env.get("GRAFT_TT_PHASE2_ONLY").isEmpty) {
    require(e.catalog.state.liveTable(table).isDefined, s"no table $table")
    report("free_disk_gb",
      f"${new java.io.File("/tmp").getUsableSpace / 1e9}%.1f")
    report("archive_bytes_start", gb(archiveBytes(table)))

    // Warm-up manifest pin (probe tables may predate manifest-keeping);
    // MUST change a value — value-identical rewrites are skipped
    // entirely, including the manifest commit.
    e.sql(s"UPDATE $table SET $valCol = $valCol + 1 WHERE $keyCol = 11")

    // Narrow updates: single-key → one bucket rewritten per statement.
    (1 to 3).foreach { i =>
      val before = archiveBytes(table)
      val t0 = now()
      e.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
        s"WHERE $keyCol = ${100 + i}")
      report(s"narrow_update_$i",
        f"${sec(t0)}%.1f s, archive +${gb(archiveBytes(table) - before)}")
    }

    val vPreBroad = e.catalog.currentVersionOnDisk

    // Broad update: every bucket rewritten — the worst-case archive
    // growth (one full table size retained until VACUUM).
    locally {
      val before = archiveBytes(table)
      val t0 = now()
      e.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
        s"WHERE $keyCol % $mod = 7")
      report("broad_update_tt_on",
        f"${sec(t0)}%.1f s, archive +${gb(archiveBytes(table) - before)}")
    }

    // DESCRIBE HISTORY at scale: wall time + the bytes answer.
    locally {
      val t0 = now()
      val h = e.describeHistory(table).collect()
      report("describe_history",
        f"${sec(t0)}%.1f s, ${h.length} rows, latest data_bytes=" +
          gb(h.last.getAs[Long]("data_bytes")))
    }

    // RESTORE to the pre-broad version (rename-only at any scale),
    // then restore forward again (RESTORE is itself undoable).
    locally {
      val vHead = e.catalog.currentVersionOnDisk
      val t0 = now()
      e.restoreTable(table, vPreBroad)
      report("restore_to_pre_broad", f"${sec(t0)}%.1f s")
      val t1 = now()
      e.restoreTable(table, vHead)
      report("restore_forward_again", f"${sec(t1)}%.1f s")
    }

    // VACUUM on the big archive: everything is still inside the
    // retention window, so this prices the SCAN (nothing reclaimed).
    locally {
      val t0 = now()
      val st = e.vacuumTimeTravel(graceMs = 0L)
      report("vacuum_window_all_retained",
        f"${sec(t0)}%.1f s, $st")
    }

    // The same broad update with archiving OFF — the latency
    // comparison that prices the archive renames.
    locally {
      spark.conf.set("graft.timetravel.enabled", "false")
      val t0 = now()
      e.sql(s"UPDATE $table SET $valCol = $valCol + 1 " +
        s"WHERE $keyCol % $mod = 7")
      report("broad_update_tt_off", f"${sec(t0)}%.1f s")
      spark.conf.unset("graft.timetravel.enabled")
    }
    report("archive_bytes_end", gb(archiveBytes(table)))

    // Age the probe's history out of the retention window with cheap
    // metadata commits, then measure the BIG reclaim: VACUUM wall-time
    // and bytes on a ~table-sized archive — the 500M-decade capacity
    // answer (and it leaves the mirror tidy for later probes).
    locally {
      val tag = System.currentTimeMillis()
      (1 to graft.mpp.MppCatalog.RetainSnapshots + 1).foreach(i =>
        e.sql(s"CREATE SCHEMA probe_gc_${tag}_$i"))
      val t0 = now()
      val st = e.vacuumTimeTravel(graceMs = 0L)
      report("vacuum_big_reclaim",
        f"${sec(t0)}%.1f s, reclaimed ${gb(st.bytesReclaimed)}, $st")
      report("archive_bytes_after_reclaim", gb(archiveBytes(table)))
    }
    } // end phase 1

    // ---- phase 2 (optional): churn + VACUUM on a high-bucket table ---
    if (args.length > 6) {
      val churnTable = s"${table}_churn"
      val buckets = args(6).toInt
      if (e.catalog.state.liveTable(churnTable).isEmpty) {
        val src = spark.read.parquet(args(5))
        e.createDistributedTable(churnTable, src.schema.toDDL, keyCol,
          buckets)
        val t0 = now()
        e.insertInto(churnTable, src)
        report("churn_build", f"${sec(t0)}%.1f s, $buckets buckets")
      }
      // Churn: broad rewrites age past the retention window so VACUUM
      // has real generations (buckets-wide) to sweep; narrow updates
      // push them out of the window cheaply.
      def broad(i: Int): Unit =
        e.sql(s"UPDATE $churnTable SET $valCol = $valCol + 1 " +
          s"WHERE $keyCol % $mod = $i")
      def narrow(i: Int): Unit =
        e.sql(s"UPDATE $churnTable SET $valCol = $valCol + 1 " +
          s"WHERE $keyCol = ${500 + i}")
      // Alternating same-JVM A/B: the archiving cost (one rename per
      // replaced bucket dir + the manifest commit) priced against the
      // IDENTICAL broad statement with archiving off — steady-state
      // both sides, so JIT/page-cache warming cancels instead of
      // masquerading as archive cost (phase 1's sequential on-then-off
      // pair cannot separate the two).
      (1 to 6).foreach { i =>
        val on = i % 2 == 0
        if (!on) spark.conf.set("graft.timetravel.enabled", "false")
        val t0 = now()
        broad(10 + i)
        report(f"ab_broad_${if (on) "tt_on" else "tt_off"}%s_$i",
          f"${sec(t0)}%.1f s")
        if (!on) spark.conf.unset("graft.timetravel.enabled")
      }
      (1 to 2).foreach(broad)
      (1 to graft.mpp.MppCatalog.RetainSnapshots + 2).foreach(narrow)
      report("churn_archive_bytes", gb(archiveBytes(churnTable)))
      // Serial sweep first (measures the round-11 walk), then rebuild
      // comparable garbage and sweep parallel.
      locally {
        spark.conf.set("graft.vacuum.parallel", "false")
        val t0 = now()
        val st = e.vacuumTimeTravel(graceMs = 0L)
        report("vacuum_serial", f"${sec(t0)}%.1f s, $st")
        spark.conf.unset("graft.vacuum.parallel")
      }
      (3 to 4).foreach(broad)
      (1 to graft.mpp.MppCatalog.RetainSnapshots + 2).foreach(narrow)
      locally {
        val t0 = now()
        val st = e.vacuumTimeTravel(graceMs = 0L)
        report("vacuum_parallel", f"${sec(t0)}%.1f s, $st")
      }
    }
    spark.stop()
  }
}
