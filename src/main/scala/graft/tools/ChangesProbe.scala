package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-scale probe for [[graft.mpp.MppEngine.tableChanges]]: on an
  * EXISTING warehouse table, measures the change feed's claimed cost
  * law — feed time scales with the interval's REWRITE volume, not the
  * table — from both ends:
  *
  *  - a narrow UPDATE (IN-list on the partition column → a handful of
  *    buckets) followed by the feed over that interval: the diff must
  *    read only those buckets' before/after files;
  *  - a broad UPDATE (modulus predicate → every bucket rewritten)
  *    followed by its feed: the diff now pays the full rewrite volume
  *    twice plus the exceptAll exchange — the honest worst case.
  *
  * Requires time travel ON (the default) so the interval's manifests
  * and archived files exist. A warm-up statement first pins a manifest
  * for the CURRENT state — probe tables are often built with
  * `graft.timetravel.enabled=false`, so version v0 may predate
  * manifest-keeping.
  *
  * Usage: ChangesProbe <warehouse> <table> <keyCol> <valCol> [mod]
  *          [buildFromParquet buckets]
  * The optional build args create the table (keyCol-partitioned, k
  * buckets) from a parquet path when it does not exist yet — the
  * narrow case needs a HIGH bucket count to show its point (2 touched
  * buckets of 1000 is a feed; 2 of 8 is a quarter-table read).
  */
object ChangesProbe {
  def main(args: Array[String]): Unit = {
    val Array(wh, table, keyCol, valCol) = args.take(4)
    val mod = if (args.length > 4) args(4).toLong else 1009L
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
    val e = new graft.mpp.MppEngine(spark, wh)
    if (e.catalog.state.liveTable(table).isEmpty) {
      require(args.length > 6, s"table $table missing and no build args")
      val src = spark.read.parquet(args(5))
      e.createDistributedTable(table, src.schema.toDDL, keyCol,
        args(6).toInt)
      val t0 = System.nanoTime()
      e.insertInto(table, src)
      System.err.println(
        f"built $table: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }

    def timed[T](label: String)(f: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$label: $dt%.2f s")
      (dt, r)
    }
    def feed(v1: Long, v2: Long): (Double, Seq[String]) = {
      val (dt, rows) = timed(s"tableChanges($v1,$v2)") {
        e.tableChanges(table, v1, v2)
          .groupBy("_change_type").agg(count(lit(1)).as("n"))
          .collect().map(r => s"${r.getString(0)}:${r.getLong(1)}")
          .sorted.toSeq
      }
      (dt, rows)
    }

    // Real keys (TPC-H orderkeys are sparse — a guessed literal can
    // match nothing, which would skip the rewrite AND the manifest pin).
    val Array(kLo, kHi) = e.table(table)
      .agg(min(col(keyCol)), max(col(keyCol))).head()
      .toSeq.map(_.toString.toLong).toArray
    // Warm-up + manifest pin for the current state (probe tables are
    // often built pre-manifests / with time travel off; the feed's
    // from-version must hold a manifest or the diff is the bootstrap
    // all-insert read). The SET must CHANGE the value — the engine's
    // convergent-DML match-prune skips rewrites (and the manifest
    // commit) for statements that change nothing.
    e.sql(s"UPDATE $table SET $valCol = -0.5 WHERE $keyCol = $kLo")
    val v0 = e.catalog.currentVersionOnDisk
    // Narrow: two real keys → at most two buckets rewritten.
    val (updNarrow, _) = timed("narrow update")(e.sql(
      s"UPDATE $table SET $valCol = -1 " +
        s"WHERE $keyCol IN ($kLo, $kHi)"))
    val v1 = e.catalog.currentVersionOnDisk
    val (feedN1, rowsN) = feed(v0, v1)
    val (feedN2, _) = feed(v0, v1) // repeat: planning/JIT share
    // Broad: every bucket rewritten; changed rows stay sparse.
    val (updBroad, _) = timed("broad update")(e.sql(
      s"UPDATE $table SET $valCol = -2 WHERE $keyCol % $mod = 0"))
    val v2 = e.catalog.currentVersionOnDisk
    val (feedB, rowsB) = feed(v1, v2)
    val total = e.table(table).count()
    println(s"""{"metric":"changes_probe","table_rows":$total,""" +
      f""""narrow_update_s":$updNarrow%.2f,"feed_narrow_s":[$feedN1%.2f,$feedN2%.2f],""" +
      s""""feed_narrow":"${rowsN.mkString(",")}",""" +
      f""""broad_update_s":$updBroad%.2f,"feed_broad_s":$feedB%.2f,""" +
      s""""feed_broad":"${rowsB.mkString(",")}"}""")
    spark.stop()
  }
}
