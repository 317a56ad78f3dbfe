package graft.tools

import org.apache.spark.sql.SparkSession

/** One-statement FileSystem-RPC attribution over a `slowfs:` warehouse
  * (delay 0 — count, don't sleep): runs a single 1-key UPDATE and a
  * single small INSERT against an existing high-k table and prints the
  * per-operation RPC counts each performed. Exists because the §24
  * commit-tail A/B surfaced a per-statement RPC volume of ~4-5× the
  * table's FILE COUNT — this names the term so it can be engineered,
  * not guessed at.
  *
  * Usage: runMain graft.tools.RpcProbe <slowfs-warehouse> <table>
  */
object RpcProbe {

  /** `--wire <buckets> <rows> [delayMs]`: the same statement-shape RPC
    * attribution, but over `graftfs:` — a REAL TCP filesystem
    * ([[MiniFsServer]], in-process listener, optional per-request
    * latency) — so the §25.1 publish-constant numbers are
    * cross-validated with genuine wire semantics AND genuine wall
    * latency, not an instrumented local delegate. In local[n] the
    * executors share the JVM, so the client counters see EVERY
    * filesystem RPC including the task-side ranged parquet reads. */
  private def wireMain(args: Array[String]): Unit = {
    val k = args(0).toInt
    val rows = args(1).toLong
    val delayMs = args.lift(2).map(_.toLong).getOrElse(0L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[HttpDataFileSystem].getName)
    hc.set("fs.AbstractFileSystem.graftfs.impl",
      classOf[HttpDataAbstractFs].getName)
    spark.conf.set("graft.catalog.fs.assumeAtomic", "true")
    val server = new MiniFsServer(0, delayMs).start()
    val local = java.nio.file.Files
      .createTempDirectory("graft-wireprobe").toString
    try {
      val wh = s"graftfs://127.0.0.1:${server.boundPort}$local"
      val e = new graft.mpp.MppEngine(spark, wh)
      import org.apache.spark.sql.functions._
      def phase(tag: String)(body: => Unit): Unit = {
        val before = HttpDataFileSystem.snapshotByOp()
        val t0 = System.nanoTime()
        body
        val secs = (System.nanoTime() - t0) / 1e9
        val diff = HttpDataFileSystem.snapshotByOp().map { case (kk, v) =>
          kk -> (v - before.getOrElse(kk, 0L)) }.filter(_._2 > 0)
        println(f"[rpc-probe/wire] $tag: $secs%.1f s, ${diff.values.sum} " +
          "RPCs = " + diff.toSeq.sortBy(-_._2)
            .map { case (kk, v) => s"$kk=$v" }.mkString(", "))
      }
      println(s"[rpc-probe/wire] k=$k rows=$rows delayMs=$delayMs")
      phase("build(create+insert)") {
        e.createDistributedTable("owire",
          "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE",
          "o_orderkey", k)
        e.insertInto("owire", spark.range(0L, rows, 1, 32).toDF("o_orderkey")
          .withColumn("o_custkey", col("o_orderkey") % 1000)
          .withColumn("o_totalprice", (col("o_orderkey") % 997) * 1.0))
      }
      phase("full_count")(e.table("owire").count())
      phase("second_full_count")(e.table("owire").count())
      val shards = e.explainShards(
        e.table("owire").filter(col("o_orderkey") === 12345L))
      require(shards == s"Shards: 1/$k",
        s"bucket pruning lost on the wire scheme: $shards")
      phase("point_read") {
        e.table("owire").filter(col("o_orderkey") === 12345L).count()
      }
      phase("update_1key") {
        e.sql("UPDATE owire SET o_totalprice = -1 WHERE o_orderkey = 777")
      }
      phase("insert_1krows") {
        e.insertInto("owire",
          spark.range(rows, rows + 1000L).toDF("o_orderkey")
            .withColumn("o_custkey", col("o_orderkey") % 1000)
            .withColumn("o_totalprice", lit(1.0)))
      }
      phase("post_insert_count")(e.table("owire").count())
    } finally {
      server.stop()
      spark.stop()
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--wire")) {
      wireMain(args.drop(1)); return
    }
    val Array(wh, table) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.slowfs.impl", classOf[DelayedFileSystem].getName)
    hc.set("fs.AbstractFileSystem.slowfs.impl",
      classOf[DelayedAbstractFs].getName)
    hc.set("fs.slowfs.delay.ms", "0")
    val stacks = sys.env.getOrElse("GRAFT_RPC_STACKS", "0") == "1"
    if (stacks) hc.set("fs.slowfs.stacks", "true")
    spark.conf.set("graft.catalog.fs.assumeAtomic", "true")
    val e = new graft.mpp.MppEngine(spark, wh)
    val t = e.catalog.state.liveTable(table).getOrElse(
      sys.error(s"no table $table in $wh"))
    println(s"[rpc-probe] table $table: ${t.buckets} buckets")
    def snapStacks(): Map[String, Long] = {
      import scala.jdk.CollectionConverters._
      DelayedFileSystem.byStack.asScala
        .map { case (k, v) => k -> v.sum() }.toMap
    }
    def phase(tag: String)(body: => Unit): Unit = {
      val before = DelayedFileSystem.snapshotByOp()
      val beforeS = if (stacks) snapStacks() else Map.empty[String, Long]
      val t0 = System.nanoTime()
      body
      val secs = (System.nanoTime() - t0) / 1e9
      val after = DelayedFileSystem.snapshotByOp()
      val diff = after.map { case (k, v) =>
        k -> (v - before.getOrElse(k, 0L)) }.filter(_._2 > 0)
      val total = diff.values.sum
      println(f"[rpc-probe] $tag: $secs%.1f s, $total RPCs = " +
        diff.toSeq.sortBy(-_._2).map { case (k, v) => s"$k=$v" }
          .mkString(", "))
      if (stacks) {
        val sdiff = snapStacks().map { case (k, v) =>
          k -> (v - beforeS.getOrElse(k, 0L)) }.filter(_._2 > 0)
        sdiff.toSeq.sortBy(-_._2).take(12).foreach { case (k, v) =>
          println(s"[rpc-probe]   $v  $k") }
      }
    }
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val fields = StructType.fromDDL(t.schemaDdl).fields
    val keyCol = t.partitionColumn
    val setCol = fields.find(f => !f.name.equalsIgnoreCase(keyCol) &&
      f.dataType.isInstanceOf[NumericType]).get.name
    phase("full_count")(e.table(table).count())
    phase("second_full_count")(e.table(table).count())
    // Pruning sanity: the version-keyed index must still expose the
    // bucket partition column (a silent inference failure turns every
    // pruned read into a full footer sweep).
    val shards = e.explainShards(
      e.table(table).filter(col(keyCol) === 30000000100L))
    require(shards == s"Shards: 1/${t.buckets}",
      s"bucket pruning lost on the version-keyed index: $shards")
    phase("point_read") {
      e.table(table).filter(col(keyCol) === 30000000100L).count()
    }
    // Fresh SET value per run so re-runs still perform a REAL rewrite
    // (the engine skips no-op updates).
    val cur = e.table(table).filter(col(keyCol) === 30000000100L)
      .select(col(setCol).cast("long")).collect()(0).getLong(0)
    val next = (cur + 1) % 1000000
    phase("update_1key") {
      e.sql(s"UPDATE $table SET $setCol = $next " +
        s"WHERE $keyCol = 30000000100")
    }
    val got = e.table(table).filter(col(keyCol) === 30000000100L)
      .select(col(setCol).cast("long")).collect().map(_.getLong(0))
    require(got.sameElements(Array(next)),
      s"update did not land: ${got.mkString(",")} want $next")
    phase("update_1key_other") {
      e.sql(s"UPDATE $table SET $setCol = ${(next + 7) % 1000000} " +
        s"WHERE $keyCol = 30000000101")
    }
    phase("insert_1krows") {
      var df = spark.range(90000000000L, 90000001000L).toDF("__id")
      fields.foreach { f =>
        df = df.withColumn(f.name,
          if (f.name.equalsIgnoreCase(keyCol)) col("__id")
          else f.dataType match {
            case StringType => lit("rpcprobe")
            case DateType => to_date(lit("2024-01-01"))
            case n: NumericType => (col("__id") % 1000).cast(n)
            case other => lit(null).cast(other)
          })
      }
      e.insertInto(table, df.select(fields.map(f => col(f.name)): _*))
    }
    spark.stop()
  }
}
