package graft.mpp

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.tools.{HttpDataAbstractFs, HttpDataFileSystem, MiniFsServer}

/** Pins the HTTP data-plane filesystem (`graftfs:` — round-14 verdict
  * item 8): a Hadoop FileSystem whose every call is a real TCP RPC to
  * [[graft.tools.MiniFsServer]]. The suite drives it in-process (the
  * server is a real socket listener either way); ClusterCheck forks
  * the server into a SEPARATE PROCESS and runs the same battery with
  * executor JVMs doing ranged parquet reads over the wire. */
class HttpDataFsSpec extends SparkTestBase {

  private def withServer(body: (Int, String) => Unit): Unit = {
    val server = new MiniFsServer(0).start()
    val local = Files.createTempDirectory("graft-minifs").toString
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.graftfs.impl", classOf[HttpDataFileSystem].getName)
    hc.set("fs.AbstractFileSystem.graftfs.impl",
      classOf[HttpDataAbstractFs].getName)
    try body(server.boundPort, local)
    finally server.stop()
  }

  test("FileSystem contract over the wire: mkdirs, exclusive create, " +
      "non-overwriting rename, listing, ranged reads, delete") {
    withServer { (port, local) =>
      val p = new Path(s"graftfs://127.0.0.1:$port$local/a/b")
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      assert(fs.isInstanceOf[HttpDataFileSystem])
      assert(fs.mkdirs(p))
      val f = new Path(p, "x.bin")
      val out = fs.create(f, false)
      out.write(Array.tabulate[Byte](1000)(_.toByte))
      out.close()
      // Exclusive create on an existing path fails.
      intercept[java.io.IOException] {
        val o2 = fs.create(f, false)
        o2.write(1); o2.close()
      }
      // Ranged read: the parquet access pattern.
      val in = fs.open(f)
      val buf = new Array[Byte](10)
      in.readFully(990, buf)
      assert(buf.toSeq == (990 until 1000).map(_.toByte).toSeq)
      in.seek(5)
      assert(in.read() == 5)
      in.close()
      assert(fs.getFileStatus(f).getLen == 1000)
      assert(fs.listStatus(p).map(_.getPath.getName).toSet == Set("x.bin"))
      // Rename refuses an existing destination; succeeds to a fresh one.
      val g = new Path(p, "y.bin")
      val o3 = fs.create(g, false); o3.write(9); o3.close()
      assert(!fs.rename(f, g))
      val h = new Path(p, "z.bin")
      assert(fs.rename(f, h))
      assert(!fs.exists(f) && fs.exists(h))
      // Non-recursive delete of a non-empty dir refuses loudly.
      intercept[java.io.IOException] { fs.delete(p, false) }
      assert(fs.delete(p, true))
      assert(!fs.exists(p))
    }
  }

  test("engine DML + time travel run end-to-end on graftfs: — every " +
      "data AND catalog RPC is a TCP request") {
    withServer { (port, local) =>
      spark.conf.set("graft.catalog.fs.assumeAtomic", "true")
      try {
        val before = HttpDataFileSystem.rpcs.sum()
        val e = new MppEngine(spark, s"graftfs://127.0.0.1:$port$local")
        e.sql("CREATE TABLE hf(k BIGINT, v DOUBLE) PARTITION BY (k) " +
          "WITH BUCKETS 4")
        e.insertInto("hf", spark.range(0, 500).toDF("k")
          .withColumn("v", col("k") * 1.0))
        val v1 = e.catalog.currentVersionOnDisk
        e.sql("UPDATE hf SET v = -1 WHERE k < 10")
        e.sql("DELETE FROM hf WHERE k >= 490")
        assert(e.table("hf").count() == 490)
        assert(e.table("hf").filter(col("v") === -1).count() == 10)
        assert(e.tableAsOf("hf", v1)
          .agg(sum("v")).head().getDouble(0) == (0 until 500).sum.toDouble)
        assert(e.explainShards(e.table("hf").filter(col("k") === 7L))
          == "Shards: 1/4")
        val rpcs = HttpDataFileSystem.rpcs.sum() - before
        assert(rpcs > 100, s"expected real RPC volume, saw $rpcs")
      } finally spark.conf.unset("graft.catalog.fs.assumeAtomic")
    }
  }
}
