package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deep-scale probe for `OPTIMIZE … ZORDER BY`: on an existing
  * warehouse table, times a ~1%-band range aggregate on EACH of two
  * dimensions before and after the re-cluster. The claim under test
  * is the multi-dimension one: after ZORDER, zone maps prune file
  * reads for range predicates on BOTH dimensions (SORT BY would buy
  * only its lead column). Run with `graft.timetravel.enabled=false`
  * on disk-bounded boxes — the rewrite is table-sized.
  *
  * Usage: ZOrderProbe <warehouse> <table> <dim1> <dim2>
  */
object ZOrderProbe {
  def main(args: Array[String]): Unit = {
    val Array(wh, table, d1, d2) = args.take(4)
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

    val st = e.table(table).agg(
      min(col(d1)).cast("double"), max(col(d1)).cast("double"),
      min(col(d2)).cast("double"), max(col(d2)).cast("double")).head()
    def band(lo: Double, hi: Double): (Double, Double) = {
      val mid = (lo + hi) / 2; val w = (hi - lo) / 200 // ~1% band
      (mid - w, mid + w)
    }
    val (a1, b1) = band(st.getDouble(0), st.getDouble(1))
    val (a2, b2) = band(st.getDouble(2), st.getDouble(3))
    def q(dim: String, lo: Double, hi: Double): Double = {
      // Filter on the column's NATIVE type: a cast-wrapped attribute is
      // not a pushable conjunct, which would silently disable both the
      // parquet pushdown and the zone maps this probe exists to measure
      // (the first 500M run demonstrated exactly that on the BIGINT
      // dimension).
      val dt = e.table(table).schema(dim).dataType
      val cond = col(dim).between(lit(lo).cast(dt), lit(hi).cast(dt))
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        e.table(table)
          .filter(cond)
          .agg(count(lit(1)), sum(col(d2).cast("double"))).head()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    def both(tag: String): (Double, Double) = {
      val t1 = q(d1, a1, b1); val t2 = q(d2, a2, b2)
      System.err.println(f"$tag: $d1-band $t1%.2f s, $d2-band $t2%.2f s")
      (t1, t2)
    }
    val measureOnly = args.length > 4 && args(4) == "--measure"
    val (pre1, pre2) =
      if (measureOnly) (0.0, 0.0) else both("pre-zorder ")
    val zt =
      if (measureOnly) 0.0
      else {
        val t0 = System.nanoTime()
        e.sql(s"OPTIMIZE $table ZORDER BY ($d1, $d2)")
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"zorder rewrite: $dt%.1f s")
        dt
      }
    val (post1, post2) = both("post-zorder")
    println(f"""{"metric":"zorder_probe","rows":${e.table(table).count()},""" +
      f""""rewrite_s":$zt%.1f,"pre_s":[$pre1%.2f,$pre2%.2f],""" +
      f""""post_s":[$post1%.2f,$post2%.2f]}""")
    spark.stop()
  }
}
