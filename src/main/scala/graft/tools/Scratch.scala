package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Throwaway decomposition harness for the sf300 q_range_join probe —
  * times each component of the query separately to locate where the
  * superlinear wall-clock goes. Not part of the library surface.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "256"))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val ev = Tables(spark, dir, "events")
      .withColumn("t", date_trunc("second", col("ts")))

    t("events count")(println("  n=" + ev.count()))

    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("t").as("ts"), col("value"))
    t("clicks count")(println("  n=" + clicks.count()))

    val sessionsRaw = graft.streaming.EventStreams.sessionizeBatch(clicks)
      .select(col("user_id"), col("session_start"), col("session_end"))
      .withColumn("lo", unix_micros(col("session_start")) / 1000000L)
      .withColumn("hi", unix_micros(col("session_end")) / 1000000L + 86400L)
    val sessions = t("sessionize + localCheckpoint") {
      sessionsRaw.localCheckpoint()
    }
    t("sessions count")(println("  n=" + sessions.count()))

    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"),
        (unix_micros(col("t")) / 1000000L).as("p"))
    t("purchases count")(println("  n=" + purchases.count()))

    (1 to 2).foreach { i =>
      t(s"binned join + agg rep$i") {
        val joined = RangeJoin.pointInInterval(purchases, sessions,
            "p", "lo", "hi", binWidth = 21600L, keys = Seq("user_id"))
          .groupBy(col("user_id"), col("session_start"))
          .agg(count(lit(1)).as("n_purchases"),
            round(sum(col("value")), 4).as("purchase_value"))
        println("  out=" + joined.count())
      }
    }
    spark.stop()
  }
}
