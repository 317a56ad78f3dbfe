package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Throwaway decomposition harness (round 15: the q_anti_join sf30
  * plan probe — does pre-distincting the anti-join's build side, the
  * round-12 eager-aggregation-below-join trick, beat shuffling every
  * open-order row?). Not part of the library surface.
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

    def t(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.queryExecution.toRdd.count() // warm
      val times = (1 to 3).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        f.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scratch] $label: min=${times.min}%.3f  ${times.map(x => f"$x%.2f").mkString(",")}")
    }

    val ords = Tables(spark, dir, "orders")
    val cust = Tables(spark, dir, "customer")
    val open = ords.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey"))

    def current = cust
      .join(open, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

    // Eager distinct below the anti join: the build side collapses to
    // distinct keys BEFORE the exchange (map-side partial agg), so the
    // shuffle moves |distinct custkeys| rows instead of |open orders|.
    def reduced = cust
      .join(open.distinct(), col("c_custkey") === col("o_custkey"),
        "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

    def hinted = cust
      .join(open.hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

    def reducedHinted = cust
      .join(open.distinct().hint("shuffle_hash"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")

    val docs = Tables(spark, dir, "documents")
    def tfCurrent = docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(50)
    def tfKernel = docs
      .select(explode(graft.functions.TextFunctions
        .tokenTfPairs(spark, col("text"))).as("p"))
      .groupBy(col("p.token").as("token"))
      .agg(sum(col("p.tf")).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(50)
    val d5 = docs.select(col("doc_id"),
      graft.functions.TextFunctions.shingleKText(spark, col("text"), 5)
        .as("g"))
      .filter(size(col("g")) >= 1)
    val grams5 = d5.select(col("doc_id"), explode(col("g")).as("h"))
    def hot5 = grams5.groupBy("h").agg(count(lit(1)).as("df"))
      .filter(col("df") >= 5).select("h")
    t("bp_1_kernel_scan")(d5.select(col("doc_id"), size(col("g")).as("n")))
    t("bp_2_explode")(grams5)
    t("bp_3_df_agg_hot")(hot5)
    t("bp_4_semi_count")(grams5.join(hot5, Seq("h"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_boiler")))
    t("bp_5_full")(graft.SparkEntry.queries("q_boilerplate")(spark, dir))
    println("[scratch] hot size = " + hot5.count() +
      " grams = " + grams5.count())
    spark.stop()
  }
}
