package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deterministic scale-up of the driver testdata: `k` shifted copies of
  * every table, preserving referential integrity (all foreign keys shift
  * by the same per-entity key-space stride) and workload shape:
  *
  *  - copy 0 is bit-identical in content to the source — the scaled set
  *    contains the original as a subset;
  *  - document text in copies ≥ 1 is re-tokenized with a per-copy word
  *    suffix: a BIJECTIVE token mapping, so within-copy jaccard
  *    similarity is EXACTLY preserved (planted near-dups stay near-dups)
  *    while cross-copy shingle overlap is zero (no quadratic pair
  *    explosion — the corpus grows, clusters do not);
  *  - embedding labels shift per copy (cells multiply, cell size stays),
  *    the honest IVF-cell scaling shape;
  *  - events keep their time range (10× rows per window, same windows) —
  *    `ts` is written as TIMESTAMP(micros), which [[graft.Tables]]
  *    handles via its schema branch.
  *
  * Usage: runMain graft.tools.ScaleData <srcDir> <outDir> [factor]
  *        [tables] — optional comma-separated subset (e.g.
  *        `documents,events`) for disk-budgeted deep-scale mirrors
  *        (round-8 verdict "next" #9: a column/table-pruned mirror
  *        pushes the dedup/text rows another decade within the disk
  *        budget a full mirror would blow).
  */
object ScaleData {

  // Key-space strides (≥ max key + 1 in the driver data, any sf).
  private val O = 1500000L // o_orderkey / l_orderkey
  private val C = 150000L  // c_custkey / o_custkey
  private val P = 200000L  // p_partkey / l_partkey
  private val S = 10000L   // s_suppkey / l_suppkey
  private val E = 1000000L // event_id
  private val U = 15000L   // user_id
  private val D = 50000L   // doc_id
  private val V = 20000L   // vec_id
  private val L = 10000    // label

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val k = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tables =
      if (args.length > 3) args(3).split(",").map(_.trim).toSet
      else Set.empty[String]
    synthesize(spark, src, out, k, tables)
    spark.stop()
  }

  def synthesize(spark: SparkSession, src: String, out: String,
      k: Int, only: Set[String] = Set.empty): Unit = {
    def t(n: String) = Tables(spark, src, n)
    def shift(c: String, stride: Long) = col(c) + col("copy") * stride
    def want(n: String): Boolean = only.isEmpty || only.contains(n)
    // Deep-scale mirrors need more, splittable files per table: scale
    // the per-table file count with k so no single output file exceeds
    // a few tens of MB and local[32] scans parallelize. (Round-9
    // lesson: k/250 left the 1000× events table at 16 one-row-group
    // 70 MB files — a 16-way scan ceiling that HALVED stage-1
    // parallelism on 32 cores and showed up as a flat 2× on every
    // events row; parquet row groups are the split floor, so the
    // WRITER decides scan parallelism for every engine downstream.)
    def files(base: Int): Int = math.min(128, math.max(base, k / 10))

    // Split output across files so scans parallelize: the driver's
    // single-row-group source files cap scan parallelism at one task
    // per table (for ANY engine); the scaled mirror should look like a
    // production table layout — many splittable files.
    //
    // The SOURCE rows are repartitioned to `files` tasks BEFORE the
    // k-way explode, and the output writes straight from those tasks —
    // shuffling thousands of source rows instead of k× million
    // exploded ones. (The original post-explode repartition made one
    // task materialize AND shuffle the entire k-copied table: at
    // k = 1000 that is a single-threaded ~50 GB shuffle write per big
    // table — measured stalling the sf100 build for half an hour and
    // nearly exhausting the disk.)
    def scaled(df: DataFrame, files: Int): DataFrame =
      df.repartition(files)
        .withColumn("copy", explode(sequence(lit(0L), lit(k - 1L))))

    def write(df: DataFrame, name: String): Unit =
      df.drop("copy").write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    if (want("region")) write(t("region").repartition(1), "region")
    if (want("nation")) write(t("nation").repartition(1), "nation")
    if (want("customer")) write(scaled(t("customer"), files(8))
      .withColumn("c_custkey", shift("c_custkey", C)), "customer")
    if (want("supplier")) write(scaled(t("supplier"), files(4))
      .withColumn("s_suppkey", shift("s_suppkey", S)), "supplier")
    if (want("part")) write(scaled(t("part"), files(8))
      .withColumn("p_partkey", shift("p_partkey", P)), "part")
    if (want("orders")) write(scaled(t("orders"), files(16))
      .withColumn("o_orderkey", shift("o_orderkey", O))
      .withColumn("o_custkey", shift("o_custkey", C)), "orders")
    if (want("lineitem")) write(scaled(t("lineitem"), files(32))
      .withColumn("l_orderkey", shift("l_orderkey", O))
      .withColumn("l_partkey", shift("l_partkey", P))
      .withColumn("l_suppkey", shift("l_suppkey", S)), "lineitem")
    if (want("events")) write(scaled(t("events"), files(16))
      .withColumn("event_id", shift("event_id", E))
      .withColumn("user_id", shift("user_id", U)), "events")
    // Bijective per-copy token suffix (copy 0 untouched): exact
    // within-copy jaccard, zero cross-copy shingle overlap.
    if (want("documents")) write(scaled(t("documents"), files(8))
      .withColumn("text",
        when(col("copy") === 0, col("text")).otherwise(
          concat_ws(" ", transform(split(col("text"), " "),
            w => concat(w, lit("~"), col("copy"))))))
      .withColumn("doc_id", shift("doc_id", D))
      .withColumn("n_chars", length(col("text"))), "documents")
    if (want("embeddings")) write(scaled(t("embeddings"), files(8))
      .withColumn("vec_id", shift("vec_id", V))
      .withColumn("label",
        (col("label") + col("copy") * L).cast("int")), "embeddings")
  }
}
