package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Similarity search over the `embeddings` table: brute-force cosine top-k
  * (exact baseline) and an IVF-style partitioned variant (the scale path).
  *
  * Scale design (100 TB): the query set is broadcast (it is small by
  * definition), the corpus is never shuffled — each corpus partition scores
  * its rows against the broadcast queries, and only (q, id, score) tuples
  * ever move, reduced by the per-query top-k window. The IVF variant
  * additionally prunes the corpus to `nprobe` cells, turning a full scan
  * into a cell-local scan — the standard recall/latency trade.
  */
object SimilarityQueries {

  import graft.functions.VectorFunctions.{dot, norm}

  /** Corpus with the L2 norm precomputed once per row — every downstream
    * pair then costs a single codegen'd dot product. */
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(s, col("v")))

  private val TopK = 5
  private val NumQueries = 10

  /** Exact brute-force cosine top-k for query vectors vec_id < 10. */
  def qAnnBruteforce(s: SparkSession, dir: String): DataFrame = {
    val corpus = emb(s, dir)
    val queries = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dot(s, col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("q_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  /** IVF-style approximate top-k: corpus is partitioned into cells (here
    * the `label` column stands in for trained k-means cells); each query
    * probes only the `nprobe` cells whose centroids are nearest.
    *
    * Approximate ⇒ rows-only driver check; the ScalaTest suite measures
    * recall against [[qAnnBruteforce]].
    */
  def qAnnIvf(s: SparkSession, dir: String, nprobe: Int = 2): DataFrame = {
    val corpus = emb(s, dir)
    // Centroid per cell: element-wise mean via posexplode → re-assemble
    // (scales: |cells| × dim rows, independent of corpus size after the
    // partial aggregation).
    val centroids = corpus
      .select(col("label"), posexplode(col("v")).as(Seq("pos", "x")))
      .groupBy("label", "pos").agg(avg("x").as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("pm"))
      .select(col("label").as("cell"),
        expr("transform(pm, p -> p.m)").as("cv"))
    val queries = corpus.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("q_id"), col("v").as("qv"),
        col("nrm").as("qnrm"))
    // Pick nprobe nearest cells per query (tiny: |queries| × |cells|).
    val wCell = Window.partitionBy("q_id")
      .orderBy(col("cdist").desc, col("cell"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("cdist", DedupQueries.cosine(s, col("qv"), col("cv")))
      .withColumn("crnk", row_number().over(wCell))
      .filter(col("crnk") <= nprobe)
      .select(col("q_id"), col("qv"), col("qnrm"), col("cell"))
    // Scan only the probed cells.
    val w = Window.partitionBy("q_id")
      .orderBy(col("cos").desc, col("neighbor_id"))
    corpus.join(broadcast(probes), col("label") === col("cell"))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("cos",
        dot(s, col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("cos"))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= TopK)
      .select(col("q_id"), col("neighbor_id"),
        round(col("cos"), 4).as("cos_sim"), col("rnk"))
      .orderBy("q_id", "rnk")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> (qAnnBruteforce _),
    "q_ann_ivf" -> ((s: SparkSession, d: String) => qAnnIvf(s, d)),
  )

  val oracles: Map[String, String] = Map(
    "q_ann_bruteforce" ->
      """SELECT q_id, neighbor_id, ROUND(cos, 4) AS cos_sim, rnk
        |FROM (
        |  SELECT q_id, neighbor_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY q_id
        |                            ORDER BY cos DESC, neighbor_id) AS rnk
        |  FROM (
        |    SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id,
        |           list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                  CAST(b.embedding AS DOUBLE[])) AS cos
        |    FROM embeddings a JOIN embeddings b ON b.vec_id != a.vec_id
        |    WHERE a.vec_id < 10) p) r
        |WHERE rnk <= 5
        |ORDER BY q_id, rnk""".stripMargin,
  )
}
