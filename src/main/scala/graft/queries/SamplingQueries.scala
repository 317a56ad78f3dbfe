package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Dataset-assembly sampling operators for the training-data pipeline:
  * reproducible split assignment and per-source quota capping — the
  * two selection steps every corpus build runs between dedup and
  * tokenization (data-mixing recipes à la Gopher/LLaMA re-weight
  * sources by capping or repeating them; split assignment must be a
  * pure function of the key so reshards/reruns never migrate a
  * document across train/val/test).
  *
  * Scale design: both operators are single-pass. The split is a
  * branch-free arithmetic expression (whole-stage codegen, no UDF, no
  * shuffle at all — the assignment travels with the row). The quota
  * cap is one window over `source` — the partition count equals the
  * source count, so the shuffle is by the low-cardinality mixing key;
  * a pathologically hot source degrades to one task, which is exactly
  * the [[graft.operators.Skew]] salting case and documented as such.
  */
object SamplingQueries {

  /** Knuth multiplicative (Fibonacci) hash bucket in [0, 100): the
    * classic `(key * 2654435761) mod 2^32` spreader (TAOCP vol. 3
    * §6.4), computed in exact BIGINT arithmetic so Spark and any
    * ANSI-SQL oracle produce bit-identical buckets — the property that
    * makes the split auditable from outside the engine. (A keyed
    * cryptographic hash is the adversarial-input variant; the
    * arithmetic form is the portable, codegen-friendly default.) */
  private def hashBucket(key: org.apache.spark.sql.Column) =
    pmod(pmod(key * lit(2654435761L), lit(4294967296L)), lit(100L))

  /** Reproducible train/val/test split (80/10/10) as a pure function
    * of doc_id: stable under resharding, appends, and reruns — no RNG
    * state, no sampling seed to lose. */
  def qHashSplit(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val").otherwise("test"))
      .select("doc_id", "bucket", "split")
      .orderBy("doc_id")

  /** Per-source quota cap: keep the 10 longest documents per source
    * (n_chars DESC, doc_id tie-break — fully deterministic), the
    * cap-per-source-contribution step of a data-mixing recipe. */
  def qQuotaSample(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy(col("n_chars").desc, col("doc_id"))
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 10)
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rn").cast("long").as("rn"))
      .orderBy("source", "rn")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hash_split" -> (qHashSplit _),
    "q_quota_sample" -> (qQuotaSample _),
  )

  val oracles: Map[String, String] = Map(
    "q_hash_split" ->
      """SELECT doc_id,
        |       (doc_id * 2654435761) % 4294967296 % 100 AS bucket,
        |       CASE WHEN (doc_id * 2654435761) % 4294967296 % 100 < 80
        |              THEN 'train'
        |            WHEN (doc_id * 2654435761) % 4294967296 % 100 < 90
        |              THEN 'val'
        |            ELSE 'test' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_quota_sample" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY n_chars DESC, doc_id) AS rn
        |           FROM documents)
        |SELECT doc_id, source, n_chars, rn FROM r
        |WHERE rn <= 10 ORDER BY source, rn""".stripMargin,
  )
}
