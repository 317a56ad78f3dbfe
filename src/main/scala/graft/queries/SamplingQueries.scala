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
    * arithmetic form is the portable, codegen-friendly default.)
    *
    * Overflow-safe for the full BIGINT key range: a naive
    * `key * 2654435761` exceeds 2^63 once key ≳ 3.47e9 — Spark wraps
    * silently while an ANSI oracle raises, breaking the bit-identity
    * claim exactly at production id ranges. Since
    * `(key*C) mod 2^32 = ((key mod 2^32)*C) mod 2^32`, we first reduce
    * the key mod 2^32 and then split the multiply into 16-bit halves
    * (only the low 16 bits of the high half's product survive the
    * final mod), keeping every intermediate < 2^49 — exact in signed
    * 64-bit on both engines, no wrap anywhere. */
  private[graft] def hashBucket(key: org.apache.spark.sql.Column) = {
    val c = lit(2654435761L)
    val k = pmod(key, lit(4294967296L))
    val kHi = shiftright(k, 16) // k in [0, 2^32) so this is k DIV 2^16
    val kLo = k.bitwiseAND(lit(65535L))
    val mix = pmod(pmod(kHi * c, lit(65536L)) * lit(65536L) + kLo * c,
      lit(4294967296L))
    pmod(mix, lit(100L))
  }

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

  /** Concatenate-and-chunk sequence packing — the step that turns a
    * document corpus into fixed-length training sequences: documents are
    * concatenated in a deterministic order and cut into 512-token
    * windows, and each document is mapped to the range of sequence ids
    * it lands in (a doc spanning a cut boundary contributes to both
    * neighbors — the standard pretraining packing, no padding waste).
    *
    * Scale design: packing is PER SOURCE, not global — the running
    * token-offset window partitions by the mixing key, exactly how a
    * sharded pipeline packs each shard independently, so there is no
    * single-partition global cumsum (the thing that would serialize at
    * 100 TB; a pathologically hot source is again the documented
    * [[graft.operators.Skew]] case). Token counts come from the fused
    * [[graft.functions.TokenStats]] byte kernel; the offsets are one
    * running-sum window over (source, doc_id) and the sequence-id
    * arithmetic is branch-free integer division — everything downstream
    * of the scan stays in whole-stage codegen. */
  def qPackChunks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source").orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenStats(s, col("text"))
          .getField("n_tokens").cast("long").as("n_tokens"))
      .withColumn("cum0", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        expr("cum0 DIV 512").as("start_seq"),
        expr("(cum0 + n_tokens - 1) DIV 512").as("end_seq"))
      .withColumn("n_seqs", col("end_seq") - col("start_seq") + lit(1L))
      .orderBy("doc_id")
  }

  /** Temperature-based data mixing (the multilingual/multi-source
    * rebalancing idiom — Conneau & Lample 2019 §3.1, the Pile's
    * per-set epochs): per-source sampling rates that soften the
    * natural source distribution toward uniform at temperature T = 2
    * (weight ∝ √share), against a token budget of half the corpus.
    * The keep decision is the [[hashBucket]] arithmetic hash against
    * the source's percent-quantized rate — reproducible under
    * resharding/reruns like q_hash_split, auditable from outside the
    * engine, and a 1%-granularity honest quota (documented, not
    * hidden in FP noise).
    *
    * Scale shape: token counts from the fused [[graft.functions
    * .TokenStats]] kernel; per-source totals are a tiny aggregate
    * whose rate table broadcasts back over the corpus scan; the keep
    * filter and the final per-source roll-up are one map-side-combined
    * aggregate — two corpus passes, no wide exchange at any size. */
  def qDataMix(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenStats(s, col("text"))
          .getField("n_tokens").cast("long").as("toks"))
    val perSrc = perDoc.groupBy("source")
      .agg(sum("toks").as("t"), count(lit(1)).as("n_docs"))
    val tot = perSrc.agg(sum("t").as("g"), sum(sqrt(col("t"))).as("sw"))
    val rates = perSrc.crossJoin(broadcast(tot))
      .withColumn("weight", round(sqrt(col("t")) / col("sw"), 4))
      .withColumn("pct", least(lit(100L),
        floor(lit(100.0) * (col("g") / 2) * sqrt(col("t")) /
          col("sw") / col("t")).cast("long")))
      .select("source", "t", "n_docs", "weight", "pct")
    perDoc.join(broadcast(rates), "source")
      .withColumn("keep", hashBucket(col("doc_id")) < col("pct"))
      .groupBy("source")
      .agg(max("t").as("total_tokens"), max("n_docs").as("n_docs"),
        max("weight").as("weight"), max("pct").as("pct"),
        sum(when(col("keep"), 1L).otherwise(0L)).as("kept_docs"),
        sum(when(col("keep"), col("toks")).otherwise(0L)).as("kept_tokens"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_hash_split" -> (qHashSplit _),
    "q_quota_sample" -> (qQuotaSample _),
    "q_pack_chunks" -> (qPackChunks _),
    "q_data_mix" -> (qDataMix _),
  )

  val oracles: Map[String, String] = Map(
    "q_hash_split" ->
      """WITH k AS (SELECT doc_id, doc_id % 4294967296 AS kk FROM documents),
        |b AS (SELECT doc_id,
        |        ((kk // 65536 * 2654435761) % 65536 * 65536
        |          + kk % 65536 * 2654435761) % 4294967296 % 100 AS bucket
        |      FROM k)
        |SELECT doc_id, bucket,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    "q_quota_sample" ->
      """WITH r AS (SELECT doc_id, source, n_chars,
        |             ROW_NUMBER() OVER (PARTITION BY source
        |               ORDER BY n_chars DESC, doc_id) AS rn
        |           FROM documents)
        |SELECT doc_id, source, n_chars, rn FROM r
        |WHERE rn <= 10 ORDER BY source, rn""".stripMargin,
    "q_pack_chunks" ->
      """WITH t AS (SELECT doc_id, source,
        |             len(string_split(text, ' ')) AS n FROM documents),
        |c AS (SELECT doc_id, source, n,
        |        CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cum0
        |      FROM t)
        |SELECT doc_id, source, CAST(n AS BIGINT) AS n_tokens,
        |  cum0 // 512 AS start_seq,
        |  (cum0 + n - 1) // 512 AS end_seq,
        |  (cum0 + n - 1) // 512 - cum0 // 512 + 1 AS n_seqs
        |FROM c ORDER BY doc_id""".stripMargin,
    "q_data_mix" ->
      """WITH d AS (SELECT doc_id, source,
        |             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
        |           FROM documents),
        |s AS (SELECT source, CAST(SUM(toks) AS BIGINT) AS t,
        |        COUNT(*) AS n_docs FROM d GROUP BY source),
        |g AS (SELECT CAST(SUM(t) AS BIGINT) AS g,
        |        CAST(SUM(sqrt(t)) AS DOUBLE) AS sw FROM s),
        |r AS (SELECT source, t, n_docs,
        |        ROUND(sqrt(t) / sw, 4) AS weight,
        |        LEAST(100, CAST(FLOOR(100.0 * (g / 2) * sqrt(t)
        |          / sw / t) AS BIGINT)) AS pct
        |      FROM s CROSS JOIN g),
        |k AS (SELECT d.doc_id, d.source, d.toks, r.pct,
        |        ((doc_id % 4294967296 // 65536 * 2654435761) % 65536 * 65536
        |          + doc_id % 4294967296 % 65536 * 2654435761)
        |          % 4294967296 % 100 AS bucket
        |      FROM d JOIN r USING (source))
        |SELECT r.source, r.t AS total_tokens, r.n_docs, r.weight, r.pct,
        |  CAST(SUM(CASE WHEN k.bucket < k.pct THEN 1 ELSE 0 END)
        |    AS BIGINT) AS kept_docs,
        |  CAST(SUM(CASE WHEN k.bucket < k.pct THEN k.toks ELSE 0 END)
        |    AS BIGINT) AS kept_tokens
        |FROM k JOIN r USING (source)
        |GROUP BY r.source, r.t, r.n_docs, r.weight, r.pct
        |ORDER BY r.source""".stripMargin,
  )
}
