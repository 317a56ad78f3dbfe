package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata (builder brief — the pattern a 100 TB image/audio/
  * video pipeline uses; the container has no media codecs, so the decode
  * step is a clearly-marked deterministic stub while the Spark-side
  * plumbing — schema, batching, explode of frames — is real and
  * oracle-checked).
  *
  * Two decode paths, same output (suite-asserted equal):
  *  - [[decodeColumnar]] — DEFAULT: pure codegen'd expressions, used by
  *    the driver-gate queries; payload bytes never deserialize to JVM
  *    objects and prune away entirely when only the length is used;
  *  - [[decodeTyped]] — the CODEC API: `mapPartitions` with one decoder
  *    init per partition, the integration point for a real codec.
  *
  * Scale design: payload bytes never shuffle (metadata only), and frame
  * sampling explodes *after* the narrow decode so the generator runs
  * distributed.
  */
object MultimodalQueries {

  /** Raw media row: payload is an opaque binary column. */
  final case class MediaBlob(doc_id: Long, payload: Array[Byte])

  /** Decoded metadata row produced by the (stubbed) decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
      height: Long, n_frames: Long)

  /** STUB DECODER — deterministic fake standing in for a real image/video
    * codec (none available in this container). Real implementation would
    * parse the container header here; everything around it (typed Dataset,
    * per-partition batching, downstream relational ops) is production
    * shape. Kept a pure function of the payload so the DuckDB oracle can
    * mirror it exactly. */
  private def decodeStub(b: MediaBlob): MediaMeta = {
    val n = b.payload.length.toLong
    MediaMeta(b.doc_id, n, 64L + n % 577L, 64L + (n * 31L) % 577L,
      1L + n % 16L)
  }

  /** Binary payload table derived from documents (utf-8 bytes stand in
    * for media bytes; ascii text ⇒ n_bytes == n_chars, which the oracle
    * uses). */
  private def blobs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))

  /** Columnar decode — the DEFAULT path. The stub metadata is a pure
    * function of `length(payload)`, so it is expressible entirely in
    * codegen'd built-ins: no object deserialization, no typed
    * round-trip, payload bytes pruned at the scan when only the length
    * is needed. A real codec cannot be an expression — that production
    * shape lives in [[decodeTyped]] (same output, suite-asserted). */
  def decodeColumnar(blobs: DataFrame): DataFrame =
    blobs
      .select(col("doc_id"),
        length(col("payload")).cast("long").as("n_bytes"))
      .withColumn("width", lit(64L) + col("n_bytes") % 577L)
      .withColumn("height", lit(64L) + (col("n_bytes") * 31L) % 577L)
      .withColumn("n_frames", lit(1L) + col("n_bytes") % 16L)

  /** Typed per-partition decode — the CODEC API. A real image/audio
    * codec initializes once per partition and maps each blob; this is
    * the integration point for it, demonstrated with [[decodeStub]].
    * Not the default query path: the typed round-trip deserializes
    * every row (DeserializeToObject breaks whole-stage codegen) and
    * drags payload bytes through the executor, which only a real codec
    * justifies. */
  def decodeTyped(s: SparkSession, blobs: DataFrame): DataFrame = {
    import s.implicits._
    blobs.as[MediaBlob]
      .mapPartitions(_.map(decodeStub)) // one decoder per partition/task
      .toDF()
  }

  /** Decode pass: binary column → metadata, columnar default. */
  def qMmDecode(s: SparkSession, dir: String): DataFrame =
    decodeColumnar(blobs(s, dir)).orderBy("doc_id")

  /** Frame sampling: every 4th frame of each decoded payload (generator
    * runs after the narrow decode, fully distributed). */
  def qMmFrames(s: SparkSession, dir: String): DataFrame =
    decodeColumnar(blobs(s, dir))
      .select(col("doc_id"),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))).as("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** Resize planning: the metadata transform of an image resize —
    * target box fit (longest side → 256, aspect preserved, never
    * upscaled) computed entirely columnar on the decoded dims. The
    * pixel work of a real resize happens wherever the codec lives
    * ([[decodeTyped]]'s partition loop); its SHAPE — per-row pure
    * arithmetic on metadata, payload untouched and pruned — is this. */
  def qMmResize(s: SparkSession, dir: String): DataFrame = {
    val longest = greatest(col("width"), col("height"))
    val scale = least(lit(1.0), lit(256.0) / longest)
    decodeColumnar(blobs(s, dir))
      .select(col("doc_id"), col("width"), col("height"),
        floor(col("width") * scale).cast("long").as("out_w"),
        floor(col("height") * scale).cast("long").as("out_h"))
      .orderBy("doc_id")
  }

  /** Extracted feature row: fixed-width scalar features (not an array —
    * the driver oracle compares scalar columns exactly). */
  final case class MediaFeatures(doc_id: Long, f0: Double, f1: Double,
      f2: Double, f3: Double)

  /** Feature extraction through the CODEC API: one "model" per
    * partition (the expensive-init shape a real embedding extractor
    * amortizes — load weights once, map the partition's rows through
    * it), features a deterministic pure function of the payload so the
    * DuckDB oracle mirrors them exactly. A real extractor replaces
    * `model`; the typed Dataset plumbing, batching, and downstream
    * relational ops are the production shape. */
  def featuresTyped(s: SparkSession,
      blobs: DataFrame): org.apache.spark.sql.Dataset[MediaFeatures] = {
    import s.implicits._
    blobs.as[MediaBlob].mapPartitions { it =>
      val model: MediaBlob => MediaFeatures = { b => // per-partition init
        val n = b.payload.length.toLong
        // /1024 (a power of two) is EXACT in binary floating point, so
        // the oracle computes bit-identical doubles — no rounding-mode
        // coupling between engines.
        def f(p: Long): Double = ((n * p) % 997L) / 1024.0
        MediaFeatures(b.doc_id, f(13L), f(31L), f(61L), f(127L))
      }
      it.map(model)
    }
  }

  def qMmFeatures(s: SparkSession, dir: String): DataFrame =
    featuresTyped(s, blobs(s, dir)).toDF().orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_decode" -> (qMmDecode _),
    "q_mm_frames" -> (qMmFrames _),
    "q_mm_resize" -> (qMmResize _),
    "q_mm_features" -> (qMmFeatures _),
  )

  val oracles: Map[String, String] = Map(
    "q_mm_decode" ->
      """SELECT doc_id, n_chars AS n_bytes,
        | 64 + n_chars % 577 AS width,
        | 64 + (n_chars * 31) % 577 AS height,
        | 1 + n_chars % 16 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_mm_frames" ->
      """SELECT doc_id, unnest(range(0, 1 + n_chars % 16, 4)) AS frame_idx
        |FROM documents ORDER BY doc_id, frame_idx""".stripMargin,
    "q_mm_resize" ->
      """WITH d AS (SELECT doc_id, 64 + n_chars % 577 AS width,
        |                  64 + (n_chars * 31) % 577 AS height
        |           FROM documents)
        |SELECT doc_id, width, height,
        | CAST(FLOOR(width * LEAST(1.0, 256.0 / GREATEST(width, height)))
        |      AS BIGINT) AS out_w,
        | CAST(FLOOR(height * LEAST(1.0, 256.0 / GREATEST(width, height)))
        |      AS BIGINT) AS out_h
        |FROM d ORDER BY doc_id""".stripMargin,
    "q_mm_features" ->
      """SELECT doc_id,
        | (n_chars * 13) % 997 / 1024.0 AS f0,
        | (n_chars * 31) % 997 / 1024.0 AS f1,
        | (n_chars * 61) % 997 / 1024.0 AS f2,
        | (n_chars * 127) % 997 / 1024.0 AS f3
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
