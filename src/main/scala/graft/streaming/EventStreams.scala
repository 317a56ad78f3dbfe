package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators over the events stream.
  *
  * The reference is purely batch (SURVEY.md §1.1: no streaming surface);
  * this module is the forward-looking stream layer the builder brief
  * requires, built on the engine's native streaming machinery:
  * `readStream → transforms → writeStream`, event-time watermarks with
  * windowed aggregation, and `flatMapGroupsWithState` sessionization.
  *
  * Scale design: all operators are keyed by high-cardinality columns
  * (`user_id`, `event_id`) so state partitions evenly across a 1000-
  * executor cluster; watermarks bound state size (expired windows /
  * sessions / dedup keys are dropped by the state store, never grow
  * unboundedly — the non-negotiable property for a 100 TB/day stream).
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  /** Internal per-user session accumulator (public: the state encoder's
    * generated code must be able to call its accessors). */
  final case class SessionState(start: Long, end: Long, n: Long,
      total: Double)

  /** File-source entry point: tail a directory of event parquet files as
    * a stream (schema fixed up front — streaming sources don't infer). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, " +
        "event_type STRING, value DOUBLE")
      .parquet(dir)

  /** Tumbling-window aggregate with a watermark: counts + value sums per
    * (hour, event_type); late events beyond 30min are dropped and window
    * state is reclaimed. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  /** Exactly-once-style streaming dedup on event_id, state bounded by
    * the watermark (the streaming twin of DedupQueries.qDedupExact). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[dedupStream]] — Spark rejects
    * `dropDuplicatesWithinWatermark` on batch relations outright, so
    * (unlike [[attribute]], which replays as-is) the replay twin is
    * plain key dedup: on any replay whose duplicates arrive within the
    * watermark, the streaming operator emits exactly one row per
    * event_id, which is this relation. The driver-gate `q_dedup_stream`
    * oracles it against DuckDB over duplicate-injected events; a suite
    * test pins batch ≡ streaming emissions on the same input. */
  def dedupStreamBatch(events: DataFrame): DataFrame =
    events.dropDuplicates("event_id")

  private val SessionGapMs: Long = 30 * 60 * 1000L

  /** Gap-based sessionization via flatMapGroupsWithState: a session per
    * user closes after 30 minutes of event-time silence (state expiry
    * driven by the event-time watermark, so output is deterministic
    * w.r.t. the data, not wall-clock). */
  def sessionize(events: Dataset[Event]): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(updateSession)
  }

  /** Batch twin of [[sessionize]] — identical 30-minute-gap semantics
    * expressed as gaps-and-islands over event time (lag → new-session
    * flag → running island id → per-island aggregate). Used by the
    * driver-gate `q_sessionize`, whose DuckDB oracle runs the same
    * formulation; a suite test pins batch ≡ streaming emissions.
    *
    * @param ev (user_id, ts, value) — a batch DataFrame. */
  def sessionizeBatch(ev: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts")
    ev.select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) >
            SessionGapMs * 1000L, 1L).otherwise(0L))
      .withColumn("sid", sum("new_s").over(w.rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum("value"), 4).as("total_value"))
      .select("user_id", "session_start", "session_end", "n_events",
        "total_value")
  }

  private def updateSession(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // Watermark passed the session gap: close and emit.
      val s = state.get
      state.remove()
      Iterator(Session(userId, new Timestamp(s.start), new Timestamp(s.end),
        s.n, s.total))
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var cur = state.getOption
      val closed = Vector.newBuilder[Session]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.end <= SessionGapMs =>
            cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1,
              s.total + e.value))
          case Some(s) => // gap exceeded within the batch: close inline
            closed += Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total)
            cur = Some(SessionState(t, t, 1, e.value))
          case None =>
            cur = Some(SessionState(t, t, 1, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.end + SessionGapMs)
      }
      closed.result().iterator
    }
  }

  /** Stream-static enrichment join: events (stream) ⋈ a static dimension
    * (e.g. a user/label table). The static side is re-read per
    * micro-batch by Spark and — being small — broadcast, so the stream
    * side never shuffles: the canonical shape for joining a 100 TB/day
    * stream against reference data. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left_outer")

  /** Stream-stream interval join: attribute each purchase to the user's
    * clicks in the preceding attribution window. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * Spark can expire buffered state from both sides — the only shape
    * in which a stream-stream join has bounded memory at 100 TB/day. */
  def attribute(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes"): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", window)
      .select(col("user_id"), col("ts").as("click_ts"))
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", window)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("amount"))
    c.join(p,
      c("user_id") === p("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("amount"))
  }

  /** LEFT-OUTER stream-stream interval join: [[attribute]] plus the
    * rows it drops — purchases with NO qualifying click (organic
    * conversions, the rows a marketing-spend report is actually
    * about). In streaming, the NULL-extended row for an unmatched
    * purchase can only be emitted once the CLICK side's watermark has
    * passed the end of its candidate window (a qualifying click can
    * arrive any time before that); Spark holds the purchase in the
    * join state store until then and emits exactly one row either
    * way. Same bounded-state argument as [[attribute]]: both sides
    * are watermarked and the condition bounds event-time distance, so
    * buffered state expires — outer-ness changes emission timing, not
    * state size. */
  def attributeOuter(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes"): DataFrame = {
    val c = clicks.filter(col("event_type") === "click")
      .withWatermark("ts", window)
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"))
    val p = purchases.filter(col("event_type") === "purchase")
      .withWatermark("ts", window)
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("value").as("amount"))
    p.join(c,
      col("user_id") === col("c_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window"),
      "left_outer")
      .select(col("user_id"), col("click_ts"), col("purchase_ts"),
        col("amount"))
  }

  /** Per-window heavy hitters over the stream ("top talkers" — the
    * rate-limit / abuse-detection shape): for each tumbling window, the
    * [[graft.functions.FreqSketch]] Misra-Gries candidates over
    * `user_id`, truncated to the top `k` estimates. The sketch is a
    * TypedImperativeAggregate, so streaming aggregation state per
    * window is ONE bounded `capacity`-entry buffer — not the
    * full per-user count map an exact `groupBy(window, user_id)` would
    * keep — and the watermark reclaims it when the window closes.
    * Estimates undercount by at most windowRows/(capacity+1) (exact
    * whenever distinct users per window ≤ capacity); downstream
    * consumers needing exactness recount the emitted candidates, the
    * batch [[graft.functions.FreqSketch.topKExact]] protocol. */
  def topTalkers(events: DataFrame, window: String = "1 hour",
      k: Int = 10, capacity: Int = 256): DataFrame = {
    val spark = events.sparkSession
    events
      .withWatermark("ts", "30 minutes")
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window))
      .agg(graft.functions.FreqSketch
        .sketch(spark, col("user_id").cast("string"), capacity).as("s"))
      .select(col("window.start").as("window_start"),
        slice(col("s"), 1, k).as("top_talkers"))
  }

  /** Streaming corpus ingestion with incremental dedup — the streaming
    * twin of [[graft.queries.DedupQueries.qDedupIncremental]]'s exact
    * stage, the shape of a continuously-ingesting corpus builder:
    * arriving documents are deduped within the stream (fingerprint
    * state bounded by the watermark) and against the STATIC
    * already-ingested corpus fingerprint index. The index join is
    * expressed as stream-static left_outer + IS NULL filter — the
    * supported Structured Streaming form of an anti join (stream-static
    * left_anti is not in Spark's support matrix). At scale the index is
    * a bucketed fingerprint table re-read per micro-batch; only the
    * 16-byte keys join, never document bodies.
    *
    * @param docs stream of (doc_id, text, ingest_ts)
    * @param corpusFps static index with a single `fp` column (md5). */
  def ingestDedup(docs: DataFrame, corpusFps: DataFrame): DataFrame =
    docs
      .withColumn("fp", md5(col("text")))
      .withWatermark("ingest_ts", "30 minutes")
      .dropDuplicatesWithinWatermark("fp")
      .join(corpusFps.select(col("fp"), lit(true).as("__in_corpus")),
        Seq("fp"), "left_outer")
      .filter(col("__in_corpus").isNull)
      .drop("__in_corpus", "fp")

  /** Batch twin of [[ingestDedup]] (same caveat as
    * [[dedupStreamBatch]]: `dropDuplicatesWithinWatermark` is
    * stream-only, so the replay twin dedups per key): within-batch
    * fingerprint dedup keeping the minimum doc_id, then the anti join
    * against the corpus index. */
  def ingestDedupBatch(docs: DataFrame, corpusFps: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    docs.withColumn("fp", md5(col("text")))
      .withColumn("mn", min("doc_id").over(w))
      .filter(col("doc_id") === col("mn")).drop("mn")
      .join(corpusFps.select("fp"), Seq("fp"), "left_anti")
      .drop("fp")
  }

  /** MAINTAINED ingest step over the warehouse fingerprint index
    * ([[graft.sources.FpIndex]] under `graft.fpindex.dir` — round-6
    * verdict "what's missing #4"): dedups `docs` within-batch and
    * against the named index, APPENDS the survivors' fingerprints to
    * the index (one bucketed parquet append, no rewrite — the index
    * only grows), and returns the surviving documents. Sequential
    * batches therefore dedup against everything previously ingested
    * with zero recomputation: the corpus text is never re-read, only
    * its 16-byte keys. The streaming twin runs this exact function
    * from `foreachBatch` (re-creating the index relation each
    * micro-batch, so appends from earlier batches are visible —
    * a plan-pinned static side would snapshot the file listing). */
  def ingestBatch(spark: org.apache.spark.sql.SparkSession,
      indexName: String, docs: DataFrame,
      writeSink: DataFrame => Unit = _ => ()): DataFrame = {
    val root = graft.sources.FpIndex.root(spark).getOrElse(
      throw new IllegalStateException(
        s"ingestBatch requires ${graft.sources.FpIndex.DirConf} to be set"))
    val index = graft.sources.FpIndex.read(spark, root, indexName)
      .getOrElse(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](),
        graft.sources.FpIndex.schema))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("fp")
    val survivors = docs.withColumn("fp", md5(col("text")))
      .withColumn("mn", min("doc_id").over(w))
      .filter(col("doc_id") === col("mn")).drop("mn")
      .join(index, Seq("fp"), "left_anti")
      .localCheckpoint() // pin: the append below must not re-observe a grown index
    // ORDER MATTERS for replay safety (round-7 ADVICE): the document
    // sink commits BEFORE the index learns the fingerprints. A failure
    // between the two replays the batch with the fps still absent, so
    // the documents are re-written (duplicates, dedupable by batch) —
    // the reverse order would anti-join the replayed docs against
    // their own fps and lose them from the sink permanently.
    writeSink(survivors.drop("fp"))
    graft.sources.FpIndex.append(spark, root, indexName,
      survivors.select("fp"))
    survivors.drop("fp")
  }

  /** End-to-end wiring: stream → sessionize → parquet sink. Returns the
    * started query (caller stops it); checkpointing makes the pipeline
    * restartable — the production shape of the operator. */
  def sessionPipeline(spark: SparkSession, inDir: String, outDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    sessionize(readEventStream(spark, inDir).as[Event])
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .format("parquet")
      .option("path", outDir)
      .start()
  }

  /** Streaming corpus ingestion over the MAINTAINED fingerprint index:
    * `foreachBatch` runs [[ingestBatch]] per micro-batch — the index
    * relation is re-created inside each batch, so fingerprints
    * appended by batch N are visible to batch N+1 (the pinned static
    * side of a plain stream-static join would snapshot the file
    * listing at query start and miss them). Survivors commit to the
    * document sink FIRST, then their fingerprints append to the index
    * (see [[ingestBatch]] — a failure between the two re-writes
    * documents on replay rather than losing them; sink duplicates are
    * dedupable by batch, sink losses are unrecoverable). Duplicate
    * index fingerprints from replayed appends are semantically
    * harmless (the index is an anti-join set) and bounded in storage
    * by the periodic [[graft.sources.FpIndex.maybeCompact]] sweep
    * every [[CompactEveryBatches]] micro-batches.
    *
    * @param docs streaming (doc_id, text, …) relation. */
  val CompactEveryBatches = 16

  def ingestPipeline(spark: SparkSession, docs: DataFrame,
      indexName: String, outDir: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(spark, indexName, batch,
          out => out.write.mode("append").parquet(outDir))
        if (batchId % CompactEveryBatches == CompactEveryBatches - 1)
          graft.sources.FpIndex.root(spark).foreach(r =>
            graft.sources.FpIndex.maybeCompact(spark, r, indexName))
        ()
      }
      .start()

  /** CDC apply: reduce a change batch to its LATEST row per key
    * (last-writer-wins on `seqCol` — the LSN/offset every CDC feed
    * carries; `(key, seq)` pairs are assumed unique per the standard
    * CDC contract, with an xxhash64 tiebreak so even a violated
    * contract stays deterministic), then MERGE it into the
    * distributed table: matched keys take the change row (`SET *`),
    * new keys insert. The foreachBatch body of [[upsertPipeline]] and
    * the unit its driver-gate batch replay (`q_stream_upsert`) times.
    *
    * Scale shape: a micro-batch is small by construction, so the merge
    * rides [[graft.mpp.MppEngine.merge]]'s broadcast low-shuffle path —
    * per batch, one narrow COW pass over the key-affected buckets and
    * one column-pruned key scan; the table never shuffles. Re-applying
    * a batch (foreachBatch is at-least-once) re-merges the same rows
    * to the same values — convergent, which is the replay-safety story
    * for this sink. Returns the merged row count. */
  def upsertBatch(e: graft.mpp.MppEngine, table: String, keyCol: String,
      seqCol: String, batch: DataFrame): Long = {
    val others = batch.columns.filterNot(c =>
      c.equalsIgnoreCase(seqCol) || c.equalsIgnoreCase(keyCol))
    val tiebreak =
      if (others.isEmpty) lit(0L) else xxhash64(others.map(col): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol))
      .orderBy(col(seqCol).desc, tiebreak.desc)
    // When the TARGET itself declares the sequence column, carry it
    // through so matched rows take the feed's LSN and inserts store it
    // (dropping it would leave matched rows with their stale stored
    // sequence and inserts with the declared default — the table's own
    // ordering column silently diverging from the feed). A feed-only
    // sequence column is dropped as before.
    val tgtCols = e.tableColumns(table)
    val keepSeq = tgtCols.exists(_.equalsIgnoreCase(seqCol))
    // Eager checkpoint: the merge consumes its source several times
    // (cardinality stats, the broadcast join, the insert-side key
    // semi/anti) — a micro-batch is bounded by definition, so pin the
    // reduced rows once instead of re-running the window per consumer.
    val latest0 = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val latest = (if (keepSeq) latest0 else latest0.drop(seqCol))
      .localCheckpoint()
    // Partial-column feeds UPDATE only the columns they carry (an
    // explicit SET list, not SET * — which would align absent columns
    // to their declared defaults and silently clobber them on matched
    // rows); inserts take defaults for the rest, the partial-INSERT
    // semantics.
    val sets = latest.columns
      .filter(c => !c.equalsIgnoreCase(keyCol) &&
        tgtCols.exists(_.equalsIgnoreCase(c)))
      .map(c => c -> s"__src_$c").toSeq
    e.merge(table, latest,
      Seq(graft.mpp.MergeWhenMatched.Update(None, sets)),
      Seq(graft.mpp.MergeWhenNotMatched(None, None)))
  }

  /** Continuous CDC upsert into a distributed table: each micro-batch
    * of change rows is [[upsertBatch]]-applied — the Lakehouse
    * "MERGE the stream" maintenance pattern, here against the engine's
    * COW tables. Checkpointing makes it restartable; replayed batches
    * converge (see [[upsertBatch]]). */
  def upsertPipeline(e: graft.mpp.MppEngine, table: String,
      keyCol: String, seqCol: String, updates: DataFrame,
      checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(e, table, keyCol, seqCol, batch)
        ()
      }
      .start()
}
