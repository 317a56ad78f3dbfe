package graft.streaming

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.mpp.MppEngine

/** Streaming READ side of the engine's CDC story (the write side is
  * [[EventStreams.upsertPipeline]]): `spark.readStream` over a
  * distributed table's change feed. Offsets are CATALOG VERSIONS —
  * each micro-batch is `tableChanges(table, lastVersion, current)`,
  * the net retract/add rows of the interval, so a downstream pipeline
  * consumes exactly what changed and never rescans the corpus. The
  * complete loop (readStream → transform → upsert into another table)
  * is incremental materialized-view maintenance over 100 TB tables.
  *
  * ```scala
  * spark.readStream
  *   .format("graft.streaming.CdcSourceProvider")
  *   .option("warehouse", wh).option("table", "docs")
  *   .load()                        // table columns + _change_type
  * ```
  *
  * Options: `startingVersion` = version number (first batch = changes
  * since it; a version predating manifest-keeping bootstraps the full
  * state as inserts, the Delta-CDF "from 0" contract) | `earliest`
  * (= 0) | default `latest` (consume only changes after stream start).
  *
  * Retention contract: offsets older than the catalog's snapshot
  * window (20) cannot be diffed — a stream stalled past retention
  * fails with the tableChanges retention error rather than silently
  * skipping changes (Delta CDF couples to vacuum the same way).
  * Schema evolution mid-stream fails the run (restart picks up the
  * new schema), matching the declared sourceSchema contract. */
class CdcSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-cdc"

  private def changesSchema(wh: String, table: String,
      spark: SparkSession): StructType = {
    val e = new MppEngine(spark, wh)
    val t = e.catalog.state.liveTable(table).getOrElse(
      throw new IllegalArgumentException(s"no distributed table '$table'"))
    StructType(StructType.fromDDL(t.schemaDdl).fields :+
      StructField("_change_type", StringType, nullable = false))
  }

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), changesSchema(param(parameters, "warehouse"),
      param(parameters, "table"), sqlContext.sparkSession))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source =
    new CdcSource(sqlContext.sparkSession,
      param(parameters, "warehouse"), param(parameters, "table"),
      parameters.get("startingVersion").map {
        case "earliest" => CdcSource.Earliest
        case "latest" => -1L
        case n => n.toLong
      }.filter(_ != -1L),
      metadataPath)

  private def param(parameters: Map[String, String], key: String): String =
    parameters.getOrElse(key, throw new IllegalArgumentException(
      s"graft-cdc source requires option '$key'"))
}

class CdcSource(spark: SparkSession, warehouse: String, table: String,
    startingVersion: Option[Long], metadataPath: String = "")
    extends Source
    with org.apache.spark.sql.connector.read.streaming
      .SupportsTriggerAvailableNow {

  private val engine = new MppEngine(spark, warehouse)

  /** True when the checkpoint's offset log is AHEAD of its commit log
    * at source construction: the run's first `getBatch` will then be
    * an uncommitted-batch REPLAY that MicroBatchExecution EXECUTES
    * (crash recovery) — not the discarded committed-batch
    * re-initialization — so it must keep the scratch-bounded
    * multi-pass diff. Read once from the checkpoint logs
    * (`metadataPath` = <checkpoint>/sources/<i>), which is the only
    * deterministic way to tell the two restart shapes apart; a
    * heuristic on call order alone would disable the scratch bound on
    * exactly the replayed heavy batch after a mid-batch crash. */
  private val replayPending: Boolean =
    try {
      if (metadataPath.isEmpty) false
      else {
        val srcDir = new org.apache.hadoop.fs.Path(metadataPath)
        val ckptRoot = srcDir.getParent.getParent
        val fs = ckptRoot.getFileSystem(
          spark.sessionState.newHadoopConf())
        def maxBatch(name: String): Long = {
          val d = new org.apache.hadoop.fs.Path(ckptRoot, name)
          if (!fs.exists(d)) -1L
          else fs.listStatus(d).iterator
            .map(_.getPath.getName)
            .filter(_.forall(_.isDigit))
            .map(_.toLong).foldLeft(-1L)(math.max)
        }
        maxBatch("offsets") > maxBatch("commits")
      }
    } catch { case _: Exception => true } // unknown → keep the bound

  /** `Trigger.AvailableNow`: freeze the cutoff version at run start so
    * the run drains exactly what existed then and stops — commits that
    * land mid-run belong to the next invocation (the FileStreamSource
    * contract). */
  @volatile private var frozenVersion: Option[Long] = None

  /** True once this run has polled offsets. MicroBatchExecution's
    * restart recovery calls `getBatch` for the LAST COMMITTED batch
    * (to let sources restore state) BEFORE the first offset poll, and
    * never executes the returned frame — so a getBatch arriving
    * before any poll is the recovery call and gets the LAZY diff
    * variant (`boundScratch = false`): the eager multi-pass
    * materialization would re-pay the whole interval's diff on every
    * restart for a frame that is thrown away. If a Spark version ever
    * reorders the calls, the fallback is benign both ways: a lazy
    * frame is row-identical (only the scratch bound is lost for that
    * one batch), an eager one merely costs time. */
  @volatile private var offsetPolled = false

  override def prepareForTriggerAvailableNow(): Unit =
    frozenVersion = Some(engine.catalog.currentVersionOnDisk)

  private def latestVersion: Long =
    frozenVersion.getOrElse(engine.catalog.currentVersionOnDisk)

  override def getDefaultReadLimit
      : org.apache.spark.sql.connector.read.streaming.ReadLimit =
    org.apache.spark.sql.connector.read.streaming.ReadLimit.allAvailable()

  override def latestOffset(
      start: org.apache.spark.sql.connector.read.streaming.Offset,
      limit: org.apache.spark.sql.connector.read.streaming.ReadLimit)
      : org.apache.spark.sql.connector.read.streaming.Offset = {
    offsetPolled = true
    LongOffset(latestVersion)
  }

  override def reportLatestOffset()
      : org.apache.spark.sql.connector.read.streaming.Offset =
    LongOffset(latestVersion)

  override val schema: StructType = {
    val t = engine.catalog.state.liveTable(table).getOrElse(
      throw new IllegalArgumentException(s"no distributed table '$table'"))
    StructType(StructType.fromDDL(t.schemaDdl).fields :+
      StructField("_change_type", StringType, nullable = false))
  }

  /** Latest committed catalog version; the stream advances whenever
    * any statement commits (version monotonicity is the CAS commit
    * protocol's invariant). A version bump that did not touch THIS
    * table yields an empty diff — correct and cheap (same manifest
    * ref on both sides, zero files read). */
  override def getOffset: Option[Offset] = {
    offsetPolled = true
    Some(LongOffset(latestVersion))
  }

  private def version(o: Offset): Long = o match {
    case l: LongOffset => l.offset
    case s: SerializedOffset => LongOffset(s).offset
    case other => other.json().toLong
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val endV = version(end)
    // Committed-batch re-initialization (frame discarded): the only
    // getBatch that may drop the scratch bound. An uncommitted-batch
    // replay also arrives before the first offset poll but WILL be
    // executed — replayPending tells them apart from the checkpoint
    // logs.
    val recovery = !offsetPolled && !replayPending
    val batch = start.map(version).orElse(startingVersion) match {
      case Some(CdcSource.Earliest) =>
        // TRUE bootstrap (r11 advisor, medium): `earliest` means "from
        // nothing", not "from the oldest retained version" — once a
        // table's creation ages out of the snapshot window the oldest
        // retained manifest already HOLDS data, and diffing from it
        // would silently omit every row unchanged since (a partial
        // replica with no error). The net feed from empty to endV is
        // exactly endV's full state as inserts — and it is a pure
        // snapshot SCAN, never a diff exchange: at 100 TB the replica
        // bootstrap costs one table read, same as the one-sided
        // fast path inside tableChanges.
        engine.tableAsOf(table, endV)
          .withColumn("_change_type", lit("insert"))
      case Some(fromV) =>
        engine.tableChanges(table, fromV, endV, boundScratch = !recovery)
      case None => // `latest`: begin at stream start, empty first batch
        engine.tableChanges(table, endV, endV)
    }
    // V1 contract: micro-batch plans must carry isStreaming=true.
    GraftSqlBridge.streamingBatch(spark, batch)
  }

  override def stop(): Unit = ()
}

object CdcSource {
  /** Sentinel for `startingVersion=earliest` (resolved at batch time). */
  private[streaming] val Earliest = -2L
}

object CdcRead {

  /** `readStream` over a distributed table's change feed — sugar for
    * the format/options incantation. */
  def changeStream(spark: SparkSession, warehouse: String, table: String,
      startingVersion: Option[String] = None): DataFrame = {
    val r = spark.readStream
      .format(classOf[CdcSourceProvider].getName)
      .option("warehouse", warehouse)
      .option("table", table)
    startingVersion.fold(r)(v => r.option("startingVersion", v)).load()
  }

  /** Apply one change-feed micro-batch to a replica table: inserts
    * (including the add half of updates) upsert by `keyCol`, keys
    * whose NET effect in the batch is a pure delete are deleted — one
    * MERGE statement, through the same broadcast low-shuffle path as
    * the CDC write side. The feed's retract/add encoding makes this
    * idempotent per interval: replaying an interval converges to the
    * same replica state. */
  def applyChangeBatch(e: MppEngine, replica: String, keyCol: String,
      batch: DataFrame): Unit = {
    val cols = e.tableColumns(replica)
    // Net per key: an insert row wins (upsert); a delete row with no
    // insert for the same key is a true deletion. The DataFrame merge
    // API (not SQL views) — foreachBatch hands a CLONED session whose
    // temp views the engine's session could not see.
    val ins = batch.filter(col("_change_type") === "insert")
    val dels = batch.filter(col("_change_type") === "delete")
      .select(col(keyCol)).distinct()
      .join(ins.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
      .withColumn("__op", lit("d"))
    val src = ins.select(cols.map(col) :+ lit("u").as("__op"): _*)
      .unionByName(dels.select(
        cols.map(c => if (c == keyCol) col(c) else lit(null).as(c)) :+
          col("__op"): _*))
    val sets = cols.filterNot(_.equalsIgnoreCase(keyCol))
      .map(c => c -> s"__src_$c")
    e.merge(replica, src,
      matched = Seq(
        graft.mpp.MergeWhenMatched.Delete(Some("__src___op = 'd'")),
        graft.mpp.MergeWhenMatched.Update(None, sets)),
      notMatched = Seq(graft.mpp.MergeWhenNotMatched(
        Some("__src___op <> 'd'"),
        Some(cols.map(c => c -> s"__src_$c")))))
    ()
  }

  /** End-to-end table replication: stream the source table's change
    * feed and MERGE every micro-batch into `replica` (typically in
    * another warehouse). Caller manages the returned query's
    * lifecycle; use `Trigger.AvailableNow` for catch-up-and-stop. */
  def replicaPipeline(spark: SparkSession, sourceWarehouse: String,
      sourceTable: String, dst: MppEngine, replica: String,
      keyCol: String, checkpoint: String,
      trigger: org.apache.spark.sql.streaming.Trigger,
      startingVersion: Option[String] = Some("earliest"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    changeStream(spark, sourceWarehouse, sourceTable, startingVersion)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyChangeBatch(dst, replica, keyCol, batch)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
      .start()
}
