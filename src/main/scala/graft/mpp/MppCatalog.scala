package graft.mpp

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned metadata catalog for distributed tables.
  *
  * Spark-native port of the reference's system-table layer + transaction
  * manager (`/root/reference/src/storage/mpp_system_table.cpp:18-92`,
  * `mpp_transaction_manager.cpp:18-50`): metadata commits are atomic on
  * the coordinator (here: snapshot file + CURRENT pointer rename), data
  * writes are not transactional — exactly the reference's guarantee
  * (README.md:115, no 2PC).
  *
  * Persistence layout under `<warehouse>/_mpp_catalog/`:
  * {{{
  *   v00001.json   // full snapshot per version (driver-side JSON write —
  *                 // metadata is O(tables × buckets) rows; a commit must
  *                 // NOT cost Spark jobs, DDL/DML latency rides on it)
  *   CURRENT       // text file: committed version (atomic rename)
  * }}}
  * The system tables are still served as DataFrames
  * (`nodesDf/shardsDf/tablesDf`) — from the in-memory snapshot, same
  * shape as Delta/Iceberg version pointers.
  */
final class MppCatalog(spark: SparkSession, val warehouse: String) {

  private val catalogDir = s"$warehouse/_mpp_catalog"
  private val currentFile = Paths.get(s"$catalogDir/CURRENT")

  @volatile private var committed: CatalogState = load()
  @volatile private var staged: Option[CatalogState] = None
  @volatile private var version: Long = committedVersion()

  def state: CatalogState = staged.getOrElse(committed)

  // --- transaction surface (metadata-only rollback, like the reference:
  // /root/reference/test/sql/mpp_transaction.test:15-26) -----------------

  def begin(): Unit = synchronized {
    require(staged.isEmpty, "transaction already in progress")
    staged = Some(committed)
  }

  def commit(): Unit = synchronized {
    staged.foreach(persist)
    staged = None
  }

  def rollback(): Unit = synchronized { staged = None }

  /** Apply a metadata mutation: staged inside a transaction, otherwise
    * auto-committed. */
  private[mpp] def mutate(f: CatalogState => CatalogState): Unit =
    synchronized {
      staged match {
        case Some(s) => staged = Some(f(s))
        case None => persist(f(committed))
      }
    }

  // --- persistence ------------------------------------------------------

  private def committedVersion(): Long =
    if (Files.exists(currentFile))
      new String(Files.readAllBytes(currentFile), StandardCharsets.UTF_8)
        .trim.toLong
    else 0L

  private def snapFile(v: Long): String = f"$catalogDir/v$v%05d.json"

  import MppCatalog.mapper

  private def persist(s: CatalogState): Unit = {
    val v = version + 1
    // Write the full snapshot, then publish with an atomic pointer swap —
    // a reader either sees the old or the new committed version.
    Files.createDirectories(Paths.get(catalogDir))
    Files.write(Paths.get(snapFile(v)),
      mapper.writeValueAsBytes(s))
    val tmp = Paths.get(s"$catalogDir/CURRENT.tmp")
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    committed = s
    version = v
    // Bounded snapshot history (round-2 verdict item 8): readers only
    // ever follow CURRENT; keep the last N full snapshots and sweep
    // everything older. Sweeps by directory listing, not by counting
    // down from v, so holes in the version sequence (out-of-band
    // deletes, a second engine's stale counter) cannot strand a
    // backlog behind the first missing file.
    val SnapRe = "v(\\d+)\\.json".r
    val dir = Paths.get(catalogDir)
    if (Files.isDirectory(dir)) {
      val stream = Files.list(dir)
      try {
        stream.iterator().forEachRemaining { f =>
          f.getFileName.toString match {
            case SnapRe(n)
                if n.toLong <= v - MppCatalog.RetainSnapshots =>
              Files.deleteIfExists(f)
            case _ =>
          }
        }
      } finally stream.close()
    }
  }

  private def load(): CatalogState = {
    val v = committedVersion()
    if (v == 0L) CatalogState()
    else mapper.readValue(Files.readAllBytes(Paths.get(snapFile(v))),
      classOf[CatalogState])
  }

  // --- system-table DataFrames (surface parity with __mpp_system.*) -----

  def nodesDf: DataFrame = {
    import spark.implicits._
    state.nodes.toDF("host", "port")
  }

  def shardsDf: DataFrame = {
    import spark.implicits._
    state.shards.toDF("table_oid", "shard_id", "node")
  }

  def tablesDf: DataFrame = {
    import spark.implicits._
    state.tables.map(t => (t.tableOid, t.name, t.partitionColumnIndex,
        t.buckets, t.deleted))
      .toDF("table_oid", "name", "partition_column_index", "buckets",
        "deleted")
  }
}

object MppCatalog {
  /** Snapshots retained per warehouse (latest always wins via CURRENT). */
  val RetainSnapshots = 20

  /** Jackson (bundled with Spark) with the Scala module: case-class
    * round-trip without any Spark job on the commit path. */
  private[mpp] val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.registerModule(
      com.fasterxml.jackson.module.scala.DefaultScalaModule)
    m
  }
}
