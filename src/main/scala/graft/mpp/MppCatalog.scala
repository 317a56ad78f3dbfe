package graft.mpp

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Versioned metadata catalog for distributed tables.
  *
  * Spark-native port of the reference's system-table layer + transaction
  * manager (`/root/reference/src/storage/mpp_system_table.cpp:18-92`,
  * `mpp_transaction_manager.cpp:18-50`): metadata commits are atomic on
  * the coordinator (here: snapshot dir + CURRENT pointer rename), data
  * writes are not transactional — exactly the reference's guarantee
  * (README.md:115, no 2PC).
  *
  * Persistence layout under `<warehouse>/_mpp_catalog/`:
  * {{{
  *   v00001/{nodes,tables,shards}/  (parquet)  // snapshot per version
  *   CURRENT                                  // text file: committed version
  * }}}
  * Snapshots are parquet written by Spark itself — the system tables ARE
  * DataFrames, so `nodes()/shards()/tables()` queries read the committed
  * snapshot with zero extra machinery. At 100 TB the metadata is still
  * tiny (O(tables × buckets) rows); a single-file snapshot per version is
  * the right design (same shape as Delta/Iceberg version pointers).
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

  private def snapDir(v: Long): String = f"$catalogDir/v$v%05d"

  private def persist(s: CatalogState): Unit = {
    import spark.implicits._
    val v = version + 1
    val dir = snapDir(v)
    // Write the full snapshot, then publish with an atomic pointer swap —
    // a reader either sees the old or the new committed version.
    s.nodes.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/nodes")
    s.tables.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/tables")
    s.shards.toDF().coalesce(1).write.mode("overwrite").parquet(s"$dir/shards")
    s.schemas.toDF("name").coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/schemas")
    val tmp = Paths.get(s"$catalogDir/CURRENT.tmp")
    Files.createDirectories(tmp.getParent)
    Files.write(tmp, v.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, currentFile, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    committed = s
    version = v
  }

  private def load(): CatalogState = {
    import spark.implicits._
    val v = committedVersion()
    if (v == 0L) CatalogState()
    else {
      val dir = snapDir(v)
      CatalogState(
        spark.read.parquet(s"$dir/nodes").as[NodeInfo].collect().toVector,
        spark.read.parquet(s"$dir/tables").as[TableInfo].collect().toVector,
        spark.read.parquet(s"$dir/shards").as[ShardInfo].collect().toVector,
        if (Files.exists(Paths.get(s"$dir/schemas")))
          spark.read.parquet(s"$dir/schemas").as[String].collect().toVector
        else Vector("main"))
    }
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
