package graft.queries

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mpp.MppEngine

/** Driver-gate queries exercising the distributed-table engine end to
  * end: each routes TPC-H testdata THROUGH a distributed table (DDL →
  * hash-shuffle insert → pruned scan / COW DML → SQL on the result) and
  * must hash-match a plain-DuckDB oracle over the original parquet —
  * proving the capability layer neither loses nor duplicates rows.
  *
  * The warehouse (lineitem_d + the DML targets) is built once per
  * (session, scale factor) in [[warm]]; the DML calls are CONVERGENT
  * (each pass performs real COW rewrites, then lands in the same
  * final state — see qMppUpdate/qMppDelete), so repeated invocations —
  * bench warm-up pass, timed pass, Verify — verify the identical
  * state while genuinely timing DML.
  */
object MppQueries {

  private val sharedEnvs = TrieMap.empty[String, MppEngine]

  /** Deep-scale probes set `graft.warm.tables=orders_u,orders_m,…` to
    * build only the warehouse tables the probe touches: at the 500M-row
    * mirror each orders table copy is ~6 GB, and warming all six is a
    * 36 GB disk bill a three-row probe does not need. Empty (default)
    * = build everything the source dir supports. */
  private def warmWanted(s: SparkSession, table: String): Boolean = {
    val only = s.conf.get("graft.warm.tables", "").trim
    only.isEmpty || only.split(',').map(_.trim).contains(table)
  }

  private def sharedEngine(s: SparkSession, dir: String): MppEngine =
    sharedEnvs.getOrElseUpdate(dir, {
      // Persistent warehouse per scale dir: the engine reloads its
      // catalog from disk, so a warehouse built by an earlier JVM (e.g.
      // a previous bench run) is reused as-is — DDL+load happens once
      // per machine, not once per session. Bump the version tag when
      // the on-disk layout changes.
      val wh = "/tmp/graft-wh-v2/" + dir.replaceAll("[^A-Za-z0-9.]", "_")
      val e = new MppEngine(s, wh)
      def ensure(table: String)(build: => Unit): Unit =
        if (warmWanted(s, table) &&
          e.catalog.state.liveTable(table).isEmpty) build
      // Table-subset mirrors (ScaleData's disk-budgeted deep-scale
      // form) may omit source tables; build only the warehouse tables
      // whose sources exist — the q_mpp rows over missing tables then
      // fail naturally if invoked, everything else stays probe-able.
      def has(table: String): Boolean =
        new java.io.File(s"$dir/$table.parquet").exists
      if (has("lineitem")) {
        val li = Tables(s, dir, "lineitem")
        ensure("lineitem_d") {
          e.createDistributedTable("lineitem_d", li.schema.toDDL,
            "l_orderkey", 8)
          e.insertInto("lineitem_d", li)
        }
      }
      // DML targets are pre-built here too, so the timed DML queries
      // never pay DDL + full re-load that their plain-SELECT oracles
      // don't pay either (round-1 verdict: harness comparability). The
      // DML calls are CONVERGENT rather than no-op-idempotent: every
      // invocation performs real rewrites (scratch-and-restore UPDATE
      // pair; sentinel restock + DELETE) and ends in the same
      // oracle-verified state, so bench passes time genuine COW DML
      // (round-4 verdict item 7) while Verify still hash-matches.
      val ord = Tables(s, dir, "orders")
      for (t <- Seq("orders_u", "orders_del", "orders_m", "orders_mf",
          "orders_cdc", "orders_tt", "orders_rs", "orders_rb"))
        ensure(t) {
          e.createDistributedTable(t, ord.schema.toDDL, "o_orderkey", 8)
          e.insertInto(t, ord)
        }
      // OPTIMIZE target: deliberately append-grown (three fragment
      // inserts → three files per bucket), the layout the statement
      // exists to repair.
      ensure("orders_opt") {
        e.createDistributedTable("orders_opt", ord.schema.toDDL,
          "o_orderkey", 8)
        for (m <- 0 until 3)
          e.insertInto("orders_opt",
            ord.filter(pmod(col("o_orderkey"), lit(3)) === m))
      }
      // DDL-dialect DEFAULT resolution exercised once per environment:
      // partial-column INSERT…SELECT fills c_tier/c_note from defaults
      // (reference default resolution, mpp_physical_insert.cpp:150-181).
      if (has("customer")) ensure("cust_d") {
        Tables(s, dir, "customer").createOrReplaceTempView("customer_src")
        e.sql("CREATE TABLE cust_d(c_custkey BIGINT, c_name TEXT, " +
          "c_tier INT DEFAULT 7, c_note TEXT DEFAULT 'none') " +
          "PARTITION BY (c_custkey) WITH BUCKETS 4")
        e.sql("INSERT INTO cust_d (c_custkey, c_name) " +
          "SELECT c_custkey, c_name FROM customer_src")
      }
      e
    })

  /** Pre-build the shared environment (used by Bench so query timings
    * measure steady-state scans and DML, not one-time DDL+load — the
    * DuckDB oracle reads its parquet views without load cost either). */
  def warm(s: SparkSession, dir: String): Unit = { sharedEngine(s, dir); () }

  /** Sentinel key floor for [[qMppDelete]]: strictly above every real
    * orderkey in this scale dir, computed once per dir — TPC-H
    * orderkeys grow ~6e6 × sf, so a fixed constant would collide at
    * large scale factors and the rotating DELETE would silently eat
    * real rows. ×2 headroom (min 1e9) keeps the range disjoint even
    * if the mirror is re-scaled in place later. */
  private val sentinelFloors = TrieMap.empty[String, Long]

  private def sentinelBase(s: SparkSession, dir: String): Long =
    sentinelFloors.getOrElseUpdate(dir, {
      val mx = Tables(s, dir, "orders")
        .agg(max(col("o_orderkey")).cast("long")).head.getLong(0)
      math.max(mx * 2, 1000000000L)
    })

  /** Full distributed scan + aggregate: insert/scan round trip. */
  def qMppScanAgg(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("""SELECT l_returnflag, count(1) AS n,
             round(sum(l_quantity), 4) AS sum_qty
             FROM lineitem_d GROUP BY l_returnflag ORDER BY l_returnflag""")
  }

  /** Pruned point lookup on the partition column (reference S5). */
  def qMppPruneEq(s: SparkSession, dir: String): DataFrame =
    sharedEngine(s, dir).table("lineitem_d")
      .filter(col("l_orderkey") === 1L)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_quantity"), 4).as("l_quantity"))
      .orderBy("l_linenumber")

  /** Pruned IN-list scan (reference S6) + aggregation above the scan. */
  def qMppPruneIn(s: SparkSession, dir: String): DataFrame =
    sharedEngine(s, dir).table("lineitem_d")
      .filter(col("l_orderkey").isin(1L, 7L, 32L, 33L))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n"),
        round(sum("l_extendedprice"), 4).as("sum_price"))
      .orderBy("l_orderkey")

  /** OR-of-equalities pruning (reference S8: prune each disjunct, union
    * the shard sets — mpp_table_scan.cpp:110-123). */
  def qMppPruneOr(s: SparkSession, dir: String): DataFrame =
    sharedEngine(s, dir).table("lineitem_d")
      .filter(col("l_orderkey") === 1L || col("l_orderkey") === 100L ||
        col("l_orderkey").isNull)
      .select(col("l_orderkey"), col("l_linenumber"),
        round(col("l_extendedprice"), 4).as("l_extendedprice"))
      .orderBy("l_orderkey", "l_linenumber")

  /** COW UPDATE through the SQL dialect, then verify via aggregate.
    * EVERY pass performs real data rewrites (round-4 verdict item 7 —
    * steady-state used to time a no-op match-scan): the pair below
    * first sets the matched rows to a scratch value, then back to the
    * oracle value, so both statements defeat the engine's no-op change
    * detection and each pass times TWO full COW rewrites of the
    * matched buckets + the verify aggregate. The call converges to the
    * same final state from anywhere (a crash between the two
    * statements self-heals on the next call), so bench warm-up, timed
    * passes, and Verify all hash-match the identical oracle. Labeled
    * in BASELINE.md; no pass includes DDL/load. */
  def qMppUpdate(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("UPDATE orders_u SET o_totalprice = -1 " +
      "WHERE o_orderkey % 10 = 0")
    e.sql("UPDATE orders_u SET o_totalprice = o_custkey * 1.25 + 0.5 " +
      "WHERE o_orderkey % 10 = 0")
    // Sum scaled to millions before rounding: at ~1e9 magnitude the
    // fp-accumulation-order divergence between engines (~1e-2) exceeds
    // cent precision; in millions it is ~1e-8 and rounds away.
    e.sql("""SELECT o_orderstatus, count(1) AS n,
             round(sum(o_totalprice) / 1000000, 4) AS total_m
             FROM orders_u GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** COW DELETE through the SQL dialect, then verify via aggregate.
    * EVERY pass deletes real rows (round-4 verdict item 7): the call
    * first RESTOCKS 500 sentinel rows under a reserved key range
    * (≥ 1e9, far above any real orderkey), then the timed DELETE
    * removes them along with the idempotent `% 3` clause — a genuine
    * distributed insert + COW rewrite of the sentinel buckets per
    * pass, converging to the sentinel-free oracle state. Sentinels
    * stranded by a crash mid-call are swept by the next call's DELETE
    * before its verify, so the state self-heals. */
  def qMppDelete(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    val base = sentinelBase(s, dir)
    e.insertInto("orders_del", Tables(s, dir, "orders").limit(500)
      .withColumn("o_orderkey", col("o_orderkey") % 1000L + lit(base)))
    e.sql("DELETE FROM orders_del " +
      s"WHERE o_orderkey % 3 = 0 OR o_orderkey >= $base")
    e.sql("""SELECT o_orderstatus, count(1) AS n
             FROM orders_del GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** MERGE INTO through the SQL dialect (capability superset: the
    * reference rejects even CTAS on mpp catalogs; MERGE completes the
    * DSv2/dialect DML story — see MppEngine.merge). EVERY pass does
    * real COW upserts, converging to the oracle state (the
    * qMppUpdate scratch-then-final pattern): merge 1 sets the matched
    * rows (o_orderkey % 50 = 0) to a scratch price; merge 2 sets them
    * to the oracle price AND upserts a sentinel batch (same rows
    * key-shifted above every real key) — inserted on the first pass,
    * re-matched and rewritten on every later one. The final state =
    * orders with the CASE price + the sentinel rows, which the oracle
    * reproduces as one SELECT … UNION ALL. */
  def qMppMerge(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    val base = sentinelBase(s, dir)
    Tables(s, dir, "orders").createOrReplaceTempView("orders_mrg_src")
    val cols = "o_custkey, o_orderstatus, o_orderdate, o_orderpriority"
    e.sql("MERGE INTO orders_m t USING (" +
      s"SELECT o_orderkey, $cols, -1.0 AS o_totalprice " +
      "FROM orders_mrg_src WHERE o_orderkey % 50 = 0) s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET *")
    e.sql("MERGE INTO orders_m t USING (" +
      s"SELECT o_orderkey, $cols, " +
      "o_custkey * 2.0 + 0.25 AS o_totalprice " +
      "FROM orders_mrg_src WHERE o_orderkey % 50 = 0 " +
      "UNION ALL " +
      s"SELECT o_orderkey + $base AS o_orderkey, $cols, " +
      "o_custkey * 2.0 + 0.25 AS o_totalprice " +
      "FROM orders_mrg_src WHERE o_orderkey % 50 = 0) s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")
    e.sql("""SELECT o_orderstatus, count(1) AS n,
             round(sum(o_totalprice) / 1000000, 4) AS total_m
             FROM orders_m GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** Full MERGE clause surface through the dialect (round-8: ordered
    * conditional WHEN clauses, matched DELETE, explicit NOT MATCHED
    * INSERT column list — ANSI first-match-wins over the engine's
    * bucket-local full-outer frame). EVERY pass does real COW work and
    * converges (the qMppDelete restock pattern):
    *
    * 1. restock — insert-only merge re-appends the rows the previous
    *    pass deleted (matched rows untouched, zero write
    *    amplification);
    * 2. full merge — source is the `% 40` slice plus a key-shifted
    *    sentinel copy (status 'Z'): matched 'F' rows DELETE
    *    (conditional first clause), other matched rows take the
    *    conditional UPDATE (cross-side arithmetic), even-custkey
    *    sentinels INSERT through an explicit column list (unlisted
    *    columns fall to defaults/NULL — pinned by n_dates), odd
    *    sentinels fall through no clause and drop.
    *
    * Sentinel rows converge because the INSERT VALUES price equals the
    * UPDATE price: first pass inserts them, later passes re-match and
    * rewrite the same values. The oracle reproduces the fixpoint as a
    * three-way UNION ALL — key-independent aggregates, so the runtime
    * sentinel key shift never appears in the oracle text. */
  def qMppMergeFull(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    val base = sentinelBase(s, dir)
    Tables(s, dir, "orders").createOrReplaceTempView("orders_mrgf_src")
    e.sql("MERGE INTO orders_mf t USING (" +
      "SELECT * FROM orders_mrgf_src WHERE o_orderkey % 40 = 0) s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN NOT MATCHED THEN INSERT *")
    e.sql("MERGE INTO orders_mf t USING (" +
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, " +
      "o_orderdate, o_orderpriority " +
      "FROM orders_mrgf_src WHERE o_orderkey % 40 = 0 " +
      "UNION ALL " +
      s"SELECT o_orderkey + $base AS o_orderkey, o_custkey, " +
      "'Z' AS o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
      "FROM orders_mrgf_src WHERE o_orderkey % 40 = 0) s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED AND s.o_orderstatus = 'F' THEN DELETE " +
      "WHEN MATCHED THEN UPDATE SET " +
      "o_totalprice = s.o_custkey * 3.0 + 0.125 " +
      "WHEN NOT MATCHED AND s.o_orderstatus = 'Z' AND s.o_custkey % 2 = 0 " +
      "THEN INSERT (o_orderkey, o_custkey, o_orderstatus, o_totalprice) " +
      "VALUES (s.o_orderkey, s.o_custkey, s.o_orderstatus, " +
      "s.o_custkey * 3.0 + 0.125)")
    // Merge 3 (round-9): WHEN NOT MATCHED BY SOURCE over the sentinel
    // key set — every real row is unmatched here, so the BY SOURCE
    // chain acts on the whole table (full-bucket COW by ANSI
    // semantics): conditional DELETE permanently removes the non-%40
    // 'F'/custkey%5 slice (idempotent: gone after pass 1, and merge 1
    // only ever re-inserts %40 keys), conditional UPDATE reprices the
    // non-%40 'O'/custkey%3 slice to a custkey-determined value
    // (idempotent by construction). The matched branch re-asserts the
    // sentinel price from TARGET columns — same fixpoint as merge 2's
    // insert, so sentinels converge regardless of clause order.
    e.sql("MERGE INTO orders_mf t USING (" +
      s"SELECT o_orderkey + $base AS o_orderkey " +
      "FROM orders_mrgf_src WHERE o_orderkey % 40 = 0 " +
      "AND o_custkey % 2 = 0) s " +
      "ON t.o_orderkey = s.o_orderkey " +
      "WHEN MATCHED THEN UPDATE SET " +
      "o_totalprice = t.o_custkey * 3.0 + 0.125 " +
      "WHEN NOT MATCHED BY SOURCE AND o_orderkey % 40 <> 0 " +
      "AND o_orderstatus = 'F' AND o_custkey % 5 = 0 THEN DELETE " +
      "WHEN NOT MATCHED BY SOURCE AND o_orderkey % 40 <> 0 " +
      "AND o_orderstatus = 'O' AND o_custkey % 3 = 0 " +
      "THEN UPDATE SET o_totalprice = o_custkey * 5.0 + 0.5")
    e.sql("""SELECT o_orderstatus, count(1) AS n,
             round(sum(o_totalprice) / 1000000, 4) AS total_m,
             count(o_orderdate) AS n_dates
             FROM orders_mf GROUP BY o_orderstatus ORDER BY o_orderstatus""")
  }

  /** Batch replay of the streaming CDC-upsert sink
    * ([[graft.streaming.EventStreams.upsertBatch]], the foreachBatch
    * body of `upsertPipeline`): apply a deterministic two-batch change
    * log to a distributed table and verify the final state — the
    * Lakehouse "MERGE the stream" maintenance pattern, timed over the
    * engine's broadcast low-shuffle merge. EVERY pass applies both
    * batches for real (batch 1 reprices the `% 30` keys, batch 2
    * reprices the `% 60` subset again and upserts a key-shifted
    * sentinel copy), converging to the same oracle state from
    * anywhere. Batch 2 carries each key TWICE with different `seq`
    * (a stale change plus the final one) to exercise the
    * last-writer-wins reduce that makes real CDC feeds mergeable. */
  def qStreamUpsert(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    val base = sentinelBase(s, dir)
    val ord = Tables(s, dir, "orders")
    def change(keyFilter: String, price: org.apache.spark.sql.Column,
        keyShift: Long, seq: Int): DataFrame =
      ord.filter(expr(keyFilter))
        .select((col("o_orderkey") + lit(keyShift)).as("o_orderkey"),
          col("o_custkey"), col("o_orderstatus"),
          price.as("o_totalprice"), col("o_orderdate"),
          col("o_orderpriority"), lit(seq).as("seq"))
    val batch1 = change("o_orderkey % 30 = 0",
      col("o_custkey") * 1.5 + 0.75, 0L, 1)
    val batch2 = change("o_orderkey % 60 = 0", lit(-1.0), 0L, 2)
      .unionAll(change("o_orderkey % 60 = 0",
        col("o_custkey") * 2.5 + 0.5, 0L, 3))
      .unionAll(change("o_orderkey % 60 = 0",
        col("o_custkey") * 2.5 + 0.5, base, 3))
    graft.streaming.EventStreams.upsertBatch(
      e, "orders_cdc", "o_orderkey", "seq", batch1)
    graft.streaming.EventStreams.upsertBatch(
      e, "orders_cdc", "o_orderkey", "seq", batch2)
    e.sql("""SELECT o_orderstatus, count(1) AS n,
             round(sum(o_totalprice) / 1000000, 4) AS total_m
             FROM orders_cdc GROUP BY o_orderstatus
             ORDER BY o_orderstatus""")
  }

  /** DDL dialect with DEFAULT columns + partial-column INSERT…SELECT
    * (reference default resolution, mpp_physical_insert.cpp:150-181).
    * The create+insert runs once in [[warm]]; the query verifies the
    * default-filled result — comparable to its plain-SELECT oracle. */
  def qMppDefaults(s: SparkSession, dir: String): DataFrame =
    sharedEngine(s, dir).table("cust_d").orderBy("c_custkey")

  /** `ALTER TABLE … REBUCKET` — the online bucket-count change
    * (capability superset; the reference fixes shard count at
    * creation, create_distributed_table.cpp:134-140). Convergent-DML
    * idiom: each invocation genuinely re-hashes the whole table into
    * the OTHER layout (8 ⇄ 12), so bench times a real full COW
    * reshuffle while the row set — and therefore the oracle hash —
    * never changes. */
  def qMppRebucket(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    val k = e.catalog.state.liveTable("orders_rb").get.buckets
    e.sql(s"ALTER TABLE orders_rb REBUCKET ${if (k == 8) 12 else 8}")
    e.table("orders_rb")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000000, 4).as("total_m"))
      .orderBy("o_orderstatus")
  }

  /** OPTIMIZE through the dialect, then verify by aggregate: every
    * pass re-clusters each bucket by o_custkey (SORT BY forces the
    * rewrite — real staging write + atomic swap per pass, the
    * convergent-DML idiom), so the timed cost is genuine compaction
    * and the result must still match the plain-parquet oracle row for
    * row. The warm()-built table is append-grown (3 fragment inserts →
    * 3 files/bucket) until the first pass compacts it. */
  def qMppOptimize(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("OPTIMIZE orders_opt SORT BY (o_custkey)")
    e.table("orders_opt")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000000, 4).as("total_m"))
      .orderBy("o_orderstatus")
  }

  /** Time travel (`VERSION AS OF` over the versioned catalog — the
    * Lakehouse audit/reproducibility read; round-10 verdict stretch
    * #8). EVERY pass performs real history: statement A rewrites the
    * %11 keys to a scratch price and the pass captures that commit's
    * version; statement B rewrites them to the oracle price. The
    * result joins the AS-OF-A read (reconstructed from archived files
    * — statement B has already rewritten those buckets) against the
    * CURRENT read, so the row hash-verifies BOTH that history is
    * exact and that it differs from the present in exactly the
    * expected way. Convergent like every DML row: all passes land in
    * the same two states. */
  def qMppTimeTravel(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("UPDATE orders_tt SET o_totalprice = -7 " +
      "WHERE o_orderkey % 11 = 0")
    val vA = e.catalog.currentVersionOnDisk
    e.sql("UPDATE orders_tt SET o_totalprice = o_custkey * 2.5 + 0.25 " +
      "WHERE o_orderkey % 11 = 0")
    val past = e.tableAsOf("orders_tt", vA)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000000, 4).as("total_m_past"))
    val cur = e.table("orders_tt")
      .groupBy(col("o_orderstatus").as("st"))
      .agg(round(sum("o_totalprice") / 1000000, 4).as("total_m_cur"))
    past.join(cur, past("o_orderstatus") === cur("st"))
      .select(col("o_orderstatus"), col("n"), col("total_m_past"),
        col("total_m_cur"))
      .orderBy("o_orderstatus")
  }

  /** Row-level change feed between two versions (`tableChanges` —
    * the incremental-consumption primitive over the same manifests
    * time travel reads). Convergent like every DML row: statement A
    * rewrites the %11 keys to a scratch price and captures vA,
    * statement B rewrites them to the oracle price and captures vB;
    * the feed between the two is then exactly the %11 retract/add
    * pairs — file-granularity carried rows must cancel, so the row
    * hash-verifies the diff kernel itself, not just the endpoints. */
  def qTableChanges(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("UPDATE orders_tt SET o_totalprice = -3 " +
      "WHERE o_orderkey % 11 = 0")
    val vA = e.catalog.currentVersionOnDisk
    e.sql("UPDATE orders_tt SET o_totalprice = o_custkey * 2.5 + 0.25 " +
      "WHERE o_orderkey % 11 = 0")
    val vB = e.catalog.currentVersionOnDisk
    e.tableChanges("orders_tt", vA, vB)
      .select(col("_change_type").as("change_type"), col("o_orderstatus"),
        col("o_totalprice"))
      .groupBy("change_type", "o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000, 4).as("total_k"))
      .orderBy("change_type", "o_orderstatus")
  }

  /** Schema evolution (ALTER TABLE ADD/DROP COLUMN — metadata-only,
    * Postgres attmissingval semantics). Each pass rebuilds the table
    * and replays the lifecycle: create → load → ADD COLUMN DEFAULT
    * (old rows must read the frozen default WITHOUT any rewrite) →
    * second load carrying the column explicitly → DROP COLUMN. The
    * final aggregate distinguishes fill-sourced from stored values,
    * so the row hash-verifies the exist-default read path itself. */
  def qSchemaEvolution(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    if (e.catalog.state.liveTable("supp_evo").isDefined)
      e.dropTable("supp_evo")
    val sup = Tables(s, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    e.createDistributedTable("supp_evo", sup.schema.toDDL, "s_suppkey", 4)
    e.insertInto("supp_evo", sup)
    e.sql("ALTER TABLE supp_evo ADD COLUMN tier INT DEFAULT 3")
    e.insertInto("supp_evo", sup
      .withColumn("s_suppkey", col("s_suppkey") + 1000000)
      .withColumn("tier", pmod(col("s_nationkey"), lit(5)).cast("int")))
    e.sql("ALTER TABLE supp_evo DROP COLUMN s_name")
    e.table("supp_evo")
      .groupBy("tier")
      .agg(count(lit(1)).as("n"), round(sum("s_acctbal"), 2).as("bal"))
      .orderBy("tier")
  }

  /** Multi-dimensional clustering (`OPTIMIZE … ZORDER BY`): every pass
    * re-clusters orders_opt on the interleaved (o_custkey,
    * o_totalprice) rank key — a real staged rewrite + atomic swap, the
    * same convergent-DML idiom as q_mpp_optimize — and the verifying
    * aggregate pins that clustering is a LAYOUT property: the row set
    * must still hash-match the plain-parquet oracle exactly. */
  def qMppZorder(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("OPTIMIZE orders_opt ZORDER BY (o_custkey, o_totalprice)")
    e.table("orders_opt")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000000, 4).as("total_m"))
      .orderBy("o_orderpriority")
  }

  /** Streaming CDC READ + table replication ([[graft.streaming.
    * CdcRead]]): each pass rebuilds a source table, mutates it
    * (update + delete + second load), then replicates it into a
    * fresh replica through a REAL `readStream` over the change feed —
    * version offsets, one AvailableNow micro-batch, MERGE apply with
    * delete propagation. The verified aggregate reads the REPLICA, so
    * the row hash-checks the entire read→apply loop. Per-pass DROP +
    * CREATE gives a new table oid, which makes `startingVersion=
    * earliest` provably a full bootstrap (no prior-generation
    * manifests can alias it). */
  def qStreamReplica(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    for (t <- Seq("rep_src", "rep_dst"))
      if (e.catalog.state.liveTable(t).isDefined) e.dropTable(t)
    val sup = Tables(s, dir, "supplier")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    e.createDistributedTable("rep_src", sup.schema.toDDL, "s_suppkey", 4)
    e.createDistributedTable("rep_dst", sup.schema.toDDL, "s_suppkey", 2)
    e.insertInto("rep_src", sup)
    e.sql("UPDATE rep_src SET s_acctbal = -1 WHERE s_suppkey % 7 = 0")
    e.sql("DELETE FROM rep_src WHERE s_suppkey % 11 = 0")
    e.insertInto("rep_src", sup
      .withColumn("s_suppkey", col("s_suppkey") + 1000000)
      .withColumn("s_acctbal", col("s_nationkey").cast("double")))
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft-replica-ckpt").toString
    val q = graft.streaming.CdcRead.replicaPipeline(s, e.warehouse,
      "rep_src", e, "rep_dst", "s_suppkey", ckpt,
      org.apache.spark.sql.streaming.Trigger.AvailableNow())
    if (!q.awaitTermination(180000)) {
      q.stop() // don't leave it racing the next pass's DROP
      throw new IllegalStateException(
        "q_stream_replica: replication did not drain in 180 s")
    }
    e.table("rep_dst")
      .groupBy(col("s_nationkey").as("nk"))
      .agg(count(lit(1)).as("n"),
        round(sum("s_acctbal"), 2).as("bal"))
      .orderBy("nk")
  }

  /** RESTORE TABLE … TO VERSION AS OF (rename-only state rollback —
    * the time-travel triad's undo leg). Each pass performs real
    * history: statement A rewrites the %13 keys to the oracle price
    * and captures v1; statement B wrecks them; the RESTORE renames
    * v1's files back live. The verifying aggregate reads the RESTORED
    * table, so the row hash-checks the rollback itself. The only keys
    * this row ever mutates are the %13 set and every pass ends at the
    * restored oracle state — convergent like the rest of the DML
    * family. */
  def qMppRestore(s: SparkSession, dir: String): DataFrame = {
    val e = sharedEngine(s, dir)
    e.sql("UPDATE orders_rs SET o_totalprice = o_custkey * 3.5 + 0.125 " +
      "WHERE o_orderkey % 13 = 0")
    val v1 = e.catalog.currentVersionOnDisk
    e.sql("UPDATE orders_rs SET o_totalprice = -9 " +
      "WHERE o_orderkey % 13 = 0")
    e.sql(s"RESTORE TABLE orders_rs TO VERSION AS OF $v1")
    e.table("orders_rs")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum("o_totalprice") / 1000000, 4).as("total_m"))
      .orderBy("o_orderstatus")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_time_travel" -> (qMppTimeTravel _),
    "q_stream_replica" -> (qStreamReplica _),
    "q_mpp_restore" -> (qMppRestore _),
    "q_table_changes" -> (qTableChanges _),
    "q_schema_evolution" -> (qSchemaEvolution _),
    "q_mpp_zorder" -> (qMppZorder _),
    "q_mpp_scan_agg" -> (qMppScanAgg _),
    "q_mpp_prune_eq" -> (qMppPruneEq _),
    "q_mpp_prune_in" -> (qMppPruneIn _),
    "q_mpp_prune_or" -> (qMppPruneOr _),
    "q_mpp_update" -> (qMppUpdate _),
    "q_mpp_delete" -> (qMppDelete _),
    "q_mpp_merge" -> (qMppMerge _),
    "q_mpp_merge_full" -> (qMppMergeFull _),
    "q_mpp_defaults" -> (qMppDefaults _),
    "q_mpp_optimize" -> (qMppOptimize _),
    "q_mpp_rebucket" -> (qMppRebucket _),
    "q_stream_upsert" -> (qStreamUpsert _),
  )

  val oracles: Map[String, String] = Map(
    "q_time_travel" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(CASE WHEN o_orderkey % 11 = 0 THEN -7.0
        |               ELSE o_totalprice END) / 1000000, 4)
        |   AS total_m_past,
        | ROUND(SUM(CASE WHEN o_orderkey % 11 = 0
        |               THEN o_custkey * 2.5 + 0.25
        |               ELSE o_totalprice END) / 1000000, 4)
        |   AS total_m_cur
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_table_changes" ->
      """SELECT 'delete' AS change_type, o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(-3.0) / 1000, 4) AS total_k
        |FROM orders WHERE o_orderkey % 11 = 0 GROUP BY o_orderstatus
        |UNION ALL
        |SELECT 'insert' AS change_type, o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(o_custkey * 2.5 + 0.25) / 1000, 4) AS total_k
        |FROM orders WHERE o_orderkey % 11 = 0 GROUP BY o_orderstatus
        |ORDER BY change_type, o_orderstatus""".stripMargin,
    "q_schema_evolution" ->
      """SELECT tier, COUNT(1) AS n, ROUND(SUM(s_acctbal), 2) AS bal
        |FROM (
        |  SELECT 3 AS tier, s_acctbal FROM supplier
        |  UNION ALL
        |  SELECT CAST(s_nationkey % 5 AS INT) AS tier, s_acctbal
        |  FROM supplier
        |) GROUP BY tier ORDER BY tier""".stripMargin,
    "q_stream_replica" ->
      """SELECT s_nationkey AS nk, COUNT(1) AS n, ROUND(SUM(bal), 2) AS bal
        |FROM (
        |  SELECT s_nationkey,
        |         CASE WHEN s_suppkey % 7 = 0 THEN -1.0
        |              ELSE s_acctbal END AS bal
        |  FROM supplier WHERE s_suppkey % 11 <> 0
        |  UNION ALL
        |  SELECT s_nationkey, CAST(s_nationkey AS DOUBLE) FROM supplier
        |) GROUP BY s_nationkey ORDER BY nk""".stripMargin,
    "q_mpp_scan_agg" ->
      """SELECT l_returnflag, COUNT(1) AS n, ROUND(SUM(l_quantity), 4) AS sum_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q_mpp_prune_eq" ->
      """SELECT l_orderkey, l_linenumber, ROUND(l_quantity, 4) AS l_quantity
        |FROM lineitem WHERE l_orderkey = 1 ORDER BY l_linenumber""".stripMargin,
    "q_mpp_prune_in" ->
      """SELECT l_orderkey, COUNT(1) AS n,
        | ROUND(SUM(l_extendedprice), 4) AS sum_price
        |FROM lineitem WHERE l_orderkey IN (1, 7, 32, 33)
        |GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin,
    "q_mpp_prune_or" ->
      """SELECT l_orderkey, l_linenumber,
        | ROUND(l_extendedprice, 4) AS l_extendedprice
        |FROM lineitem
        |WHERE l_orderkey = 1 OR l_orderkey = 100 OR l_orderkey IS NULL
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q_mpp_update" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(CASE WHEN o_orderkey % 10 = 0
        |               THEN o_custkey * 1.25 + 0.5
        |               ELSE o_totalprice END) / 1000000, 4) AS total_m
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_delete" ->
      """SELECT o_orderstatus, COUNT(1) AS n
        |FROM orders WHERE o_orderkey % 3 <> 0
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_merge" ->
      """WITH f AS (
        |  SELECT o_orderstatus,
        |         CASE WHEN o_orderkey % 50 = 0
        |              THEN o_custkey * 2.0 + 0.25
        |              ELSE o_totalprice END AS p
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_custkey * 2.0 + 0.25 AS p
        |  FROM orders WHERE o_orderkey % 50 = 0)
        |SELECT o_orderstatus, COUNT(1) AS n,
        |       ROUND(SUM(p) / 1000000, 4) AS total_m
        |FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_merge_full" ->
      """WITH f AS (
        |  SELECT o_orderstatus,
        |         CASE WHEN o_orderstatus = 'O' AND o_custkey % 3 = 0
        |              THEN o_custkey * 5.0 + 0.5
        |              ELSE o_totalprice END AS p,
        |         o_orderdate AS d
        |  FROM orders WHERE o_orderkey % 40 <> 0
        |    AND NOT (o_orderstatus = 'F' AND o_custkey % 5 = 0)
        |  UNION ALL
        |  SELECT o_orderstatus, o_custkey * 3.0 + 0.125 AS p, o_orderdate AS d
        |  FROM orders WHERE o_orderkey % 40 = 0 AND o_orderstatus <> 'F'
        |  UNION ALL
        |  SELECT 'Z' AS o_orderstatus, o_custkey * 3.0 + 0.125 AS p,
        |         NULL AS d
        |  FROM orders WHERE o_orderkey % 40 = 0 AND o_custkey % 2 = 0)
        |SELECT o_orderstatus, COUNT(1) AS n,
        |       ROUND(SUM(p) / 1000000, 4) AS total_m,
        |       COUNT(d) AS n_dates
        |FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_defaults" ->
      """SELECT c_custkey, c_name, 7 AS c_tier, 'none' AS c_note
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q_mpp_optimize" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(o_totalprice) / 1000000, 4) AS total_m
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_rebucket" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(o_totalprice) / 1000000, 4) AS total_m
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_restore" ->
      """SELECT o_orderstatus, COUNT(1) AS n,
        | ROUND(SUM(CASE WHEN o_orderkey % 13 = 0
        |               THEN o_custkey * 3.5 + 0.125
        |               ELSE o_totalprice END) / 1000000, 4) AS total_m
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    "q_mpp_zorder" ->
      """SELECT o_orderpriority, COUNT(1) AS n,
        | ROUND(SUM(o_totalprice) / 1000000, 4) AS total_m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    // Final CDC state: %60 keys carry batch-2's winning price, the
    // remaining %30 keys batch-1's, everything else is untouched; the
    // sentinel upserts reproduce as a key-independent UNION ALL (same
    // idiom as q_mpp_merge).
    "q_stream_upsert" ->
      """WITH f AS (
        |  SELECT o_orderstatus,
        |         CASE WHEN o_orderkey % 60 = 0
        |              THEN o_custkey * 2.5 + 0.5
        |              WHEN o_orderkey % 30 = 0
        |              THEN o_custkey * 1.5 + 0.75
        |              ELSE o_totalprice END AS p
        |  FROM orders
        |  UNION ALL
        |  SELECT o_orderstatus, o_custkey * 2.5 + 0.5 AS p
        |  FROM orders WHERE o_orderkey % 60 = 0)
        |SELECT o_orderstatus, COUNT(1) AS n,
        |       ROUND(SUM(p) / 1000000, 4) AS total_m
        |FROM f GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
  )
}
