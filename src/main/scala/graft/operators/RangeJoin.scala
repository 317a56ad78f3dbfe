package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Distributed range (interval) join — the second alignment operator the
  * builder brief names alongside [[AsofJoin]] (neither the reference nor
  * stock Spark has a shuffle-hash path for it).
  *
  * Stock Spark plans `points JOIN intervals ON p BETWEEN lo AND hi` as a
  * BroadcastNestedLoopJoin (small side) or CartesianProduct (neither
  * broadcastable) — O(|L|·|R|) comparisons, the canonical 100 TB cliff.
  * DuckDB special-cases the shape with IEJoin; Spark has no equivalent,
  * so we rewrite it into an EQUI-join the whole engine already scales:
  *
  * bin the domain into fixed-width cells; an interval `[lo, hi]` is
  * replicated into every cell it touches (`sequence(⌊lo/w⌋, ⌊hi/w⌋)` +
  * explode), a point lands in exactly ONE cell, and the join becomes
  * `point_bin = interval_bin [AND keys]` + the exact residual predicate.
  * Shuffle is hash-partitioned on the bin (plus keys), so the work
  * spreads over the cluster like any hash join, AQE sees an ordinary
  * Exchange, and a hot time range degrades like any skewed key
  * (mitigate with [[Skew]] if one cell dominates).
  *
  * Exactness: a point is in exactly one cell, and each interval appears
  * at most once per cell, so inner matches are emitted exactly once —
  * no distinct pass. For interval×interval overlap, a pair can share
  * several cells; [[intervalOverlap]] keeps the match only in the FIRST
  * shared cell (`bin == max(⌊lo_l/w⌋, ⌊lo_r/w⌋)`), which both sides
  * cover by construction — still no distinct pass.
  *
  * Cost model for `binWidth`: replication factor is
  * `1 + len(interval)/w`, probe fan-in per cell is `points-per-w`.
  * Pick w near the MEDIAN interval length: shorter floods the build
  * side with copies, longer piles unrelated points into each cell and
  * pushes work into the residual filter. Both failure modes are linear,
  * not quadratic — the operator degrades gracefully in either
  * direction.
  */
object RangeJoin {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Inner range join: rows of `points` paired with every row of
    * `intervals` whose `[lo, hi]` contains the point (both bounds
    * inclusive), optionally also matching on equality `keys`.
    *
    * `point`, `lo`, `hi` must be integral (LongType-castable) columns —
    * callers bring dates/timestamps via `unix_date`/`unix_timestamp`
    * first, choosing the granularity the bins count in.
    *
    * NULL semantics follow the SQL comparison rule: a NULL point, a
    * NULL bound, or an empty interval (`lo > hi`) never matches, and
    * such rows are dropped before the explode (an inverted interval
    * would otherwise make `sequence` throw).
    *
    * `maxBinsPerInterval` is the OOM guard: a mis-sized `binWidth`
    * (seconds-wide cells against year-long intervals) would otherwise
    * silently build multi-million-element replication arrays per row
    * and kill executors; instead the job fails fast with a codegen'd
    * `raise_error` naming the fix (same enforcement idiom as the
    * engine's NOT NULL guard). Zero cost on the sane path.
    *
    * Output: all columns of `points` then all non-duplicate columns of
    * `intervals` (equality keys appear once). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String, binWidth: Long,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireNoBinColumn(points, intervals)
    val w = lit(binWidth)
    val l = points
      .filter(col(point).isNotNull && keys.map(col(_).isNotNull)
        .foldLeft(lit(true))(_ && _))
      .withColumn("__bin", floorDiv(col(point), w))
    val r = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull &&
        col(lo) <= col(hi) && keys.map(col(_).isNotNull)
        .foldLeft(lit(true))(_ && _))
      .withColumn("__bin", explode(
        bins(col(lo), col(hi), w, maxBinsPerInterval)))
    // Strategy pinned to shuffle-hash: the planner's size estimate for
    // the exploded side misses the per-interval replication (up to
    // maxBinsPerInterval×), so a statically-planned broadcast of it can
    // be arbitrarily over budget at runtime (see Skew.saltedJoin for
    // the measured failure). AQE's runtime conversion from TRUE
    // exchange sizes may still upgrade genuinely small sides.
    // Only the INTERVALS side carries the hint (round-6 ADVICE): the
    // hinted side is the hash BUILD side, and per (keys, __bin) cell
    // the interval count is bounded by interval density while the
    // point count is not — building on points could hold a hot bin's
    // full point set in one task's memory, the OOM sort-merge would
    // have spilled through. A pathologically interval-dense cell
    // remains the caller's binWidth knob; AQE's skew-join
    // (spark.sql.adaptive.skewJoin.enabled, on by default; splits
    // oversized PROBE partitions of shuffled-hash joins since Spark
    // 3.2) handles hot bins on the point side at runtime.
    l.join(r.hint("shuffle_hash"), keys :+ "__bin")
      .filter(col(point) >= col(lo) && col(point) <= col(hi))
      .drop("__bin")
  }

  /** Inner interval-overlap join: pairs `(left, right)` whose ranges
    * intersect (`lo_l <= hi_r AND lo_r <= hi_l`, closed intervals),
    * optionally also matching on equality `keys`. Column names must be
    * disambiguated by the caller (no shared names besides `keys`).
    *
    * Each matching pair shares ≥1 bin but is emitted exactly once: the
    * residual keeps only the first cell both cover, so no distinct
    * pass and no shuffle beyond the one equi-join. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      binWidth: Long, keys: Seq[String] = Nil,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireNoBinColumn(left, right)
    val w = lit(binWidth)
    def valid(lo: String, hi: String) =
      col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi)
    def binned(df: DataFrame, lo: String, hi: String) = df
      .filter(valid(lo, hi) && keys.map(col(_).isNotNull)
        .foldLeft(lit(true))(_ && _))
      .withColumn("__bin", explode(
        bins(col(lo), col(hi), w, maxBinsPerInterval)))
    // Hint (= build side) on the RIGHT side only, same rationale as
    // pointInInterval: callers pass the denser/smaller interval set on
    // the right; the left side stays the probe AQE skew-split governs.
    binned(left, loL, hiL)
      .join(binned(right, loR, hiR).hint("shuffle_hash"), keys :+ "__bin")
      .filter(col(loL) <= col(hiR) && col(loR) <= col(hiL) &&
        col("__bin") ===
          greatest(floorDiv(col(loL), w), floorDiv(col(loR), w)))
      .drop("__bin")
  }

  /** Sort-sweep execution of the SAME point-in-interval semantics, for
    * the interval-DENSE regime the binned hash join handles worst: the
    * hash path examines every same-cell (point, interval) pair — per-
    * cell cost points × intervals — which is fine when cells are
    * sparse but quadratic when thousands of intervals pile into each
    * cell (the sf100 inversion vs sort-based engines, BASELINE §11).
    * Here each cell is processed with the classic plane sweep instead:
    * sort points ascending, sort intervals by `lo`, and maintain a
    * min-heap of active intervals keyed by `hi` — activate intervals
    * with `lo ≤ p` as the sweep advances, expire `hi < p` from the
    * heap top, and every interval still in the heap CONTAINS p (no
    * residual filter). Per-cell cost O((p+i)·log i + output), i.e.
    * sort + output — the IEJoin cost class, on Spark's shuffle.
    *
    * Same binning, same one-cell-per-point exactness guarantee, same
    * output columns as [[pointInInterval]]; the shuffle volume is
    * identical (this changes the per-cell algorithm, not the data
    * movement). A cell's rows are materialized in one task (the heap
    * needs random access), so `binWidth` remains the memory knob —
    * exactly as it bounds the hash path's build side. */
  def pointInIntervalSweep(points: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String, binWidth: Long,
      keys: Seq[String] = Nil,
      maxBinsPerInterval: Int = 4096): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    requireNoBinColumn(points, intervals)
    val spark = points.sparkSession
    val w = lit(binWidth)
    val l = points
      .filter(col(point).isNotNull && keys.map(col(_).isNotNull)
        .foldLeft(lit(true))(_ && _))
      .withColumn("__bin", floorDiv(col(point), w))
      .withColumn("__p", col(point).cast("long"))
    val r = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull &&
        col(lo) <= col(hi) && keys.map(col(_).isNotNull)
        .foldLeft(lit(true))(_ && _))
      .withColumn("__bin", explode(
        bins(col(lo), col(hi), w, maxBinsPerInterval)))
      .withColumn("__lo", col(lo).cast("long"))
      .withColumn("__hi", col(hi).cast("long"))
    val lSchema = l.schema
    val rSchema = r.schema
    val keyCols = keys :+ "__bin"
    val lKeyIdx = keyCols.map(lSchema.fieldIndex).toArray
    val rKeyIdx = keyCols.map(rSchema.fieldIndex).toArray
    val lpIdx = lSchema.fieldIndex("__p")
    val rloIdx = rSchema.fieldIndex("__lo")
    val rhiIdx = rSchema.fieldIndex("__hi")
    // Output = key columns, then left non-key, then right non-key —
    // the exact column order of `l.join(r, keys :+ "__bin")` — minus
    // the internal __bin/__p/__lo/__hi columns.
    val internal = Set("__bin", "__p", "__lo", "__hi")
    val lOutIdx = lSchema.fieldNames.zipWithIndex.collect {
      case (n, i) if !keyCols.contains(n) && !internal(n) => i
    }
    val rOutIdx = rSchema.fieldNames.zipWithIndex.collect {
      case (n, i) if !keyCols.contains(n) && !internal(n) => i
    }
    val outSchema = StructType(
      keys.map(k => lSchema(lSchema.fieldIndex(k))) ++
        lOutIdx.map(lSchema(_)) ++ rOutIdx.map(rSchema(_)))
    val keyOutIdx = keys.map(lSchema.fieldIndex).toArray
    val parts = spark.sessionState.conf.numShufflePartitions
    val lKeyed = l.rdd.map(row => (lKeyIdx.map(row.get).toList, row))
    val rKeyed = r.rdd.map(row => (rKeyIdx.map(row.get).toList, row))
    val joined = lKeyed.cogroup(rKeyed, parts).flatMap {
      case (_, (ps, is)) =>
        val iArr = is.toArray
        if (iArr.isEmpty) Iterator.empty
        else {
          val pArr = ps.toArray
          if (pArr.isEmpty) Iterator.empty
          else {
            java.util.Arrays.sort(pArr, (a: Row, b: Row) =>
              java.lang.Long.compare(a.getLong(lpIdx), b.getLong(lpIdx)))
            java.util.Arrays.sort(iArr, (a: Row, b: Row) =>
              java.lang.Long.compare(a.getLong(rloIdx), b.getLong(rloIdx)))
            val active = new java.util.PriorityQueue[Row](
              math.max(1, iArr.length),
              (a: Row, b: Row) => java.lang.Long.compare(
                a.getLong(rhiIdx), b.getLong(rhiIdx)))
            var nextI = 0
            pArr.iterator.flatMap { pRow =>
              val p = pRow.getLong(lpIdx)
              while (nextI < iArr.length && iArr(nextI).getLong(rloIdx) <= p) {
                active.add(iArr(nextI)); nextI += 1
              }
              while (!active.isEmpty && active.peek().getLong(rhiIdx) < p)
                active.poll()
              // Every interval in the heap has lo <= p (activation
              // order) and hi >= p (expiry drained) — all match.
              val keyVals = keyOutIdx.map(pRow.get)
              val lVals = lOutIdx.map(pRow.get)
              val out = new Array[Row](active.size())
              var j = 0
              val it = active.iterator()
              while (it.hasNext) {
                val iRow = it.next()
                out(j) = Row.fromSeq(
                  (keyVals ++ lVals ++ rOutIdx.map(iRow.get)).toIndexedSeq)
                j += 1
              }
              out.iterator
            }
          }
        }
    }
    spark.createDataFrame(joined, outSchema)
  }

  /** Width-free variants: derive `binWidth` from the data — the median
    * interval length via ONE `approx_percentile` aggregate over the
    * intervals side — removing the one human-error knob of the
    * operator (a mis-guessed width degrades linearly; see the cost
    * model above, which names the median as the target). The
    * aggregate collects a single row; at 100 TB it is a full-scan
    * reduce with a constant-size sketch — the same cost class as the
    * join's own shuffle it then right-sizes. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String,
      keys: Seq[String], maxBinsPerInterval: Int): DataFrame = {
    // ONE probe job (round-8 verdict #6 — the former autoBinWidth +
    // cellStats pair scanned the intervals twice): a single aggregate
    // yields the p75 width plus the w-independent moments from which
    // density and waste derive algebraically (see [[probeStats]]).
    val (w, density, waste) = probeStats(intervals, lo, hi)
    if (density > DenseCellThreshold) {
      val useSweep = waste > WasteThreshold
      log.warn(f"RangeJoin: ~$density%.0f intervals per occupied cell at " +
        f"auto binWidth=$w (threshold ${DenseCellThreshold.toInt}), " +
        f"estimated examined/matched waste $waste%.1fx — " +
        (if (useSweep) "using the within-cell sort-sweep path"
         else "interval-dense but output-dominated; keeping the hash " +
           "path (the sweep only wins when most examined pairs miss)"))
      if (useSweep)
        return pointInIntervalSweep(points, intervals, point, lo, hi, w,
          keys, maxBinsPerInterval)
    }
    pointInInterval(points, intervals, point, lo, hi, w, keys,
      maxBinsPerInterval)
  }

  def pointInInterval(points: DataFrame, intervals: DataFrame,
      point: String, lo: String, hi: String,
      keys: Seq[String]): DataFrame =
    pointInInterval(points, intervals, point, lo, hi, keys, 4096)

  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      keys: Seq[String], maxBinsPerInterval: Int): DataFrame =
    intervalOverlap(left, right, loL, hiL, loR, hiR,
      // Bin by the LONGER side's median: replication of the other side
      // only shrinks, and a degenerate all-points side cannot force
      // width-1 cells against long partners.
      math.max(autoBinWidth(left, loL, hiL), autoBinWidth(right, loR, hiR)),
      keys, maxBinsPerInterval)

  def intervalOverlap(left: DataFrame, right: DataFrame,
      loL: String, hiL: String, loR: String, hiR: String,
      keys: Seq[String]): DataFrame =
    intervalOverlap(left, right, loL, hiL, loR, hiR, keys, 4096)

  /** Dense-cell regime boundary: above this many intervals per
    * occupied cell the width-free variant inspects the geometry
    * (cheap one-row aggregate) and decides between the hash path and
    * [[pointInIntervalSweep]] via the WASTE ratio below. */
  private[graft] val DenseCellThreshold = 256.0

  /** Residual-waste boundary: the hash path examines every same-cell
    * (point, interval) pair and filters; the expected examined/matched
    * ratio is `1 + w/avgLen` (pairs per point ≈ coverage density +
    * intervals-starting-per-cell; matches per point = coverage
    * density). The sweep's per-row overhead (RDD rows vs codegen) is
    * ~2–3×, so it only wins when the hash path wastes ≳ an order of
    * magnitude — MEASURED on 400k×400k cells: waste ≈ 500 → sweep
    * 1.2 s vs hash 2.7 s; waste ≈ 2 at density 7000 (output-dominated)
    * → hash 8.2 s vs sweep 27 s (BASELINE §12). NOTE: with the auto
    * width at the p75 interval length this regime is UNREACHABLE —
    * ≥ 25% of intervals have len ≥ w, so Σlen ≥ nI·w/4 and
    * waste = 1 + nI·w/Σlen ≤ 5 — the guard protects explicit-width
    * misuse and any future width heuristic, and the warning tells
    * dense-regime callers which knob they are holding. */
  private[graft] val WasteThreshold = 8.0

  /** (intervals per occupied cell, estimated examined/matched waste
    * ratio) at width `w` — the replication/density estimate the
    * round-7 verdict asked the auto variant to check. One small
    * aggregate: Σ cells-per-interval over ≈ distinct start cells; with
    * w at the p75 interval length most intervals span ≤ 2 cells, so
    * start cells undercount occupied cells by ≤ 2× — an order-of-
    * magnitude guard, not a cost model. */
  private[graft] def cellStats(intervals: DataFrame, lo: String,
      hi: String, w: Long, keys: Seq[String] = Nil): (Double, Double) = {
    val wc = lit(w)
    val s = floorDiv(col(lo), wc)
    val e = floorDiv(col(hi), wc)
    val len = col(hi).cast("long") - col(lo).cast("long") + lit(1L)
    val cellKey = if (keys.isEmpty) s else struct(keys.map(col) :+ s: _*)
    val row = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .agg(coalesce(sum(e - s + lit(1L)), lit(0L)).as("replicated"),
        approx_count_distinct(cellKey).as("cells"),
        avg(len).as("avgLen"))
      .head()
    val replicated = row.getLong(0)
    val cells = math.max(1L, row.getLong(1))
    val avgLen = if (row.isNullAt(2)) 1.0 else math.max(1.0, row.getDouble(2))
    (replicated.toDouble / cells, 1.0 + w / avgLen)
  }

  private[graft] def cellDensity(intervals: DataFrame, lo: String,
      hi: String, w: Long, keys: Seq[String] = Nil): Double =
    cellStats(intervals, lo, hi, w, keys)._1

  /** Fused one-pass probe of the width-free variant: (p75 width,
    * density estimate, waste). [[cellStats]] needs the width to bin,
    * so pairing it with [[autoBinWidth]] cost two full scans; instead
    * ONE aggregate collects the p75 plus w-INDEPENDENT moments (n,
    * Σlen, avg len, domain span) and derives at the chosen width:
    * replication ≈ n + Σlen/w (each interval spans len/w cells ± 1),
    * occupied cells ≤ min(replication, span/w + 1), density =
    * replication / that bound, waste = 1 + w/avgLen (the exact
    * [[cellStats]] formula). The density is an UNDER-estimate when
    * intervals cluster in a sub-span (occupied ≪ span/w) — acceptable
    * because at the p75 width the sweep reroute is provably
    * unreachable (waste ≤ 5, see [[WasteThreshold]]) and density only
    * gates the diagnostic warning; [[cellStats]] remains the exact
    * reference, suite-compared on the dense regime. */
  private[graft] def probeStats(intervals: DataFrame, lo: String,
      hi: String): (Long, Double, Double) = {
    val len = col(hi).cast("long") - col(lo).cast("long") + lit(1L)
    val row = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .agg(
        approx_percentile(len, lit(0.75), lit(1000)).as("p75"),
        count(lit(1)).as("n"),
        coalesce(sum(len), lit(0L)).as("sumLen"),
        avg(len).as("avgLen"),
        min(col(lo).cast("long")).as("mn"),
        max(col(hi).cast("long")).as("mx"))
      .head()
    if (row.isNullAt(0)) return (1L, 0.0, 1.0)
    val w = math.max(1L, row.getLong(0))
    val n = row.getLong(1)
    val sumLen = row.getLong(2)
    val avgLen = if (row.isNullAt(3)) 1.0 else math.max(1.0, row.getDouble(3))
    val span = (row.getLong(5) - row.getLong(4) + 1).toDouble
    val replicated = n + sumLen / w.toDouble
    val cellsUpper = math.max(1.0, math.min(replicated, span / w + 1.0))
    (w, replicated / cellsUpper, 1.0 + w / avgLen)
  }

  /** Upper-quartile interval length (closed-interval cell count,
    * `hi-lo+1`) as the data-driven bin width. The cost model wants a
    * width near the typical interval length; of the two failure modes,
    * a too-SMALL width is the worse one (it multiplies the build side —
    * a bimodal mix of short and long intervals binned at the short
    * mode's median floods hundreds of copies per long interval), while
    * a too-large width only grows the residual-filter fan-in linearly.
    * `approx_percentile` returns a real element, not an interpolation,
    * so p75 picks the longer mode on bimodal data: ≥ 75% of intervals
    * then replicate into ≤ 2 cells. Degenerate inputs (empty,
    * all-null, all-point intervals) fall back to width 1. */
  def autoBinWidth(intervals: DataFrame, lo: String, hi: String): Long = {
    val row = intervals
      .filter(col(lo).isNotNull && col(hi).isNotNull && col(lo) <= col(hi))
      .agg(approx_percentile(
        (col(hi).cast("long") - col(lo).cast("long")) + lit(1L),
        lit(0.75), lit(1000)).as("w"))
      .head()
    if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
  }

  /** Both inputs must be free of the operator's internal bin column —
    * `withColumn` would silently overwrite a caller's column of the
    * same name and `drop` would then delete it (round-5 ADVICE). */
  private def requireNoBinColumn(dfs: DataFrame*): Unit =
    dfs.foreach { df =>
      require(!df.columns.contains("__bin"),
        "RangeJoin: input already has a __bin column — rename it " +
          "(the operator uses __bin internally)")
    }

  /** The interval's cell ids, with the fail-fast replication guard. */
  private def bins(lo: org.apache.spark.sql.Column,
      hi: org.apache.spark.sql.Column, w: org.apache.spark.sql.Column,
      maxBins: Int): org.apache.spark.sql.Column = {
    val s = floorDiv(lo, w)
    val e = floorDiv(hi, w)
    val guardedEnd = when(e - s < lit(maxBins.toLong), e)
      .otherwise(raise_error(concat(
        lit("RangeJoin: interval replicates into "),
        (e - s + lit(1L)).cast("string"),
        lit(s" cells (maxBinsPerInterval=$maxBins): choose a binWidth " +
          "near the median interval length, or raise the cap")))
        .cast("long"))
    sequence(s, guardedEnd)
  }

  /** Floor division that stays exact on LongType (no double rounding;
    * correct toward -∞ for negative domains, matching Math.floorDiv). */
  private def floorDiv(x: org.apache.spark.sql.Column,
      w: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val xl = x.cast("long")
    val q = xl.divide(w).cast("long") // truncates toward zero
    when(xl % w < 0, q - 1).otherwise(q)
  }
}
