package graft
import org.apache.spark.sql.SparkSession

/** Benchmark harness: prints ONE JSON line with per-query seconds.
  *
  * Methodology — steady-state: each phase runs one untimed warm-up pass
  * (Janino codegen compile, parquet footer/listing caches, JIT — one-time
  * session costs that are flat in data size and amortize to zero on a
  * long-lived cluster), then times each query TWICE CONSECUTIVELY after
  * a heap collection (pause outside both timers); the reported number is
  * the per-query MINIMUM of the pair. Interference on a shared host
  * (GC, CPU contention) only ever ADDS time, so the minimum is the
  * truest estimate of the steady-state cost — and a consecutive pair
  * converges to the row's SELF-consistent steady state (run 2's
  * predecessor garbage and page-cache state are its own), where
  * min-across-full-passes carried every predecessor's debt in both
  * samples (see the steady-phase comment). The warm-up pass is
  * published as cold_* for transparency.
  *
  * The 10× phase (when /tmp/graft-sf1 exists, built once per machine via
  * `runMain graft.tools.ScaleData`) runs FIRST, in the cleanest JVM
  * state — it is the number that extrapolates to cluster scale and is
  * compared against the DuckDB oracle in BASELINE.md §4. The DuckDB
  * oracle is measured warm the same way.
  */
object Bench {

  /** Jackson (bundled with Spark) for reading the previous round's
    * artifact — the auto-regression rule's baseline. */
  private lazy val mapperForPrev =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-query errors are RECORDED, never timed: a query that throws
    * would otherwise finish in ~0 s and flatter the total (round-2
    * verdict harness nit). Failed queries land in the `errors` map
    * (query → exception class) and are excluded from totals — and the
    * emitted `queries_ok`/`queries_expected` counts make a shrunken
    * total impossible to mistake for a faster one. */
  private def phase(spark: SparkSession, dir: String,
      names: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      warmPasses: Int = 1)
      : (Seq[(String, Double)], Seq[(String, Double)], Map[String, String]) = {
    try graft.queries.MppQueries.warm(spark, dir)
    catch { case _: Throwable => }
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    def timeOne(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : Double = {
      val t0 = System.nanoTime()
      // toRdd.count(), NOT Dataset.count() (round-9 methodology fix):
      // count() wraps the query in a count aggregate and Catalyst then
      // PRUNES every column/aggregate the count does not need — a
      // grouped-percentile row degenerated to "distinct group keys"
      // and a per-doc kernel projection to a parquet-metadata row
      // count, under-measuring exactly the rows with the most work
      // (measured at sf3: q_stats_agg 0.29 s counted vs 1.07 s real).
      // Executing the query's OWN plan and counting its InternalRows
      // forces every output column and the final sort — what the
      // DuckDB oracle's fetchall always paid.
      try { fn(spark, dir).queryExecution.toRdd.count() } catch {
        case e: Throwable => errors(name) = e.getClass.getSimpleName
      }
      val sec = (System.nanoTime() - t0) / 1e9
      // GC-debt isolation (round-8 verdict #7): a multi-second row
      // leaves young-gen debt that inflates the NEXT rows by 0.3-1.5 s
      // (measured: q_mpp_update read 6.4 s bench-context vs 5.0 s
      // isolated). Collect it on the heavy row's own clock boundary so
      // every row times its plan, not its predecessor's garbage. The
      // ~0.1 s GC pause is outside both rows' timers.
      if (sec > 2.0) System.gc()
      sec
    }
    def pass(): Seq[(String, Double)] =
      names.map { case (name, fn) => name -> timeOne(name, fn) }
    val cold = pass()
    (1 until warmPasses).foreach { _ => System.gc(); pass() }
    // Steady phase: the two timed runs of a row are CONSECUTIVE, with
    // a collected heap before the pair (pause outside both timers) —
    // min-of-2 then converges to the row's SELF-consistent steady
    // state: run 2's only predecessor garbage, page-cache state, and
    // JIT profile are its own. The round-9 structure (two full passes
    // over all rows, min across passes) kept every row's predecessor
    // debt in BOTH samples; the first round-10 attempt (full GC
    // before every row, interleaved order) swapped that debt for
    // post-compaction page-fault warm-up INSIDE the timer and
    // measured WORSE (sf3 total 162.6 → 174.6, diffuse +0.2-1.3 s on
    // allocation-heavy rows). Same total work as two passes; only the
    // order changed. Measured: the three GC-debt-audit rows land
    // within the verdict's 25%-of-isolated bound (BASELINE §19.4).
    val steady = names.map { case (name, fn) =>
      System.gc()
      val a = timeOne(name, fn)
      val b = timeOne(name, fn)
      name -> math.min(a, b)
    }
    val ok = (n: String) => !errors.contains(n)
    (cold.filter(c => ok(c._1)), steady.filter(s => ok(s._1)),
      errors.toMap)
  }

  /** The DML/versioned-protocol rows: per pass the Spark side runs
    * real DDL + loads + COW rewrites + archives + manifest commits +
    * live streams, while the oracle runs a plain SELECT over static
    * parquet — a protocol asymmetry by construction (BASELINE §22.6),
    * recorded as its own class. Everything else splits by oracle time:
    * ≥ 0.1 s = substantive (the real engine-vs-engine surface),
    * < 0.1 s = scheduling-floor. The set matches the §23.6/§23.10
    * hand classifications (18 rows). */
  private val DmlProtocolRows = Set(
    "q_mpp_defaults", "q_mpp_delete", "q_mpp_merge", "q_mpp_merge_full",
    "q_mpp_optimize", "q_mpp_prune_eq", "q_mpp_prune_in",
    "q_mpp_prune_or", "q_mpp_rebucket", "q_mpp_restore",
    "q_mpp_scan_agg", "q_mpp_update", "q_mpp_zorder",
    "q_time_travel", "q_table_changes", "q_schema_evolution",
    "q_stream_upsert", "q_stream_replica")

  /** SAME-HOUR paired DuckDB oracle (round-13 verdict item 1): the
    * host drifts 25-50% between sessions, so a bench total against an
    * oracle run hours earlier is not a ratio — it's two unrelated
    * numbers. The oracle therefore runs INSIDE the bench flow,
    * immediately after the scaled phase, over the same dir and the
    * same statements (`SparkEntry.oracleSql`, dumped fresh), via
    * `tools/time_oracle.py` (warm min-of-2, 32 threads — the BASELINE
    * §4 methodology). The per-row artifact is written next to the
    * bench artifact (`GRAFT_ORACLE_JSON`, default ORACLE_FULL.json)
    * so a judge can recompute every ratio a week later, and the
    * paired full/substantive/floor/DML ratios ride in the bench JSON
    * itself. Skipped without a scaled phase, when python/duckdb are
    * absent (driver-side tooling), or with GRAFT_BENCH_ORACLE=0.
    * Returns the JSON fragment for the bench line ("" when skipped). */
  private def runPairedOracle(dir: String,
      scaledRows: Seq[(String, Double)]): String = {
    try {
      val tool = new java.io.File("tools/time_oracle.py")
      if (!tool.isFile) return ""
      val m = mapperForPrev
      val sqlPath = java.nio.file.Files.createTempFile("oracle_sql", ".json")
      val node = m.createObjectNode()
      SparkEntry.oracleSql.foreach { case (k, v) => node.put(k, v) }
      java.nio.file.Files.write(sqlPath, m.writeValueAsBytes(node))
      val t0 = System.currentTimeMillis()
      // Pair exactly the rows the scaled phase ran: under
      // GRAFT_BENCH_QUERIES subsets (the sf30 scale-regime runs) the
      // oracle must not execute the other 90 statements — some of the
      // excluded ones are labeled-quadratic baselines that would run
      // for hours at that scale. A full run passes every name, so the
      // behavior of the record bench is unchanged.
      val p = new ProcessBuilder((Seq("python3", tool.getAbsolutePath,
          dir, sqlPath.toString) ++ scaledRows.map(_._1)): _*)
        .redirectError(ProcessBuilder.Redirect.INHERIT).start()
      val out = new String(p.getInputStream.readAllBytes, "UTF-8")
      p.waitFor()
      val line = out.linesIterator.filter(_.startsWith("{")).toSeq
        .lastOption.getOrElse(return "")
      val oq = m.readTree(line).get("queries")
      if (oq == null) return ""
      import scala.jdk.CollectionConverters._
      val otimes: Map[String, Double] = oq.properties().asScala
        .flatMap { e =>
          if (e.getValue.isNumber) Some(e.getKey -> e.getValue.asDouble)
          else None // ERR rows drop out of the pairing, loudly counted
        }.toMap
      val sparkT = scaledRows.toMap
      val common = sparkT.keySet.intersect(otimes.keySet)
      def sums(rows: Set[String]): (Double, Double) =
        (rows.toSeq.map(sparkT).sum, rows.toSeq.map(otimes).sum)
      def ratio(p: (Double, Double)): Double =
        if (p._2 > 0) p._1 / p._2 else -1.0
      val all = sums(common)
      val subst = common.filter(n => !DmlProtocolRows(n) && otimes(n) >= 0.1)
      val floor = common.filter(n => !DmlProtocolRows(n) && otimes(n) < 0.1)
      val dml = common.filter(DmlProtocolRows)
      val (sS, oS) = sums(subst); val (sF, oF) = sums(floor)
      val (sD, oD) = sums(dml)
      val artifact = sys.env.getOrElse("GRAFT_ORACLE_JSON",
        "ORACLE_FULL.json")
      val art =
        s"""{"ts_ms":$t0,"dir":"$dir","paired":"same-process, oracle started immediately after the scaled phase","spark_scaled_total":${all._1},"oracle_total":${all._2},"paired_ratio":${ratio(all)},"substantive":{"n":${subst.size},"spark":$sS,"oracle":$oS,"ratio":${ratio((sS, oS))}},"floor":{"n":${floor.size},"spark":$sF,"oracle":$oF,"ratio":${ratio((sF, oF))}},"dml_versioned":{"n":${dml.size},"spark":$sD,"oracle":$oD,"ratio":${ratio((sD, oD))}},"spark_scaled_queries":${scaledRows.filter(r => common(r._1)).map { case (k, v) => s"\"$k\":$v" }.mkString("{", ",", "}")},"oracle_run":$line}"""
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(artifact), (art + "\n").getBytes("UTF-8"))
      catch { case _: Throwable => }
      f""","oracle_total":${all._2}%.2f,"paired_ratio":${ratio(all)}%.3f,"paired_substantive_ratio":${ratio((sS, oS))}%.3f,"paired_substantive_n":${subst.size},"paired_n":${common.size},"oracle_file":"$artifact""""
    } catch { case _: Throwable => "" }
  }

  /** Data-driven AQE start width: ~64 MB of INPUT per initial shuffle
    * partition (replicating operators — salt×16, bin explode — multiply
    * shuffle bytes past input size, hence tighter than the 128 MB scan
    * split), floor 256 (the sf100-proven value), cap 4096. §8's sizing
    * doctrine — per-task state scales with data volume, not core
    * count — applied to the one knob a single session must pre-set. */
  def defaultInitParts(dir: String): Int = {
    def sizeOf(f: java.io.File): Long =
      if (f.isFile) f.length
      else Option(f.listFiles).map(_.map(sizeOf).sum).getOrElse(0L)
    math.min(4096L, math.max(256L,
      sizeOf(new java.io.File(dir)) / (64L << 20))).toInt
  }

  /** Builds the standard bench session (shared by the main phases and
    * the `--one` fresh-JVM child). */
  private def buildSession(sfDir: String): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.get("SPARK_GRAFT_INIT_PARTS")
          .map(_.toInt).getOrElse(defaultInitParts(sfDir)))
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // GRAFT_WARM_TABLES → graft.warm.tables: bounds which warehouse
    // tables MppQueries.warm builds. Set here (not in main) so the
    // fresh-JVM --one children honor it too — an isolated fork at a
    // deep-scale mirror must not build the full DML warehouse to time
    // one parquet-only row.
    sys.env.get("GRAFT_WARM_TABLES")
      .foreach(v => spark.conf.set("graft.warm.tables", v))
    spark
  }

  /** Fresh-JVM single-row mode (`--one <name> <dir>`): the per-plan
    * TRUTH for one query — no predecessor page-cache state, heap
    * fragmentation, or JIT history from 95 other rows. Prints one
    * parseable line; the parent bench forks this per heavy row and
    * publishes the results as the `isolated` dicts (round-10 verdict:
    * the recorded artifact carried only bench-context numbers, the
    * per-plan truth lived in BASELINE prose where no tooling could
    * diff it round-over-round). */
  private def runOne(name: String, dir: String): Unit = {
    val spark = buildSession(dir)
    spark.range(1000).count()
    try graft.queries.MppQueries.warm(spark, dir)
    catch { case _: Throwable => }
    val fn = SparkEntry.queries(name)
    def t(): Double = {
      val t0 = System.nanoTime()
      fn(spark, dir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    // Warm until STEADY, then time (round-13 verdict item 3): one
    // warm-up pass is not enough in a fresh JVM — C2 compiles the
    // generated code across the first few executions, and a single
    // warm pass left 40-70% JIT-cold inflation in the recorded min
    // (q_asof_join isolated 2.15 s vs 1.25 s bench context), which
    // disqualified the isolated number as the <2× proof it exists to
    // be. Warm passes run until two consecutive are within 15% (max
    // 4), so the timed pair measures the same steady state the bench
    // context reaches after ~140 prior plans.
    var prev = t() // warm-up 1 (codegen, listings, JIT)
    var warmed = 1
    var cur = t()
    warmed += 1
    while (warmed < 4 && prev > cur * 1.15) { // still speeding up
      prev = cur; cur = t(); warmed += 1
    }
    System.gc()
    val sec = math.min(t(), t())
    println(f"GRAFT_ISOLATED $name $sec%.6f warmups=$warmed")
    spark.stop()
  }

  /** Forks a fresh JVM per named row (same classpath, same JVM flags —
    * module opens and heap ride ManagementFactory's input args) and
    * collects the isolated seconds. Rows whose child fails are
    * omitted rather than guessed. */
  private def isolatedPhase(names: Seq[String], dir: String)
      : Seq[(String, Double)] = {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    val jvmArgs = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getRuntimeMXBean
        .getInputArguments.asScala.toSeq
        .filterNot(_.startsWith("-agentlib")) // no debugger in children
    }
    val cp = System.getProperty("java.class.path")
    names.flatMap { name =>
      val cmd = Seq(javaBin) ++ jvmArgs ++
        Seq("-cp", cp, "graft.Bench", "--one", name, dir)
      try {
        val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes, "UTF-8")
        p.waitFor()
        out.linesIterator
          .find(_.startsWith("GRAFT_ISOLATED "))
          .map { l =>
            val parts = l.trim.split(" ")
            name -> parts(2).toDouble
          }
      } catch { case _: Throwable => None }
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.length >= 3 && args(0) == "--one") {
      runOne(args(1), args(2)); return
    }
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Session confs (see buildSession): AQE start-wide/coalesce-back
    // sizing — measured necessity at sf100/sf300 (BASELINE §11, §13) —
    // hash joins preferred over sort-merge, data-driven initial
    // partition count.
    val spark = buildSession(sfDir)
    spark.range(1000).count() // JIT the scheduler path
    // Deterministic (sorted) order for cross-round comparability, with
    // one amendment (round-8 verdict #7): the two span-dedup rows — the
    // heaviest of the surface — run LAST, so their allocation pressure
    // can never bleed into the rows that would otherwise follow them
    // alphabetically. Per-row numbers stay comparable across rounds;
    // only the execution order moved.
    val heavyTail = Seq("q_span_dedup", "q_span_dedup_winnow")
    // GRAFT_BENCH_QUERIES: optional comma-separated allowlist — the
    // scale-regime runs (sf30) time a chosen subset (the flagged rows
    // + the substantive surface) rather than the full 103-row
    // protocol; the artifact's queries_expected reflects the subset
    // so a filtered run can never read as a full one.
    val allow = sys.env.getOrElse("GRAFT_BENCH_QUERIES", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSet
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(n => allow.isEmpty || allow.contains(n._1))
    val names = sorted.filterNot(n => heavyTail.contains(n._1)) ++
      heavyTail.flatMap(h => sorted.find(_._1 == h))
    def fmt(rs: Seq[(String, Double)]) = rs
      .map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    // GRAFT_BENCH_SKIP_BASE=1 skips the sf0.1 phase (scale-regime
    // runs: the scaled phase's own warm pass provides the JIT state,
    // and multi-second rows are not JIT-bound).
    val skipBase = sys.env.getOrElse("GRAFT_BENCH_SKIP_BASE", "0") == "1"
    val (cold, steady, errors) =
      if (skipBase) (Seq.empty[(String, Double)],
        Seq.empty[(String, Double)], Map.empty[String, String])
      else phase(spark, sfDir, names)
    val total = steady.map(_._2).sum
    val coldTotal = cold.map(_._2).sum
    def fmtErr(es: Map[String, String]) = es
      .map { case (k, v) => s"\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    // Scaled phase AFTER the sf0.1 phase: ~140 prior executions of the
    // same plans have JIT-compiled the generated code, which is exactly
    // the long-lived-cluster steady state this phase extrapolates to.
    // Default mirror is 30× sf0.1 (= sf3), built once per machine by
    // `runMain graft.tools.ScaleData /root/testdata/sf0.1 /tmp/graft-sf3
    // 30`; at that size per-query durations dwarf scheduling overhead
    // and host noise. The DuckDB oracle over the SAME dir is recorded
    // in BASELINE.md §4.
    val scaledDir = sys.env.getOrElse("SPARK_GRAFT_SF1_DIR", "/tmp/graft-sf3")
    val (scaled, scaledRows) =
      if (new java.io.File(s"$scaledDir/lineitem.parquet").exists) {
      graft.queries.DedupQueries.releaseShingles(sfDir)
      System.gc()
      // Re-size the AQE start width for the bigger mirror (runtime SQL
      // conf — read at each query's planning, safe to flip mid-session).
      if (!sys.env.contains("SPARK_GRAFT_INIT_PARTS"))
        spark.conf.set(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
          defaultInitParts(scaledDir))
      val oracleBacked = names.filter(n => SparkEntry.oracleSql.contains(n._1))
      val (_, timed, sErrs) =
        phase(spark, scaledDir, oracleBacked)
      (s""","scaled_total":${timed.map(_._2).sum},"scaled_queries":${fmt(timed)},"scaled_errors":${fmtErr(sErrs)},"scaled_ok":${timed.size},"scaled_expected":${oracleBacked.size},"scaled_dir":"$scaledDir"""",
        timed)
    } else ("", Seq.empty[(String, Double)])
    // Same-hour oracle pairing, IMMEDIATELY after the scaled phase —
    // before the isolated forks, whose length varies — so the pair
    // shares one host state (see runPairedOracle).
    val oracleJson =
      if (scaledRows.nonEmpty &&
          sys.env.getOrElse("GRAFT_BENCH_ORACLE", "1") != "0")
        runPairedOracle(scaledDir, scaledRows)
      else ""
    // Isolated phase (round-10 verdict "what's missing #2"): fresh-JVM
    // per-row truth for the heaviest rows, PUBLISHED IN THE ARTIFACT so
    // plan regressions diff round-over-round without prose archaeology.
    // Bench-context numbers carry ordering/GC/page-cache debt (~1.5× on
    // DML rows); the isolated dict is the per-plan number the BASELINE
    // prose always had to restate. Bounded: rows above
    // GRAFT_BENCH_ISOLATE_MIN seconds (default 2.0; <=0 disables), at
    // most GRAFT_BENCH_ISOLATE_MAX (default 8), most expensive first.
    // Placed at the END of the line: the driver records the line's
    // 2000-char TAIL, so the isolated dict must sit inside it.
    val isoMin = sys.env.getOrElse("GRAFT_BENCH_ISOLATE_MIN", "2.0").toDouble
    val isoMax = sys.env.getOrElse("GRAFT_BENCH_ISOLATE_MAX", "8").toInt
    // AUTO-REGRESSION rule (round-12 verdict item 2): the isolated
    // list is COMPUTED FROM THE DIFF against the previous artifact,
    // not from a hand-carried watchlist that lags one round. Every
    // scaled row that regressed >25% vs the previous BENCH_FULL.json
    // gets a fresh-JVM isolated number THIS round, so each regression
    // is either reproduced (then chased) or attributed to bench-
    // context spread with the per-plan truth recorded.
    // GRAFT_BENCH_ISOLATE_EXTRA remains a manual addition hook.
    val prevScaled: Map[String, Double] =
      try {
        val prev = mapperForPrev.readTree(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(sys.env.getOrElse("GRAFT_BENCH_PREV",
            sys.env.getOrElse("GRAFT_BENCH_JSON", "BENCH_FULL.json")))))
        val sq = prev.get("scaled_queries")
        if (sq == null) Map.empty
        else {
          import scala.jdk.CollectionConverters._
          sq.properties().asScala
            .map(e => e.getKey -> e.getValue.asDouble()).toMap
        }
      } catch { case _: Throwable => Map.empty }
    val regressed: Seq[(String, Double, Double)] = scaledRows.flatMap {
      case (n, cur) => prevScaled.get(n) match {
        case Some(prev) if cur > prev * 1.25 => Some((n, prev, cur))
        case _ => None
      }
    }.sortBy(-_._3)
    // HOST-DRIFT detector (round-13 second wave): when MOST of the
    // surface "regressed", the explanation is one host, not dozens of
    // independent plan regressions — and isolating every row forks the
    // better part of an hour of fresh JVMs to prove it (observed: a
    // slower VM state regressed 78/103 rows at once, including
    // documents-only kernels no engine change can touch). Above the
    // fraction threshold the isolation set collapses to the WORST few
    // regressions plus fixed pure-compute CANARIES — kernels with
    // zero engine/warehouse involvement, so a canary whose ISOLATED
    // number also regressed is host drift confirmed, machine-readably
    // (`host_drift` in the artifact). Below the threshold the
    // round-12 rule is unchanged: every regressed row isolates.
    val driftFraction = sys.env
      .getOrElse("GRAFT_BENCH_DRIFT_FRACTION", "0.25").toDouble
    val comparable = scaledRows.count { case (n, _) => prevScaled.contains(n) }
    val hostDrift = comparable >= 20 &&
      regressed.size > comparable * driftFraction
    val canaryRows = Seq("q_dedup_ngram_jaccard", "q_text_stats")
    // Every regression is LOGGED in the artifact; only rows ≥0.1 s get
    // an isolated fork (below that a fresh JVM measures scheduler
    // noise, not the plan — but the dict must still show the row so a
    // tiny query's blow-up is never invisible).
    val regNames = regressed.filter(_._3 >= 0.1).map(_._1)
    val isoExtra = sys.env.getOrElse("GRAFT_BENCH_ISOLATE_EXTRA", "")
      .split(',').map(_.trim).filter(_.nonEmpty).toSeq ++
      (if (hostDrift) regNames.take(4) ++ canaryRows else regNames)
    val (isoSrc, isoDir) =
      if (scaledRows.nonEmpty) (scaledRows, scaledDir)
      else (steady, sfDir)
    val isolated =
      if (isoMin <= 0) Seq.empty
      else {
        val heavy = isoSrc.filter(_._2 >= isoMin)
          .sortBy(-_._2).take(isoMax).map(_._1)
        val names = heavy ++
          isoExtra.distinct.filter(n => !heavy.contains(n) &&
            isoSrc.exists(_._1 == n))
        isolatedPhase(names, isoDir)
      }
    // Per-row regression VERDICTS (round-14 verdict item 4): the
    // artifact already holds the evidence that separates a plan
    // regression from context/GC/host debt — the same-round
    // warmed-isolated number — but the label wasn't emitted, so 16
    // partial-drift rows could read as 16 plan regressions. A row
    // whose fresh-JVM isolated time is at or below its previous
    // CONTEXT time (within the same 25% noise band the trigger uses)
    // is context debt by construction: the plan, run alone, is as
    // fast as it ever was. Only "regressed" verdicts are real
    // plan-chase work (`regressed_real` counts them).
    val isoMap = isolated.toMap
    def verdictOf(n: String, prev: Double): String =
      isoMap.get(n) match {
        case Some(iso) if iso <= prev * 1.25 => "context_debt"
        case Some(_) => "regressed"
        case None if hostDrift => "suspected_drift"
        case None => "unisolated"
      }
    val regJson = regressed.map { case (n, p, c) =>
      s"""\"$n\":[$p,$c,\"${verdictOf(n, p)}\"]""" }.mkString("{", ",", "}")
    val regReal = regressed.count { case (n, p, _) =>
      verdictOf(n, p) == "regressed" }
    val isoJson =
      s""","isolated":${fmt(isolated)},"isolated_dir":"$isoDir","regressed_vs_prev":$regJson""" +
        s""","host_drift":{"suspected":$hostDrift,"comparable":$comparable,"regressed":${regressed.size},"regressed_real":$regReal}"""
    val line = s"""{"metric":"total","value":$total,"unit":"sec","mode":"steady-state (per-query min of 2 warm runs; cold_* = first run)","queries":${fmt(steady)},"errors":${fmtErr(errors)},"queries_ok":${steady.size},"queries_expected":${if (skipBase) 0 else names.size},"cold_total":$coldTotal,"cold_queries":${fmt(cold)}$scaled$isoJson$oracleJson,"sf":"$sfDir"}"""
    println(line)
    // The driver keeps only the tail of the stdout line; the COMPLETE
    // artifact goes to a repo file so every dict survives for diffing.
    try java.nio.file.Files.write(
      java.nio.file.Paths.get(
        sys.env.getOrElse("GRAFT_BENCH_JSON", "BENCH_FULL.json")),
      (line + "\n").getBytes("UTF-8"))
    catch { case _: Throwable => }
    spark.stop()
  }
}
