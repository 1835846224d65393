package graft
import org.apache.spark.sql.SparkSession

object Bench {
  /** Evaluate a query's FULL physical plan (r16). The previous consume
    * action was `df.count()`, which re-optimizes with the count on top
    * and PRUNES: a query tail ending in a global aggregate collapses
    * to a constant-1-row count that never executes the body at all,
    * and any final projection's expressions are dropped because row
    * counting needs no columns. That is how the r15 Part-8 mystery
    * happened — q_confusion_matrix's carried per-token HOF never ran
    * under the bench (global-agg tail, pruned to ~0.6 s) while the
    * shape-identical q_calibration_bins paid it in full (grouped
    * tail keeps its keys, and the upstream aggregate's truth GROUP
    * key keeps the HOF) at 3.6 s: the "5x execution mode" was two
    * different COUNT plans, not two modes of one plan. `toRdd` skips
    * the re-optimization and runs the exact plan the query declares —
    * every operator, every output column — so timed numbers now
    * measure what Verify and a real consumer pay. (RDD count does not
    * collect rows to the driver; rows stream as InternalRow.)
    */
  private def consume(df: org.apache.spark.sql.DataFrame): Unit = {
    df.queryExecution.toRdd.count(); ()
  }

  /** Fixed headline subset for the one-line summary. The driver captures only
    * the last ~2000 chars of output, so the printed JSON line must stay well
    * under that; the full per-query map (all ~120 queries) goes to
    * BENCH_DETAIL.json instead. Chosen to span every operator family:
    * agg/join/window, dedup, ANN, text, raster, geo, streaming, sources.
    */
  private val headline = Seq(
    "q_agg_pricing", "q_sql_multi_join", "q_window_rank", "q_rollup",
    "q_join_topk", "q_skew_join_salted", "q_asof_join", "q_range_join",
    "q_dedup_exact", "q_dedup_minhash", "q_dedup_simhash_pairs",
    "q_ann_cosine", "q_ann_lsh", "q_ann_ivf",
    "q_tfidf", "q_heavy_hitters", "q_lang_ngram",
    "q_raster_stats", "q_clip_raster", "q_spatial_join", "q_reproject_4326",
    "q_stream_tumbling", "q_stream_stream_join", "q_stream_session",
    "q_feature_source", "q_partitioned_source", "q_product_catalog",
    "q_embedding_near_dup", "q_url_canonical", "q_ngram_novelty",
    "q_mix_sample", "q_semantic_cluster", "q_fuzzy_join",
    "q_runtime_filter", "q_passage_overlap", "q_split_leakage",
    "q_ann_ivf_probe2", "q_skew_join_aqe", "q_scalar_subquery",
    "q_containment", "q_pipeline_e2e",
    "q_span_dedup", "q_phrase_rank", "q_kmv_intersect",
    "q_freq_itemsets", "q_confusion_matrix")

  /** The committed-base fixture dir; full runs anywhere else write an
    * sf-suffixed detail file instead of the base (see detailName).
    */
  private val DefaultSfDir = "/root/testdata/sf0.1"

  /** The previous run's comparison base: per-query medians, per-query
    * max-over-passes (each query's OWN recorded variance band), the
    * CPU-canary median (the machine-speed index the band comparison
    * normalizes by), and the filesystem write-canary (the environment
    * key for sink-heavy queries).
    */
  private[graft] final case class PrevBase(
      med: Map[String, Double],
      max: Map[String, Double],
      canaryMed: Option[Double],
      fsCanary: Option[Double],
      stageCanaryMed: Option[Double] = None)

  /** Detail-file write routing (VERDICT r18 #2): a bench run must never
    * overwrite the committed regression base in place — the r18 driver
    * run left a looser 271.5 s detail sitting over the adjudicated
    * 256.9 s base in the working tree, one accidental `git add` away
    * from weakening every future band. Every run writes
    * `<base>_LAST.json`; the base name is written ONLY when the
    * operator explicitly promotes (SPARK_GRAFT_PROMOTE_BASE=1) AND the
    * run passed its own adjudication gate (promoting a load-poisoned
    * run is refused even when asked — parsePrevBase would reject it on
    * the next run anyway, but the refusal belongs at write time).
    */
  private[graft] def detailRoutes(
      baseName: String, promote: Boolean,
      unadjudicated: Boolean): (String, Option[String]) = {
    val last = baseName.stripSuffix(".json") + "_LAST.json"
    (last, if (promote && !unadjudicated) Some(baseName) else None)
  }

  /** Queries whose timed body WRITES through the local filesystem
    * (temp-dir sinks), making their wall time a property of the host's
    * filesystem as much as of the code: q_pipeline_e2e measured a
    * tight 1.82 s in the driver container vs a tight 3.17 s
    * builder-local on IDENTICAL code (r17 adjudication — ROUND17_NOTES
    * Part 5). These rows are compared only like-for-like: when the
    * fs write-canary moved >1.5× between base and current run, their
    * min-basis flags route to the advisory "regressions_cross_env"
    * key instead of the gating "regressions" (VERDICT r17 #4).
    */
  private[graft] val SinkHeavy: Set[String] = Set("q_pipeline_e2e")

  /** Parse a previous detail file into the per-query base for the
    * regression report, or refuse it with the reason. Two refusals:
    * a detail measured at another sfDir (not like-for-like), and — the
    * r12 hole — one flagged `"unadjudicated": true`. An unadjudicated
    * detail is a load-poisoned run whose medians are inflated
    * suite-wide (the r12 driver run sat ~18% over the same-code quiet
    * base); silently adopting it as the base would make regressions up
    * to that inflation invisible on the NEXT run. The docs' "never use
    * a flagged run as a base" rule is enforced here in code, so even a
    * poisoned file that does get committed (it happened: the r12
    * driver committed one) cannot poison the next comparison.
    */
  private[graft] def parsePrevBase(
      txt: String, sfDir: String): Either[String, PrevBase] = {
    if (""""unadjudicated"\s*:\s*true""".r.findFirstIn(txt).isDefined)
      Left("flagged \"unadjudicated\": true (load-poisoned run) — not a " +
        "citable regression base; restore an adjudicated detail file")
    else if (!""""sf":"([^"]*)"""".r.findFirstMatchIn(txt)
        .map(_.group(1)).contains(sfDir))
      Left("measured at a different sf dir — not like-for-like")
    else {
      // scope to the canonical medians object: the detail file also
      // carries "warm"/"minmax" maps keyed by the same query names
      val scope = """"queries":\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse(txt)
      val med = """"(q_[A-Za-z0-9_]+)":([0-9][0-9.eE+-]*)""".r
        .findAllMatchIn(scope)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      val mmScope = """"minmax":\{([^}]*)\}""".r
        .findFirstMatchIn(txt).map(_.group(1)).getOrElse("")
      val max = """"(q_[A-Za-z0-9_]+)":\[[0-9.eE+-]+,([0-9][0-9.eE+-]*)\]""".r
        .findAllMatchIn(mmScope)
        .map(m => m.group(1) -> m.group(2).toDouble).toMap
      def num(key: String): Option[Double] =
        ("\"" + key + """":([0-9][0-9.eE+-]*)""").r
          .findFirstMatchIn(txt).map(_.group(1).toDouble)
      Right(PrevBase(med, max, num("canary_med"), num("fs_canary"),
        num("stage_canary_med")))
    }
  }

  def main(args: Array[String]): Unit = {
    // canonicalized ONCE and used for reads, the prev-base sf guard,
    // the detail-file routing, and the emitted "sf" field alike — a
    // trailing slash or '.' spelling must not make those checks
    // disagree (one would overwrite the base while the other stops
    // comparing against it)
    val sfDir = new java.io.File(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", DefaultSfDir)).getCanonicalPath
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // One measurement is not a signal: the same 119-query suite measured
    // 88.6 s and 151.4 s on identical code in round 5 (JIT/GC/page-cache
    // phase). Per-query MEDIAN of `passes` runs is what gets reported and
    // compared across rounds; min/max ride along in the detail file so the
    // spread itself is visible.
    val passes = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_PASSES", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // no .crc sidecars from Spark's own local writes (see scaladoc)
    graft.sinks.S3Sink.disableLocalWriteChecksums(spark)
    // untimed warmup: JIT/codegen/session init otherwise lands entirely
    // on whichever query happens to iterate first
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    // fixture-schema tripwire (non-fatal here — the bench should still
    // measure whatever runs — but drift gets named up front instead of
    // surfacing as an opaque per-query error cluster)
    try graft.sources.FixtureContract.violations(spark, sfDir)
      .foreach(v => System.err.println(s"[bench] FIXTURE CONTRACT: $v"))
    catch { case _: Throwable => () }

    // optional comma-separated subset for local iteration
    // (SPARK_GRAFT_ONLY=q_a,q_b); full suite when unset
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    // Detail-file routing, decided ONCE and used for both the prev-base
    // READ and this run's write: a SPARK_GRAFT_ONLY subset run must NOT
    // overwrite the full-suite detail file (the committed cross-round
    // regression base), and neither may a full-suite run at a
    // NON-canonical sfDir (a scale fixture, a local sf0.001 iteration)
    // — one once overwrote the working-tree base in place (r12). Alt
    // runs get a PER-SF file (basename + a short path digest so
    // same-named dirs can't clobber each other), and read their prev
    // base from the SAME per-sf file, so cross-run regression
    // comparison works at scale fixtures too.
    val detailName =
      if (only.isDefined) "BENCH_DETAIL_SUBSET.json"
      else if (sfDir != new java.io.File(DefaultSfDir).getCanonicalPath) {
        val base = new java.io.File(sfDir).getName
          .replaceAll("[^A-Za-z0-9._-]", "_")
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(sfDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
        s"BENCH_DETAIL_${base}_$md5.json"
      } else "BENCH_DETAIL.json"

    // Previous run's per-query medians, read BEFORE this run overwrites
    // the detail file — the committed base (or the per-sf sibling for
    // alt runs) is the comparison base for the regression report.
    val prevDetail = new java.io.File(detailName)
    val emptyBase = PrevBase(Map.empty, Map.empty, None, None)
    val prev: PrevBase =
      if (!prevDetail.exists()) emptyBase
      else try {
        val src = scala.io.Source.fromFile(prevDetail, "UTF-8")
        val txt = try src.mkString finally src.close()
        parsePrevBase(txt, sfDir) match {
          case Right(m) => m
          case Left(reason) =>
            System.err.println(s"[bench] PREV BASE REFUSED ($detailName): $reason")
            emptyBase
        }
      } catch { case _: Throwable => emptyBase }

    // Per query: run `passes` times back-to-back, keep the median (and the
    // spread). A broken query must surface as an "err" entry, never as a
    // near-zero wall time flattering the total. Run order is RANDOMIZED per
    // pass (deterministic seed = pass index, so runs are reproducible):
    // rounds 9–10 both showed positional suite-interaction — a query's
    // neighbors (GC debt, page-cache state) leaking into its median when
    // every pass visits queries in the same order. Shuffling per pass turns
    // that systematic bias into symmetric noise the median absorbs.
    val selected = only match {
      case Some(set) => SparkEntry.queries.filter { case (k, _) => set(k) }
      case None => SparkEntry.queries
    }
    // NOTE on in-suite vs isolated numbers: a mid-suite query can pay
    // collector debt from the ~450 executions before it (q_ngram_novelty
    // once measured 3.7 s in-suite vs 1.0 s isolated on identical code —
    // root cause was its redundant countDistinct state, since removed).
    // An untimed System.gc() between queries was tried and REVERTED: it
    // recovered ~2 s on the one allocation-heavy query but cost ~9 s
    // spread across the rest of the suite (full-GC aftermath is slower
    // than the debt it clears). If a future in-suite-only regression
    // appears, profile the query's allocation first.
    //
    // MEASUREMENT DESIGN (round-8 rework): passes are interleaved at
    // SUITE level — whole-suite pass 1, then pass 2, then pass 3 — not
    // back-to-back per query. Back-to-back passes share one ~seconds
    // window, so a burst of co-located machine load poisons all three
    // and the median is no defense (round 7: 13 untouched sub-second
    // queries ≥2.6× their base even at their FASTEST pass, while local
    // runs of identical code were flat). Suite-level interleaving puts
    // minutes between a query's passes, decorrelating load windows, so
    // the per-query median across suite passes survives any load burst
    // shorter than a full suite pass. Additionally a fixed trivial
    // CANARY (in-memory range-sum, no IO, plan compiled once before
    // timing) is timed every `canaryEvery` queries; its series is a
    // machine-load index riding along in the detail file — a flat
    // canary under a regressed query implicates the code, an elevated
    // canary implicates the machine. Cache release between queries is
    // required for hygiene but is NOT part of any query's timed window.
    val baseOrder = selected.toSeq.sortBy(_._1)
    val canaryEvery = 20
    val canaryDf = spark.range(4000000).selectExpr("sum(id * 3 + 1) as s")
    // Each canary sample is the MIN of two back-to-back collects (r13
    // candidate #2): at 10×/20× fixtures the run's OWN GC debt lands on
    // the first post-query canary collect — three clean-dispersion 20×
    // runs all self-flagged via canary p90 ≈ 1.9 over a flat IO canary,
    // and a 16 GiB-heap control reproduced it, so it was allocation
    // debt, not machine load. The first collect pays any accumulated
    // collector debt; the second measures the machine; min keeps the
    // canary a MACHINE-load index at every fixture scale. Sustained
    // external load inflates both collects and still flags (the r12
    // driver run measured 3.06 sustained).
    def minOf2(one: () => Double): Double = math.min(one(), one())
    def canaryTime(): Double = minOf2 { () =>
      val t0 = System.nanoTime()
      canaryDf.collect()
      (System.nanoTime() - t0) / 1e9
    }
    // I/O canary: a one-column scan of a fixed tiny parquet. The CPU
    // canary is blind to filesystem contention (round 8: broad ≥2×
    // inflation on untouched I/O-heavy queries under a flat CPU canary
    // left 18 rows unadjudicated); this one opens the file, parses the
    // footer, and decodes one column every sample, so I/O-side load
    // shows up in ITS series. Plan built once; every collect re-reads
    // the file (parquet scans are not cached).
    val ioCanaryDf = spark.read.parquet(s"$sfDir/nation.parquet")
      .selectExpr("sum(n_nationkey) as s")
    def ioCanaryTime(): Double = minOf2 { () =>
      val t0 = System.nanoTime()
      ioCanaryDf.collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Filesystem WRITE canary — the environment key for sink-heavy
    // queries (VERDICT r17 #4): q_pipeline_e2e's wall time is dominated
    // by temp-dir sink writes, and identical code measured a tight
    // 1.82 s in the driver container vs 3.17 s builder-local — a
    // filesystem property, not a regression. One 256 KiB create +
    // fsync + delete in java.io.tmpdir (where the sinks write), min of
    // 3, measured once per run: the READ canary (ioCanaryDf) can't see
    // write-path differences (page cache absorbs reads on both hosts).
    // Sink-heavy min-basis flags gate only when this canary is
    // like-for-like between base and current run.
    def fsWriteCanary(): Double = {
      val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val buf = new Array[Byte](256 * 1024)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        val f = java.nio.file.Files.createTempFile(dir, "graft_fsc", ".tmp")
        val ch = java.nio.channels.FileChannel.open(f,
          java.nio.file.StandardOpenOption.WRITE)
        try { ch.write(java.nio.ByteBuffer.wrap(buf)); ch.force(true) }
        finally ch.close()
        java.nio.file.Files.delete(f)
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val fsCanary = try fsWriteCanary() catch { case _: Throwable => 0.0 }
    // Small-file METADATA canary (round 20): the fs write canary's one
    // 256 KiB create+fsync+delete is dominated by the fsync and
    // under-reads pure namespace cost — create/rename/delete of many
    // tiny files, the operation mix of the multi-sink pipeline queries
    // (GeoTIFF + zip + JSON sidecars into a temp tree). The r20
    // close-out measured q_pipeline_e2e 1.3-1.5× above band on
    // byte-identical code with the CPU, stage, AND fs canaries all
    // like-for-like (ROUND20_NOTES §9) — this series indexes the one
    // host axis none of them reads. 64 files × (create + 1 KiB write +
    // atomic rename + delete), min of 3, once per run. RECORD-ONLY: no
    // gating factor (the stage-canary arming discipline — commit the
    // series first; normalization can only be armed once a committed
    // base carries a reference median).
    def metaCanary(): Double = {
      val dir = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"))
      val buf = new Array[Byte](1024)
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < 64) {
          val f = java.nio.file.Files.createTempFile(dir, "graft_mc", ".tmp")
          java.nio.file.Files.write(f, buf)
          val g = f.resolveSibling(f.getFileName.toString + ".mv")
          java.nio.file.Files.move(f, g,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
          java.nio.file.Files.delete(g)
          i += 1
        }
        (System.nanoTime() - t0) / 1e9
      }.min
    }
    val metaCanaryMed = try metaCanary() catch { case _: Throwable => 0.0 }
    // MULTI-STAGE canary (VERDICT r18 #4): a fixed-shape 8-stage
    // shuffle chain on constant data. The single-job CPU canary indexes
    // raw compute but under-reads PER-STAGE overhead shifts (task
    // scheduling, shuffle write/read, stage turnaround): the r18 host
    // phase elevated 15–30-stage iterative queries 1.5–1.9× while the
    // CPU canary read 1.07×, and six flags needed a manual old-code A/B
    // to settle (docs/LEVEL_SHIFTS.md). This job IS the canary class
    // those queries resemble. Shape: 8 chained repartition exchanges
    // over 2M constant rows + one final sum — all shuffle machinery, no
    // data growth. A FRESH DataFrame per sample forces fresh RDD
    // lineage (no cross-sample shuffle reuse) while codegen caches by
    // generated source, so samples after the untimed warmup measure the
    // machine, not compilation. Each sample = min of 3 executions
    // (same debt-shedding rationale as minOf2 on the CPU canary).
    def mkStageCanaryDf(): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.{col, lit}
      var df = spark.range(1 << 21)
        .select((col("id") % 65536).as("k"), col("id").as("v"))
      var i = 0
      while (i < 8) { df = df.repartition(col("k") + lit(i)); i += 1 }
      df.selectExpr("sum(v) as s")
    }
    def stageCanaryTime(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      consume(mkStageCanaryDf())
      (System.nanoTime() - t0) / 1e9
    }.min
    // JOB-LAUNCH canary (round 20): N trivial single-task jobs
    // back-to-back — indexes per-job driver/scheduler turnaround, which
    // the stage canary (one 9-stage job) amortizes across its shuffles
    // and the CPU canary (one job per sample) reads only once per
    // sample. Micro-batch streaming drains and multi-sink pipelines
    // launch dozens of tiny jobs per query, so a host phase in job
    // turnaround scales them ~linearly while every other canary stays
    // flat. 16 jobs per sample, min of 3, one sample per pass (rides at
    // pass boundaries beside the stage canary). RECORD-ONLY — same
    // arming discipline as meta_canary.
    val jobCanaryRdd = spark.sparkContext.parallelize(Seq(1), 1)
    def jobCanaryTime(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      var i = 0
      while (i < 16) { jobCanaryRdd.count(); i += 1 }
      (System.nanoTime() - t0) / 1e9
    }.min
    canaryTime(); ioCanaryTime() // untimed compile/JIT of the canary plans
    try stageCanaryTime() catch { case _: Throwable => () } // untimed warmup
    try jobCanaryTime() catch { case _: Throwable => () } // untimed warmup
    val canarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val ioCanarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val stageCanarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val jobCanarySeries = scala.collection.mutable.ArrayBuffer.empty[(Int, Int, Double)]
    val timesBy = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Double]]
    val errBy = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // UNTIMED pass 0 (r15, VERDICT #3): execute every selected query once
    // before any timed pass. Two measurement problems die here. (1) The
    // write-once side stores (BucketedTables postings/bucketed layouts,
    // SideStores round-trip copies, IVF/PQ memo artifacts) are built on
    // first touch, so their build cost used to land inside the pass-1
    // time of whichever family query the shuffle happened to order first
    // — nondeterministic attribution that poisoned that query's minmax.
    // (2) The r14 scale-fixture lesson: a single cold execution can read
    // 3–5× its steady state from codegen/JIT/first-read alone, so
    // 1-pass scale artifacts carried phantom spikes. NOTE the r14
    // warm_total inflation itself was adjudicated NOT to be pass-1
    // builds: reconstructing per-pass times from BENCH_DETAIL minmax
    // vs warm shows the q_bool_retrieval/q_spj_source/q_ann_ivf_probe2
    // spikes sat in passes 2–3 with pass 1 at the median — later-pass
    // load/GC bursts under the driver's load_ratio 1.32, which no
    // prebuild can fix. Pass 0 still makes every timed number a warm
    // number (build-free, JIT-free), so minmax spreads and warm_total
    // become interpretable machine-load evidence instead of a mix of
    // warmup and load. Disable with SPARK_GRAFT_PREBUILD=0 to study
    // cold behavior deliberately. Errors here are ignored — the timed
    // passes record them through the normal err channel.
    if (sys.env.getOrElse("SPARK_GRAFT_PREBUILD", "1") != "0") {
      baseOrder.foreach { case (name, fn) =>
        // still untimed + non-fatal, but never silent: a prebuild OOM
        // or executor loss poisons every timed pass downstream, and an
        // empty catch would leave only timing anomalies as evidence.
        try { consume(fn(spark, sfDir)) } catch {
          case e: Throwable =>
            System.err.println(
              s"[bench] prebuild $name failed: ${e.getClass.getName}")
        }
        graft.queries.QueryCaches.releaseAll(spark)
      }
    }
    for (pass <- 1 to passes) {
      var pos = 0
      // one stage-canary sample per suite pass: heavier than the CPU/IO
      // canaries (8 shuffles), so it rides at pass boundaries rather
      // than every 20 queries — 3 samples across a run span the same
      // wall-clock window the queries do
      try stageCanarySeries += ((pass, 0, stageCanaryTime()))
      catch { case _: Throwable => () }
      try jobCanarySeries += ((pass, 0, jobCanaryTime()))
      catch { case _: Throwable => () }
      // fresh deterministic shuffle per pass: same seed → same order on a
      // re-run of the same pass, different order across passes
      val order = new scala.util.Random(7919L * pass).shuffle(baseOrder)
      order.foreach { case (name, fn) =>
        if (pos % canaryEvery == 0) {
          canarySeries += ((pass, pos, canaryTime()))
          ioCanarySeries += ((pass, pos, ioCanaryTime()))
        }
        val t0 = System.nanoTime()
        val err =
          try { consume(fn(spark, sfDir)); None }
          catch { case e: Throwable =>
            Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
          }
        val dt = (System.nanoTime() - t0) / 1e9
        graft.queries.QueryCaches.releaseAll(spark) // untimed: hygiene, not query cost
        timesBy(name) = timesBy.getOrElse(name, Vector.empty) :+ dt
        err.foreach(e => if (!errBy.contains(name)) errBy(name) = e)
        pos += 1
      }
      canarySeries += ((pass, pos, canaryTime()))
      ioCanarySeries += ((pass, pos, ioCanaryTime()))
    }
    def med(xs: Seq[Double]): Double = {
      val t = xs.sorted
      if (t.size % 2 == 1) t(t.size / 2)
      else (t(t.size / 2 - 1) + t(t.size / 2)) / 2.0
    }
    val results = baseOrder.map { case (name, _) =>
      val runs = timesBy(name)
      val times = runs.sorted
      // warm = median EXCLUDING suite-pass 1, which absorbs this plan's
      // codegen/JIT and (for cache-building queries) the first
      // population of driver-side sketches — the cold/warm gap is the
      // per-query answer to "is this a regression or a warmup cost"
      val warm = if (runs.size > 1) med(runs.drop(1)) else runs.head
      (name, med(runs), warm, times.head, times.last, errBy.get(name))
    }
    def jstr(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
    def qmap(rs: Seq[(String, Double)], prec: String): String =
      rs.map { case (k, v) => "\"" + k + "\":" + prec.format(v) }
        .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, _, _, _, Some(e)) => s"\"" + k + "\":" + jstr(e) }
    val errJson = if (errs.isEmpty) "" else errs.mkString(""","errors":{""", ",", "}")
    val medians = results.map { case (k, med, _, _, _, _) => (k, med) }
    val warms = results.map { case (k, _, warm, _, _, _) => (k, warm) }
    val total = medians.map(_._2).sum
    val warmTotal = warms.map(_._2).sum

    // Full per-query detail → file (too large for the driver's tail capture):
    // medians as the canonical "queries" map (what the next round reads back
    // as `prev`), plus per-query min/max and the regression/improvement maps.
    // Routing (detailName) was decided up top, before the prev read; the
    // WRITE target (always the _LAST sibling; base only on explicit
    // adjudicated promotion) is resolved after the adjudication gate below.
    val minmax = results
      .map { case (k, _, _, mn, mx, _) =>
        s""""$k":[${"%.6f".format(mn)},${"%.6f".format(mx)}]""" }
      .mkString("{", ",", "}")
    // Canary load index: the full [pass, position, sec] series plus a
    // one-number summary per canary. load_ratio = p90/median of the
    // series EXCLUDING the first sample — the first post-warmup sample
    // still carries JIT/page-cache warm-in (round 8: a single 0.246 s
    // first sample over a flat 0.02–0.07 s series reported a false 6.2×
    // max/median alarm), and p90 over max keeps one stray blip from
    // owning the one-number index. ≈1.0 = quiet machine for the whole
    // run; >>1 = load-poisoned windows (the series says WHICH). The CPU
    // canary implicates compute contention, the I/O canary filesystem
    // contention — a regressed query under flat canaries implicates the
    // code.
    def loadIdx(series: Seq[Double]): (Double, Double) = {
      val s = (if (series.size > 2) series.drop(1) else series).sorted
      if (s.isEmpty) (0.0, 1.0)
      else {
        val m = med(s)
        val p90 = s(math.min(s.size - 1, math.ceil(0.9 * s.size).toInt - 1))
        (m, if (m > 0) p90 / m else 1.0)
      }
    }
    def seriesJson(series: Seq[(Int, Int, Double)]): String = series
      .map { case (p, pos, t) => s"[$p,$pos,${"%.4f".format(t)}]" }
      .mkString("[", ",", "]")
    val (canaryMed, loadRatio) = loadIdx(canarySeries.map(_._3).toSeq)
    val (ioCanaryMed, ioLoadRatio) = loadIdx(ioCanarySeries.map(_._3).toSeq)
    val canaryJson = seriesJson(canarySeries.toSeq)
    val ioCanaryJson = seriesJson(ioCanarySeries.toSeq)
    // stage canary: only `passes` samples, so the median is over all of
    // them (its own warmup already ran untimed before pass 1)
    val stageCanaryMed = {
      val s = stageCanarySeries.map(_._3).toSeq
      if (s.isEmpty) 0.0 else med(s)
    }
    val stageCanaryJson = seriesJson(stageCanarySeries.toSeq)
    val jobCanaryMed = {
      val s = jobCanarySeries.map(_._3).toSeq
      if (s.isEmpty) 0.0 else med(s)
    }
    val jobCanaryJson = seriesJson(jobCanarySeries.toSeq)

    // Regression report vs the prior round's base: flag movement ≥30%
    // AND ≥0.3 s — the absolute floor keeps millisecond queries' jitter out.
    def moved(now: Double, before: Double): Boolean =
      math.abs(now - before) >= 0.3 &&
        math.abs(now - before) >= 0.3 * math.min(now, before)
    // REGRESSIONS (r17 rework, VERDICT #1 — end the re-litigation cycle):
    // a gating flag now means "this query exceeded its OWN recorded
    // variance band even after normalizing out the machine-speed shift",
    // not "was a sub-second query on a busy host". Three layers:
    //  (a) BASIS stays min-over-passes vs the base median (r11 verdict
    //      #2): host load inflates medians suite-wide but rarely all
    //      passes of one query.
    //  (b) CANARY NORMALIZATION: the r17 driver run showed the
    //      LEVEL_SHIFTS signature — canary 1.15× over base, median
    //      per-query ratio 1.14× — a uniform machine shift that
    //      min-basis alone cannot remove because it inflates every
    //      pass. This run's min divides by max(1, canary_now/canary_base)
    //      before comparing (only slow-downs normalize; a quieter
    //      machine must not manufacture regressions in the other
    //      direction).
    //  (c) VARIANCE BAND: the normalized min must also exceed the
    //      base run's MAX-over-passes for that query (its own recorded
    //      spread). q_embedding_near_dup / q_dedup_simhash_pairs /
    //      q_retention_cohort were flagged in r16 AND r17 and
    //      adjudicated clean both times — sub-second queries whose
    //      pass-to-pass spread is wider than the 30% rule; their own
    //      band absorbs exactly that.
    // IMPROVEMENTS stay median-based and unnormalized — a lucky fast
    // pass (or hotter base machine) must not claim a win the typical
    // pass doesn't show. Errored queries are excluded from BOTH
    // comparisons, not just the dispersion gate: a fast-fail's min can
    // never flag as a regression (it IS fast), so without this filter a
    // broken query would surface as the round's biggest "improvement" —
    // n_err and the errors map are the only honest channel for it.
    val canaryFactor = (for (p <- prev.canaryMed if p > 0 && canaryMed > 0)
      yield math.max(1.0, canaryMed / p)).getOrElse(1.0)
    // stage factor (VERDICT r18 #4): the same max(1, now/base) rule as
    // the CPU factor, measured on the 8-stage shuffle chain. Gating
    // normalizes by max(canaryFactor, stageFactor): a genuine ≥30%-
    // above-band code regression survives division by a measured
    // fixed-job host factor, while the r18-style per-stage host phase
    // (stage canary 1.5×, CPU canary 1.07×) stops manufacturing flags
    // that only an old-code A/B could clear. Rows a canary-only rule
    // WOULD have flagged ride along under "regressions_stage_env" so
    // the absorption is visible, never silent. The A/B protocol
    // (docs/LEVEL_SHIFTS.md) stays as escalation for flags surviving
    // both factors.
    val stageFactor = (for (p <- prev.stageCanaryMed if p > 0 && stageCanaryMed > 0)
      yield math.max(1.0, stageCanaryMed / p)).getOrElse(1.0)
    val normFactor = math.max(canaryFactor, stageFactor)
    // sink-heavy rows compare like-for-like only: fs write-canary moved
    // >1.5× in either direction ⇒ different storage environment
    val crossEnv = (for (p <- prev.fsCanary if p > 0 && fsCanary > 0)
      yield fsCanary / p > 1.5 || p / fsCanary > 1.5).getOrElse(false)
    val ok = results.collect { case (k, med, _, mn, _, None) => (k, med, mn) }
    val compared = ok.flatMap { case (k, now, _) => prev.med.get(k).map(p => (k, now, p)) }
    val banded = ok.flatMap { case (k, _, mn) =>
      prev.med.get(k).map { p =>
        val normMin = mn / normFactor
        val cpuMin = mn / canaryFactor
        val band = math.max(p, prev.max.getOrElse(k, p))
        (k, normMin, cpuMin, p, band)
      }
    }
    val regressedAll = banded.collect {
      case (k, normMin, _, p, band) if normMin > band && moved(normMin, p) =>
        (k, normMin, p)
    }
    // visibility for the stage-factor absorption: rows the canary-only
    // rule would flag but the stage factor clears (advisory, non-gating)
    val regressedStageEnv = banded.collect {
      case (k, normMin, cpuMin, p, band)
          if !(normMin > band && moved(normMin, p)) &&
            cpuMin > band && moved(cpuMin, p) =>
        (k, cpuMin, p)
    }
    val (regressedEnv, regressed) =
      regressedAll.partition { case (k, _, _) => crossEnv && SinkHeavy(k) }
    val improved  = compared.filter { case (_, now, p) => now < p && moved(now, p) }
    // ADVISORY median-basis list (r12 ADVICE): the min basis filters
    // load-inflated false positives but is blind to a regression whose
    // best pass stays fast while warm passes got slower (cache/GC
    // behavior). The median comparison rides along under its own key —
    // visible, but never the gating "regressions"/"n_regressed" signal,
    // so it can't re-manufacture the r11 false-positive storm.
    val regressedMed = compared.filter { case (_, now, p) => now > p && moved(now, p) }
    def deltaMap(xs: Seq[(String, Double, Double)]): String =
      xs.sortBy { case (_, now, p) => -(now - p).abs }
        .map { case (k, now, p) =>
          s""""$k":{"prev":${"%.3f".format(p)},"now":${"%.3f".format(now)},"ratio":${"%.2f".format(now / math.max(p, 1e-9))}}""" }
        .mkString("{", ",", "}")
    // HARD GATE (round-10 verdict: two consecutive closeout benches were
    // recorded under machine load and their regression lists wasted a round
    // each to adjudicate). The load indicator is per-query DISPERSION — the
    // share of queries (above a 50 ms noise floor) whose median sits >2×
    // their own fastest pass. Sustained load poisons whole passes, so the
    // poisoned run's medians detach from their minima suite-wide (round 10:
    // 3.9% of queries over the 2× line — exactly its 8 weak rows — vs 0.5%
    // on a controlled run of identical code). The canary p90/median rides
    // along as a secondary signal but only gates at 1.5: with ~36 samples a
    // single in-canary GC pause jerks the p90 (a quiet run measured 1.34
    // while a genuinely poisoned one measured 1.21 — it cannot carry the
    // gate alone). A flagged run is NOT a citable measurement: both JSON
    // outputs carry "unadjudicated": true and a loud stderr banner, and its
    // numbers must never be committed as a regression base or quoted as a
    // round-over-round delta.
    // errored queries are excluded: a fast-fail's med/min ratio is not a
    // load signal and would dilute/skew the gate when n_err > 0 (ADVICE r11)
    val dispRatios = results.collect {
      case (_, med, _, mn, _, None) if mn > 0.05 => med / mn }
    val dispFrac2 =
      if (dispRatios.isEmpty) 0.0
      else dispRatios.count(_ > 2.0).toDouble / dispRatios.size
    val unadjudicated = dispFrac2 > 0.02 || loadRatio > 1.5 || ioLoadRatio > 1.5
    if (unadjudicated) System.err.println(
      f"[bench] UNADJUDICATED RUN: disp_frac2=$dispFrac2%.3f (gate 0.02) " +
        f"load_ratio=$loadRatio%.2f io_load_ratio=$ioLoadRatio%.2f (gate 1.5) " +
        "— machine was not quiet; re-run before citing these numbers")
    // the measurement basis rides in every artifact (r16 break lesson):
    // a future round diffing two files with different "basis" values is
    // comparing across the count()→toRdd break and must stop
    val unadjJson =
      s""""unadjudicated":$unadjudicated,"basis":"toRdd","disp_frac2":${"%.4f".format(dispFrac2)},"""
    // Write routing: always the _LAST sibling; the committed base name
    // only on explicit adjudicated promotion (detailRoutes scaladoc).
    val promote = sys.env.getOrElse("SPARK_GRAFT_PROMOTE_BASE", "0") == "1"
    val (lastName, promotedName) = detailRoutes(detailName, promote, unadjudicated)
    if (promote && promotedName.isEmpty) System.err.println(
      "[bench] PROMOTION REFUSED: run is unadjudicated — the committed " +
        s"base $detailName stays untouched; re-run on a quiet window")
    val detailPath = new java.io.File(lastName).getAbsolutePath
    val detail =
      s"""{"metric":"total","value":$total,"unit":"sec",$unadjJson"warm_total":${"%.3f".format(warmTotal)},"passes":$passes,"queries":${qmap(medians, "%.6f")},"warm":${qmap(warms, "%.6f")},"minmax":$minmax,"canary":$canaryJson,"canary_med":${"%.4f".format(canaryMed)},"load_ratio":${"%.2f".format(loadRatio)},"io_canary":$ioCanaryJson,"io_canary_med":${"%.4f".format(ioCanaryMed)},"io_load_ratio":${"%.2f".format(ioLoadRatio)},"fs_canary":${"%.5f".format(fsCanary)},"meta_canary":${"%.5f".format(metaCanaryMed)},"stage_canary":$stageCanaryJson,"stage_canary_med":${"%.4f".format(stageCanaryMed)},"job_canary":$jobCanaryJson,"job_canary_med":${"%.4f".format(jobCanaryMed)},"canary_factor":${"%.3f".format(canaryFactor)},"stage_factor":${"%.3f".format(stageFactor)},"cross_env":$crossEnv,"regression_basis":"norm_min_vs_prev_band","regressions":${deltaMap(regressed)},"regressions_cross_env":${deltaMap(regressedEnv)},"regressions_stage_env":${deltaMap(regressedStageEnv)},"regressions_median":${deltaMap(regressedMed)},"improvements":${deltaMap(improved)},"n_compared":${compared.size},"n_err":${errs.size}$errJson,"sf":"$sfDir"}"""
    val w = new java.io.PrintWriter(detailPath, "UTF-8")
    try w.println(detail) finally w.close()
    promotedName.foreach { n =>
      val p = new java.io.PrintWriter(new java.io.File(n).getAbsolutePath, "UTF-8")
      try p.println(detail) finally p.close()
      System.err.println(s"[bench] promoted this adjudicated run to base $n")
    }

    // Compact summary line (fits the tail): total of per-query medians over
    // ALL queries + a fixed headline subset of per-query medians.
    val hl = medians.filter { case (k, _) => headline.contains(k) }
    println(s"""{"metric":"total","value":${"%.3f".format(total)},"unit":"sec",$unadjJson"warm_total":${"%.3f".format(warmTotal)},"n_queries":${results.size},"passes":$passes,"queries":${qmap(hl, "%.3f")},"n_err":${errs.size},"n_regressed":${regressed.size},"n_improved":${improved.size},"canary_med":${"%.4f".format(canaryMed)},"load_ratio":${"%.2f".format(loadRatio)},"io_canary_med":${"%.4f".format(ioCanaryMed)},"io_load_ratio":${"%.2f".format(ioLoadRatio)},"fs_canary":${"%.5f".format(fsCanary)},"meta_canary":${"%.5f".format(metaCanaryMed)},"stage_canary_med":${"%.4f".format(stageCanaryMed)},"job_canary_med":${"%.4f".format(jobCanaryMed)},"canary_factor":${"%.3f".format(canaryFactor)},"stage_factor":${"%.3f".format(stageFactor)},"detail":"$detailPath","sf":"$sfDir"}""")
    spark.stop()
  }
}
