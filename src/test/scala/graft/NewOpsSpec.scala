package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, EventQueries, RelationalQueries, SimilarityQueries, TextQueries}

/** Semantics checks for the round-2 operator batch, independent of the
  * DuckDB oracle (which checks cross-engine equality, not meaning).
  */
class NewOpsSpec extends SparkSpecBase {

  test("as-of join: every matched click precedes or equals its purchase") {
    val rows = EventQueries.queries("q_asof_join")(spark, sf)
      .filter(col("asof_click_id").isNotNull)
      .select("gap_s").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getLong(0) >= 0L))
  }

  test("phrase index: persisted-index probe equals the scan-shaped search") {
    // the equivalence claim behind sharing one oracle SQL: the bucketed
    // positional index changes the plan, not the answer
    try {
      val scan = TextQueries.queries("q_phrase_search")(spark, sf).collect()
      val idx = TextQueries.queries("q_phrase_index")(spark, sf).collect()
      assert(scan.nonEmpty)
      assert(idx.map(_.toString).toSeq == scan.map(_.toString).toSeq)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("proximity index: gaps are within the window and pairs are positive") {
    try {
      val rows = TextQueries.queries("q_proximity_index")(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_pairs") >= 1L)
        val gap = r.getAs[Long]("min_gap")
        assert(gap >= 1L && gap <= 3L, s"min_gap $gap outside (0, 3]")
      }
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("budget select: selection covers the half-token budget minimally") {
    try {
      val rows = TextQueries.queries("q_budget_select")(spark, sf).collect()
      assert(rows.nonEmpty)
      val selected = rows.map(_.getAs[Long]("sel_tokens")).sum
      val cutoff = rows.head.getAs[Long]("cutoff_q")
      import org.apache.spark.sql.functions._
      val byScore = spark.read.parquet(s"$sf/documents.parquet")
        .select(expr("size(split(text, ' '))").cast("bigint").as("toks"),
          expr("size(filter(split(text, ' '), " +
            "t -> t IN ('the','a','of','and','in')))").cast("bigint").as("nstop"))
        .withColumn("q", expr("nstop * 10000 div toks"))
        .groupBy("q").agg(sum(col("toks")).as("t"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val total = byScore.values.sum
      // defining property: at-or-above-cutoff covers the budget, and
      // the cutoff is minimal — excluding the boundary score drops
      // the selection below budget
      assert(selected >= total / 2,
        s"selected $selected < budget ${total / 2}")
      assert(selected - byScore(cutoff) < total / 2,
        "cutoff is not minimal: the boundary score isn't needed")
      assert(selected == byScore.filter(_._1 >= cutoff).values.sum,
        "selection must be exactly the at-or-above-cutoff mass")
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("phrase rank: tf agrees with the counting probe; scores rank-order") {
    try {
      val ranked = TextQueries.queries("q_phrase_rank")(spark, sf).collect()
      val counted = TextQueries.queries("q_phrase_index")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_occurrences")).toMap
      assert(ranked.nonEmpty)
      // same phrase, so each ranked doc's tf must equal its raw count
      ranked.foreach { r =>
        val (id, tf) = (r.getLong(0), r.getAs[Long]("tf"))
        assert(counted.get(id).forall(_ == tf), s"doc $id tf $tf vs count")
        assert(r.getAs[Long]("score") > 0L)
      }
      // BM25 length normalization is the point: scores must be
      // non-increasing in output order, and not a pure tf order
      val scores = ranked.map(_.getAs[Long]("score"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("budget select: degenerate (empty) corpus returns the empty frame") {
    // same graceful-empty contract as the index probes (r13 ADVICE):
    // null token sum / zero total must not throw in the driver-side
    // cutoff computation
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-budget-empty").toString
    spark.read.parquet(s"$sf/documents.parquet").limit(0)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    try {
      val out = TextQueries.queries("q_budget_select")(spark, dir)
      assert(out.columns.toSeq ==
        Seq("source", "n_selected", "sel_tokens", "cutoff_q"))
      assert(out.count() === 0L)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("index compaction: the new generation's probe equals the live index's") {
    try {
      val compacted = TextQueries.queries("q_index_compact")(spark, sf).collect()
      val live = TextQueries.queries("q_phrase_index")(spark, sf).collect()
      assert(compacted.nonEmpty)
      // gen-2 = base ∪ delta = exactly the full corpus, so the probe
      // must be row-identical with the single-generation index's
      assert(compacted.map(_.toString).toSeq == live.map(_.toString).toSeq)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("incremental index: segment-union probe equals a direct full-corpus count") {
    try {
      val inc = TextQueries.queries("q_index_incremental")(spark, sf).collect()
      assert(inc.nonEmpty)
      val phrase = inc.head.getAs[String]("phrase")
      // reference: doc-local bigram filter over the WHOLE corpus — the
      // main+delta split must be invisible in the answer
      import org.apache.spark.sql.functions._
      val expected = spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), explode(expr(
          """transform(slice(w, 1, greatest(size(w) - 1, 0)),
            |  (x, i) -> concat(x, ' ', element_at(w, i + 2)))""".stripMargin)).as("bg"))
        .filter(col("bg") === phrase)
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("doc_id")).limit(20)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val got = inc.map(r => (r.getLong(0), r.getAs[Long]("n_occurrences"))).toSeq
      assert(got == expected, s"segment union diverged:\n$got\nvs\n$expected")
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("zipf fit: negative slope over a non-degenerate level histogram") {
    try {
      val r = TextQueries.queries("q_zipf_fit")(spark, sf).collect()
      assert(r.length == 1)
      assert(r(0).getAs[Long]("n_vocab") > 100L)
      assert(r(0).getAs[Long]("n_levels") >= 3L,
        "bigram counts must span several log2 levels or the fit is degenerate")
      assert(r(0).getAs[Double]("slope") < 0.0,
        "more-frequent grams are rarer: the cumulative curve must fall")
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("classifier score: threshold splits the corpus nontrivially") {
    val rows = TextQueries.queries("q_classifier_score")(spark, sf).collect()
    assert(rows.nonEmpty)
    val kept = rows.count(_.getAs[Boolean]("kept"))
    // weights average ~100 so scores concentrate around 10⁶; a fixture
    // where the threshold keeps everything (or nothing) would mean the
    // decision column is dead weight
    assert(kept > 0 && kept < rows.length,
      s"kept $kept of ${rows.length} — threshold must discriminate")
    rows.foreach { r =>
      val sc = r.getAs[Long]("score_pm")
      assert(sc >= 0L && sc <= 2000000L, s"score $sc outside weight range")
    }
  }

  test("kmv intersect: estimates are bounded and the rc feeds overlap") {
    try {
      val rows = RelationalQueries.queries("q_kmv_intersect")(spark, sf).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val j = r.getAs[Double]("j_est")
        assert(j >= 0.0 && j <= 1.0)
        assert(r.getAs[Double]("inter_est") >= 0.0)
        assert(r.getAs[Long]("k_used") >= 1L && r.getAs[Long]("k_used") <= 16L)
      }
      // a re-crawl feed is a strict subset of its base source, so the
      // exact overlap is positive and the sketch detects at least some
      // of the rc pairs (rc minima are base hashes by construction)
      val rc = rows.filter(r => r.getString(1) == r.getString(0) + "-rc")
      assert(rc.nonEmpty)
      assert(rc.forall(_.getAs[Long]("n_shared_exact") > 0L))
      assert(rc.exists(_.getAs[Double]("j_est") > 0.0),
        "sketch must detect overlap on at least one rc pair")
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("keep-best survivor: longest member wins, ties break to min id") {
    val rows = DedupQueries.queries("q_dedup_keep_best")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("survivor_toks") >= r.getAs[Long]("min_toks"))
      assert(r.getAs[Long]("n_members") >= 2L)
    }
    // the +1M near-copies extend their base's text, so clusters where a
    // near-copy is the longest member must elect it — the policy is
    // demonstrably NOT min-id (base docs can also share a prefix and
    // win on length; that's fine, but at least one near-copy must win)
    assert(rows.exists { r =>
      val s = r.getAs[Long]("survivor_id"); s >= 1000000L && s < 2000000L
    }, "fixture must demonstrate a near-copy (non-min-id) survivor")
  }

  test("span dedup: exact copies are fully covered; spans are disjoint unions") {
    val rows = DedupQueries.queries("q_span_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // injected exact copies (doc_id + 2,000,000) repeat every 5-gram of
    // their source, so coverage must be the whole doc — cov_pm = 10000
    val copies = byId.keys.filter(_ >= 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      assert(byId(id).getAs[Long]("cov_pm") == 10000L,
        s"exact copy $id covered ${byId(id).getAs[Long]("cov_pm")}")
    }
    // islands are disjoint by construction: the union never exceeds
    // the doc (cov_pm ≤ 10000), the longest span never exceeds the
    // union, and every reported doc has at least one span
    rows.foreach { r =>
      val (rep, mx) = (r.getAs[Long]("rep_toks"), r.getAs[Long]("max_span_toks"))
      assert(mx >= 5L && mx <= rep && r.getAs[Long]("n_spans") >= 1L)
      assert(r.getAs[Long]("cov_pm") <= 10000L)
    }
  }

  test("span dedup: the 64-bit shingle rekey is injective on the fixture " +
      "corpus (collision-bound backing)") {
    // The q_span_dedup shuffle key is xxhash64(shingle), not the
    // ~40-byte shingle string; the correctness argument at the rekey
    // site (DedupQueries) is a birthday bound — P[any collision] ≈
    // n²/2⁶⁵ ≈ 7·10⁻⁹ at the fixture's ~5·10⁵ distinct shingles.
    // This spec pins the empirical half of that argument: on the
    // deterministic fixture corpus the hash is exactly injective
    // (distinct hashes == distinct shingle strings), so every gate
    // run compares the hash-keyed engine against the string-keyed
    // DuckDB oracle on genuinely collision-free inputs. If a future
    // fixture regeneration ever introduced a collision, this fails
    // loudly instead of surfacing as an unexplained oracle mismatch.
    val k = 5
    val counts = graft.text.Corpus.withDuplicates(spark, sf)
      .select(split(col("text"), " ").as("w"))
      .select(explode(expr(
        s"""transform(slice(w, 1, greatest(size(w) - ${k - 1}, 0)),
           |  (x, i) -> concat_ws(' ', x, element_at(w, i + 2),
           |    element_at(w, i + 3), element_at(w, i + 4),
           |    element_at(w, i + 5)))""".stripMargin)).as("sh"))
      .agg(countDistinct(col("sh")).as("n_str"),
        countDistinct(xxhash64(col("sh"))).as("n_hash"))
      .head()
    assert(counts.getAs[Long]("n_str") === counts.getAs[Long]("n_hash"),
      "xxhash64 must be collision-free on the fixture shingle set")
    assert(counts.getAs[Long]("n_str") > 10000L,
      "fixture must exercise a non-trivial shingle population")
  }

  test("span dedup: agrees with a brute-force interval union on random corpora") {
    // seeded random corpora over a tiny vocabulary (dense cross-doc
    // 5-gram collisions — far more island-merge edge cases than the
    // fixture), checked doc-by-doc against a direct reference: mark
    // every token covered by a shingle that occurs in >1 document,
    // then read off the union size, run count, and longest run
    import spark.implicits._
    for (seed <- Seq(11, 29, 47)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
      val block = Vector.fill(8)(vocab(rnd.nextInt(vocab.size)))
      val docs = (0L until 24L).map { i =>
        val own = Vector.fill(15 + rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
        val toksV =
          if (i % 3 == 0) own.take(5) ++ block ++ own.drop(5) else own
        (i, toksV.mkString(" "))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft-span-$seed").toString
      docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // reference over the SAME withDuplicates expansion the query uses
      val corpus = docs ++
        docs.filter(_._1 % 4 == 0).map { case (id, t) => (id + 2000000L, t) } ++
        docs.filter(_._1 % 3 == 0).map { case (id, t) => (id + 1000000L, t + " zzz tail") }
      val tokenized = corpus.map { case (id, t) => id -> t.split(" ").toVector }
      val shingleDocs = scala.collection.mutable.Map.empty[String, Set[Long]]
      tokenized.foreach { case (id, w) =>
        w.sliding(5).filter(_.size == 5).foreach { g =>
          val k = g.mkString(" ")
          shingleDocs(k) = shingleDocs.getOrElse(k, Set.empty) + id
        }
      }
      val expected = tokenized.flatMap { case (id, w) =>
        val marked = Array.fill(w.size)(false)
        w.sliding(5).zipWithIndex.filter(_._1.size == 5).foreach { case (g, p) =>
          if (shingleDocs(g.mkString(" ")).size > 1)
            (p until p + 5).foreach(marked(_) = true)
        }
        val rep = marked.count(identity)
        if (rep == 0) None
        else {
          val runs = scala.collection.mutable.ArrayBuffer.empty[Int]
          var cur = 0
          marked.foreach { m =>
            if (m) cur += 1 else { if (cur > 0) runs += cur; cur = 0 }
          }
          if (cur > 0) runs += cur
          Some(id -> (runs.size.toLong, runs.max.toLong, rep.toLong,
            rep.toLong * 10000 / w.size))
        }
      }.toMap
      val got = DedupQueries.queries("q_span_dedup")(spark, dir).collect()
        .map(r => r.getLong(0) -> (r.getAs[Long]("n_spans"),
          r.getAs[Long]("max_span_toks"), r.getAs[Long]("rep_toks"),
          r.getAs[Long]("cov_pm"))).toMap
      assert(got == expected,
        s"seed $seed: diff keys ${(got.keySet diff expected.keySet) ++ (expected.keySet diff got.keySet)}; " +
          s"mismatches ${expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(5)}")
    }
  }

  test("paragraph dedup: exact copies lose every chunk, originals keep all") {
    val rows = DedupQueries.queries("q_paragraph_dedup")(spark, sf).collect()
    val byId = rows.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_chunks"), r.getAs[Long]("n_kept"))).toMap
    // injected exact copies (doc_id + 2,000,000) duplicate every chunk
    // of their source, which sorts first — so the copy keeps nothing;
    // originals may still lose the odd chunk to a cross-doc collision
    // with a lower doc_id (that's the operator working, not a bug)
    val copies = byId.keys.filter(_ >= 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      assert(byId(id)._2 == 0L, s"exact copy $id kept ${byId(id)._2} chunks")
    }
    val originals = byId.keys.filter(_ < 1000000L)
    assert(originals.exists(id => byId(id)._2 == byId(id)._1),
      "at least some originals should keep all their chunks")
  }

  test("as-of join: purchases with no prior click carry nulls") {
    // the earliest purchase of at least one user should precede any click
    val df = EventQueries.queries("q_asof_join")(spark, sf)
    val total = df.count()
    val matched = df.filter(col("asof_click_id").isNotNull).count()
    assert(total > 0 && matched <= total)
  }

  test("connected components: labels equal the closed-form chain root") {
    val got = DedupQueries.queries("q_dedup_cluster")(spark, sf)
    // every cluster's min_id must equal its label, and chain clusters
    // have ≤ 4 members with contiguous ids
    val bad = got.filter(col("cluster_id") =!= col("min_id")).count()
    assert(bad === 0)
    val chains = got.filter(col("n_nodes") > 1)
    assert(chains.filter(col("n_nodes") > 4).count() === 0)
    assert(chains.filter(col("max_id") - col("min_id") =!= col("n_nodes") - 1).count() === 0)
    assert(chains.count() > 0)
  }

  test("range join via buckets equals the plain interval predicate") {
    val got = RelationalQueries.queries("q_range_join")(spark, sf).collect()
    val parts = spark.read.parquet(s"$sf/part.parquet")
    val bands = Seq(("low", 900.0, 930.0), ("mid", 920.0, 960.0), ("high", 950.0, 1000.0))
    val expected = bands.map { case (name, lo, hi) =>
      name -> parts.filter(col("p_retailprice") >= lo && col("p_retailprice") < hi).count()
    }.toMap
    got.foreach { r =>
      assert(r.getLong(r.fieldIndex("n_parts")) === expected(r.getString(0)))
    }
  }

  test("stratified sample rates track the per-stratum thresholds") {
    val rows = RelationalQueries.queries("q_stratified_sample")(spark, sf).collect()
    val expect = Map("A" -> 64.0 / 256, "N" -> 32.0 / 256, "R" -> 128.0 / 256)
    rows.foreach { r =>
      val flag = r.getString(0)
      val rate = r.getDouble(r.fieldIndex("sample_rate"))
      assert(math.abs(rate - expect(flag)) < 0.08, s"$flag rate $rate")
    }
  }

  test("int8 quantization bounds: |q| <= 127 and scale hits 127 somewhere") {
    val df = SimilarityQueries.queries("q_embedding_quantize")(spark, sf)
    // n_large counts |q| >= 100; every vector's max|q| is exactly 127
    // (the max-abs element quantizes to ±127), so n_large >= 1
    assert(df.filter(col("n_large") < 1).count() === 0)
    assert(df.count() > 0)
  }

  test("chunking covers every token with stride-10 windows") {
    val chunks = TextQueries.queries("q_chunk_tokens")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_toks"))
    // chunk count per doc = ceil(n_toks / 10), since starts are 0,10,…,< n
    val got = chunks.groupBy("doc_id").agg(count(lit(1)).as("n_chunks"))
      .join(docs, "doc_id")
      .filter(col("n_chunks") =!= ceil(col("n_toks") / lit(10.0)).cast("long"))
    assert(got.count() === 0)
  }

  test("pii redaction removes every email and phone") {
    val df = TextQueries.queries("q_pii_redact")(spark, sf)
    assert(df.count() > 0)
    val leaked = df.filter(col("redacted").rlike("[a-z0-9]+@[a-z0-9.]+") ||
      col("redacted").rlike("[+][0-9]{2}-[0-9]{2}-[0-9]{7}"))
    assert(leaked.count() === 0)
    assert(df.filter(!col("redacted").contains("[EMAIL]") ||
      !col("redacted").contains("[PHONE]")).count() === 0)
  }

  test("bool retrieval matches a brute-force evaluation of t1 AND t2 AND NOT t3") {
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => r.getLong(0) -> r.getString(1).split(" ").toSeq).toMap
      // the same derivation as the query, brute-forced in Scala: top-2
      // by (occurrences desc, term), NOT term = argmin |2·df − nd|
      val occ = docs.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val df = docs.values.flatMap(_.distinct).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      val nd = docs.size.toLong
      val ranked = occ.toSeq.sortBy { case (t, n) => (-n, t) }
      val (t1, t2) = (ranked(0)._1, ranked(1)._1)
      val t3 = df.toSeq.filterNot(kv => kv._1 == t1 || kv._1 == t2)
        .sortBy { case (t, d) => (math.abs(2 * d - nd), t) }.head._1
      val expected = docs.toSeq
        .map { case (id, ws) =>
          (id, ws.count(_ == t1).toLong, ws.count(_ == t2).toLong, ws.contains(t3)) }
        .filter { case (_, a, b, has3) => a > 0 && b > 0 && !has3 }
        .map { case (id, a, b, _) => (id, a, b) }
        .sortBy(_._1)
      val got = TextQueries.queries("q_bool_retrieval")(spark, sf).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got == expected)
      assert(got.nonEmpty, "fixture should satisfy the conjunction somewhere")
      // the NOT arm must discriminate: some doc has t1 AND t2 but ALSO t3
      val excluded = docs.count { case (_, ws) =>
        ws.contains(t1) && ws.contains(t2) && ws.contains(t3) }
      assert(excluded > 0, "NOT term should exclude at least one AND-match")
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("html extract recovers the exact synthetic page arithmetic") {
    val textToks = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("nt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = TextQueries.queries("q_html_extract")(spark, sf).collect()
    assert(rows.length == textToks.size)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      // chrome = 1 title token + 2-token anchors ×3(doc_id%7) + 2 footer
      val anchors = 2L * 3L * (id % 7)
      assert(r.getAs[Long]("anchor_toks") === anchors)
      assert(r.getAs[Long]("page_toks") === textToks(id) + 1 + anchors + 2)
      assert(r.getAs[Long]("density_pm") ===
        anchors * 10000 / r.getAs[Long]("page_toks"))
    }
    // both classes must occur, or the density rule isn't discriminating
    assert(rows.exists(_.getAs[Long]("is_content") == 1L))
    assert(rows.exists(_.getAs[Long]("is_content") == 0L))
  }

  test("shard balance: serpentine max/min match brute force and beat mod-hash") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ")).cast("long").as("toks"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = d.groupBy(_._2).map { case (src, docs) =>
      val ranked = docs.sortBy { case (id, _, t) => (-t, id) }
      val serp = ranked.zipWithIndex.groupBy { case (_, rk) =>
        if ((rk / 8) % 2 == 0) rk % 8 else 7 - rk % 8 }
        .map { case (_, xs) => xs.map(_._1._3).sum }
      val naive = docs.groupBy(_._1 % 8).map { case (_, xs) => xs.map(_._3).sum }
      src -> (serp.max, serp.min, naive.max, naive.min)
    }
    val rows = TextQueries.queries("q_shard_balance")(spark, sf).collect()
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (sMax, sMin, mMax, mMin) = expected(r.getAs[String]("source"))
      assert(r.getAs[Long]("serp_max") === sMax)
      assert(r.getAs[Long]("serp_min") === sMin)
      assert(r.getAs[Long]("mod_max") === mMax)
      assert(r.getAs[Long]("mod_min") === mMin)
    }
    // the policy's point, in aggregate: size-ranked serpentine dealing
    // spreads tighter than id-hash on this fixture
    val serpAvg = rows.map(_.getAs[Long]("serp_spread_pm")).sum / rows.length
    val modAvg = rows.map(_.getAs[Long]("mod_spread_pm")).sum / rows.length
    assert(serpAvg < modAvg,
      s"serpentine spread $serpAvg should beat mod-hash $modAvg")
  }

  test("schema evolution: blended read equals the per-generation recomputation") {
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("doc_id") % 3 === 0, 1L).otherwise(0L)).as("n_legacy"),
        sum(when(col("doc_id") % 3 === 0, 0L)
          .otherwise(col("n_chars") % 97)).as("quality_sum"),
        sum(col("n_chars")).as("chars_sum"))
      .orderBy("source").collect().map(_.toString).toSeq
    val got = graft.queries.EtlQueries.queries("q_schema_evolution")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got == direct)
    assert(got.nonEmpty)
  }

  test("scene cuts match a byte-level brute force of the 64-byte frame kernel") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).getBytes("UTF-8"))
    val expected = docs.map { case (id, bytes) =>
      val lumas = bytes.grouped(64).map(_.foldLeft(0L)((a, b) => a + (b & 0xff))).toVector
      val deltas = lumas.zip(lumas.drop(1)).map { case (a, b) => math.abs(b - a) }
      val cuts = deltas.zipWithIndex.filter(_._1 > 500)
      id -> (lumas.size.toLong, cuts.size.toLong,
        if (deltas.isEmpty) 0L else deltas.max,
        cuts.headOption.map(_._2 + 1L).getOrElse(-1L))
    }.toMap
    val got = graft.queries.MultimodalQueries.queries("q_scene_cuts")(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getAs[Long]("n_frames"),
        r.getAs[Long]("n_cuts"), r.getAs[Long]("max_delta"),
        r.getAs[Long]("first_cut"))).toMap
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("snapshot diff classification matches the arithmetic ground truth") {
    val direct = spark.read.parquet(s"$sf/documents.parquet")
      .select(col("source"),
        when(col("doc_id") % 5 === 0, "removed")
          .when(col("doc_id") % 5 === 4, "added")
          .when(col("doc_id") % 7 === 0 &&
            (col("n_chars") + col("doc_id")) % 97 =!= col("n_chars") % 97,
            "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status").agg(count(lit(1)).as("n_docs"))
      .orderBy("source", "status").collect().map(_.toString).toSeq
    val got = graft.queries.EtlQueries.queries("q_snapshot_diff")(spark, sf)
      .collect().map(_.toString).toSeq
    assert(got == direct)
    // all four classes must occur, or the diff is degenerate here
    val statuses = graft.queries.EtlQueries.queries("q_snapshot_diff")(spark, sf)
      .select("status").distinct().collect().map(_.getString(0)).toSet
    assert(statuses == Set("added", "removed", "changed", "unchanged"),
      s"expected all four classes, got $statuses")
  }

  test("seasonality: hourly index matches a per-type brute force") {
    val evs = spark.read.parquet(s"$sf/events.parquet")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byTypeHour = evs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val totals = evs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val got = EventQueries.queries("q_seasonality")(spark, sf).collect()
    assert(got.length === byTypeHour.size)
    got.foreach { r =>
      val t = r.getAs[String]("event_type")
      val n = r.getAs[Long]("n")
      assert(n === byTypeHour((t, r.getAs[Long]("hr"))))
      // non-negative operands: Long / truncation == floor div
      assert(r.getAs[Long]("idx_pt") === n * 24 * 1000 / totals(t))
    }
  }

  test("fk audit: clean load has zero orphans; the stale snapshot surfaces exactly the mod-97 children") {
    val rows = RelationalQueries.queries("q_fk_audit")(spark, sf).collect()
    assert(rows.length === 3)
    rows.foreach { r =>
      assert(r.getAs[Long]("orph_full") === 0L, r.getAs[String]("fk"))
      assert(r.getAs[Long]("orph_stale") > 0L, r.getAs[String]("fk"))
    }
    // full orphans are 0 ⇒ every FK value exists ⇒ stale orphans are
    // exactly the children whose FK is ≡ 0 mod 97
    def staleOf(table: String, fk: String): Long =
      spark.read.parquet(s"$sf/$table.parquet").filter(col(fk) % 97 === 0).count()
    val byFk = rows.map(r => r.getAs[String]("fk") -> r).toMap
    assert(byFk("orders.o_custkey->customer").getAs[Long]("orph_stale")
      === staleOf("orders", "o_custkey"))
    assert(byFk("lineitem.l_partkey->part").getAs[Long]("orph_stale")
      === staleOf("lineitem", "l_partkey"))
    assert(byFk("lineitem.l_suppkey->supplier").getAs[Long]("orph_stale")
      === staleOf("lineitem", "l_suppkey"))
  }

  test("frequent itemsets: supports and lift match an in-memory Apriori") {
    try {
      val brand = spark.read.parquet(s"$sf/part.parquet")
        .select("p_partkey", "p_brand").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val bi = spark.read.parquet(s"$sf/lineitem.parquet")
        .select("l_orderkey", "l_partkey").collect()
        .map(r => (r.getLong(0), brand(r.getLong(1)))).distinct
      val nBaskets = bi.map(_._1).distinct.length.toLong
      val minsup = nBaskets / 50
      val freq = bi.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
        .filter(_._2 >= minsup)
      val pairSup = bi.groupBy(_._1).values.toSeq.flatMap { items =>
        val its = items.map(_._2).filter(freq.contains).sorted
        for (i <- its.indices; j <- (i + 1) until its.length)
          yield (its(i), its(j))
      }.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
        .filter(_._2 >= minsup)
      val expected = pairSup.toSeq.map { case ((a, b), sup) =>
        (a, b, sup, sup * nBaskets * 10000L / (freq(a) * freq(b)))
      }.sortBy { case (a, b, sup, _) => (-sup, a, b) }.take(20)
      val got = RelationalQueries.queries("q_freq_itemsets")(spark, sf)
        .collect().map(r => (r.getAs[String]("item1"), r.getAs[String]("item2"),
          r.getAs[Long]("pair_support"), r.getAs[Long]("lift_pmyr"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("collocations: PMI ratio matches an in-memory bigram count") {
    try {
      val texts = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").collect().map(_.getString(0))
      val bgs = texts.flatMap { t =>
        val w = t.split(" ", -1); w.zip(w.drop(1))
      }
      val c = bgs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val cx = bgs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val cy = bgs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
      val nb = bgs.length.toLong
      val expected = c.toSeq.filter(_._2 >= 5).map { case ((x, y), cxy) =>
        (s"$x $y",
          math.floor((cxy * nb).toDouble / (cx(x) * cy(y)).toDouble * 1000000.0).toLong)
      }.sortBy { case (bg, r) => (-r, bg) }.take(20)
      val got = TextQueries.queries("q_collocations")(spark, sf).collect()
        .map(r => (r.getAs[String]("bigram"), r.getAs[Long]("ratio_pm"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("skip-grams: weighted co-occurrence matches an in-memory window walk") {
    val texts = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    val prs = texts.flatMap { t =>
      val w = t.split(" ", -1)
      w.indices.flatMap { i =>
        Seq((i + 1, 2L), (i + 2, 1L)).collect {
          case (j, wt) if j < w.length => ((w(i), w(j)), wt)
        }
      }
    }
    val expected = prs.groupBy(_._1).map { case ((a, b), v) =>
      (a, b, v.length.toLong, v.map(_._2).sum)
    }.toSeq.sortBy { case (a, b, _, w2x) => (-w2x, a, b) }.take(20)
    val got = TextQueries.queries("q_skipgram")(spark, sf).collect()
      .map(r => (r.getAs[String]("w1"), r.getAs[String]("w2"),
        r.getAs[Long]("n_cooc"), r.getAs[Long]("w2x"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("changepoint: CUSUM argmax matches an in-memory series walk") {
    val evs = graft.sources.EventSource.batch(spark, sf)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = evs.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.groupBy(_._2).map { case (d, v) => d -> v.length.toLong }
        .toSeq.sortBy(_._1)
      val n = xs.length.toLong
      val tot = xs.map(_._2).sum
      var pre = 0L
      val ss = xs.zipWithIndex.map { case ((d, x), idx) =>
        pre += x; (d, idx + 1L, pre, math.abs(n * pre - (idx + 1L) * tot))
      }
      // earliest-day tie-break: first row (day-ordered) carrying the max
      val maxS = ss.map(_._4).max
      val (d, i, p, peak) = ss.find(_._4 == maxS).get
      tpe -> (n, tot, d, peak, p * 1000 / i,
        if (n - i == 0) None else Some((tot - p) * 1000 / (n - i)))
    }
    val got = EventQueries.queries("q_changepoint")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, tot, d, peak, mb, ma) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") === n)
      assert(r.getAs[Long]("total") === tot)
      assert(r.getAs[String]("cp_day") === d)
      assert(r.getAs[Long]("cusum_peak") === peak)
      assert(r.getAs[Long]("mean_before_pt") === mb)
      assert(Option(r.getAs[Any]("mean_after_pt")).map(_.asInstanceOf[Long]) === ma)
    }
  }

  test("chi-square independence: cell terms and total match an in-memory contingency") {
    try {
      val rows = spark.read.parquet(s"$sf/documents.parquet")
        .select("source", "lang").collect()
        .map(r => (r.getString(0), r.getString(1)))
      val o = rows.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val rt = rows.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
      val ct = rows.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
      val nn = rows.length.toLong
      val chi = o.map { case ((s0, l0), obs) =>
        val d = (obs * nn - rt(s0) * ct(l0)).toDouble
        (s0, l0) -> math.floor(
          d * d / (nn.toDouble * rt(s0).toDouble * ct(l0).toDouble) * 1000).toLong
      }
      val total = chi.values.sum
      val got = TextQueries.queries("q_chisq_independence")(spark, sf).collect()
      assert(got.length === o.size)
      got.foreach { r =>
        val k = (r.getAs[String]("source"), r.getAs[String]("lang"))
        assert(r.getAs[Long]("o") === o(k))
        assert(r.getAs[Long]("e_pt") === rt(k._1) * ct(k._2) * 1000 / nn)
        assert(r.getAs[Long]("chi_pt") === chi(k))
        assert(r.getAs[Long]("chi2_total_pt") === total)
        assert(r.getAs[Long]("dof") ===
          (rt.size.toLong - 1) * (ct.size.toLong - 1))
      }
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("confusion matrix: cells and metrics match an in-memory scorer") {
    def md5hex(t: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(t.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val stop = Set("the", "a", "of", "and", "in")
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect().map(_.getString(0))
    var (tp, fp, fn, tn) = (0L, 0L, 0L, 0L)
    docs.foreach { text =>
      val w = text.split(" ", -1)
      val truth = w.count(stop).toLong * 10000 / w.length >= 500
      val wsum = w.map { t =>
        val b = java.lang.Long.parseLong(md5hex(t).take(4), 16) % 256
        b * 37 % 201
      }.sum
      val pred = wsum * 10000 / w.length >= 1000000L
      (truth, pred) match {
        case (true, true)   => tp += 1
        case (false, true)  => fp += 1
        case (true, false)  => fn += 1
        case (false, false) => tn += 1
      }
    }
    val r = TextQueries.queries("q_confusion_matrix")(spark, sf).collect().head
    assert(r.getAs[Long]("tp") === tp)
    assert(r.getAs[Long]("fp") === fp)
    assert(r.getAs[Long]("fn") === fn)
    assert(r.getAs[Long]("tn") === tn)
    // all four cells populated — the eval is non-degenerate by construction
    assert(tp > 0 && fp > 0 && fn > 0 && tn > 0)
    assert(r.getAs[Long]("prec_pt") === tp * 1000 / (tp + fp))
    assert(r.getAs[Long]("rec_pt") === tp * 1000 / (tp + fn))
    assert(r.getAs[Long]("f1_pt") === 2 * tp * 1000 / (2 * tp + fp + fn))
    assert(r.getAs[Long]("acc_pt") === (tp + tn) * 1000 / (tp + tn + fp + fn))
  }

  test("sequential patterns: user support matches an in-memory journey walk") {
    val evs = graft.sources.EventSource.batch(spark, sf)
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime * 1000, r.getLong(2),
        r.getString(3)))
    val journeys = evs.groupBy(_._1).map { case (u, rows) =>
      u -> rows.sortBy(r => (r._2, r._3)).map(_._4).toSeq
    }
    val nUsers = journeys.size.toLong
    val support = journeys.values.toSeq
      .flatMap(tps => tps.zip(tps.drop(1)).map { case (a, b) => s"$a>$b" }.distinct)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      .filter(_._2 * 4 >= nUsers)
    val got = EventQueries.queries("q_seq_patterns")(spark, sf).collect()
    assert(got.length === support.size)
    got.foreach { r =>
      val p = r.getAs[String]("pattern")
      assert(r.getAs[Long]("support") === support(p))
      assert(r.getAs[Long]("support_pm") === support(p) * 1000 / nUsers)
    }
  }

  test("rolling median: 7-day lower median matches an in-memory slide") {
    val daily = graft.sources.EventSource.batch(spark, sf)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).flatMap { case (tpe, rows) =>
      val xs = rows.sortBy(_._2)
      xs.indices.map { i =>
        val win = xs.slice(math.max(0, i - 6), i + 1).map(_._3).sorted
        val med = win((win.length + 1) / 2 - 1)
        (tpe, xs(i)._2) -> (xs(i)._3, med, xs(i)._3 * 1000 / med)
      }
    }
    val got = EventQueries.queries("q_rolling_median")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (x, med, ratio) = expected(
        (r.getAs[String]("event_type"), r.getAs[String]("day")))
      assert(r.getAs[Long]("x") === x)
      assert(r.getAs[Long]("med7") === med)
      assert(r.getAs[Long]("ratio_pm") === ratio)
    }
  }

  test("sparse knn: rare-bigram dot products match an in-memory index") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val tf = docs.flatMap { case (id, text) =>
      val w = text.split(" ", -1)
      w.zip(w.drop(1)).map { case (a, b) => ((id, s"$a $b"), 1L) }
    }.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val nd = docs.length.toLong
    val df = tf.keys.groupBy(_._2).map { case (t, v) => t -> v.size.toLong }
    val idf = df.filter { case (_, d) =>
      d >= 2 && d <= math.min(math.max(nd / 100, 5L), 100L) }
      .map { case (t, d) =>
        t -> java.lang.Long.toBinaryString(
          (2 * nd - 2 * d + 1) * 1048576 / (2 * d + 1)).length.toLong
      }
    val post = tf.collect { case ((id, t), f) if idf.contains(t) =>
      (t, id, f * idf(t))
    }.toSeq
    val pairs = post.groupBy(_._1).values.flatMap { ps =>
      val sorted = ps.sortBy(_._2)
      for (i <- sorted.indices; j <- (i + 1) until sorted.length)
        yield ((sorted(i)._2, sorted(j)._2), sorted(i)._3 * sorted(j)._3)
    }.groupBy(_._1).map { case (k, v) => k -> (v.size.toLong, v.map(_._2).sum) }
    val expected = pairs.toSeq.map { case ((a, b), (n, d)) => (a, b, n, d) }
      .sortBy { case (a, b, _, d) => (-d, a, b) }.take(20)
    val got = TextQueries.queries("q_sparse_knn")(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("n_shared"), r.getAs[Long]("dot"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("survival curve: risk sets and hazards match an in-memory KM table") {
    val pu = graft.sources.EventSource.batch(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2)))
      .groupBy(_._1)
    val users = pu.values.toSeq.flatMap { rows =>
      val su = rows.filter(_._2 == "signup").map(_._3).sortBy(_.getTime)
        .headOption
      su.map { s0 =>
        def day(t: java.sql.Timestamp): Long =
          java.time.LocalDateTime.ofInstant(t.toInstant,
            java.time.ZoneOffset.UTC).toLocalDate.toEpochDay
        val fp = rows.filter(_._2 == "purchase").map(_._3)
          .sortBy(_.getTime).headOption
        // engine condition is fp >= su at TIMESTAMP grain; the day
        // difference is then taken at date grain
        val tte = fp.filter(_.compareTo(s0) >= 0)
          .map(f => day(f) - day(s0))
        val ct = day(rows.map(_._3).maxBy(_.getTime)) - day(s0)
        (tte, ct)
      }
    }
    val nUsers = users.length.toLong
    val byDay = users.groupBy { case (tte, ct) => tte.getOrElse(ct) }
      .toSeq.sortBy(_._1)
      .map { case (d, v) => (d, v.count(_._1.isDefined).toLong, v.length.toLong) }
    var exited = 0L; var cum = 0L
    val expected = byDay.map { case (d, ev, ex) =>
      val atRisk = nUsers - exited
      exited += ex; cum += ev
      (d, atRisk, ev, ex - ev, ev * 1000 / atRisk, cum, cum * 1000 / nUsers)
    }
    val got = EventQueries.queries("q_survival_curve")(spark, sf).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("at_risk"),
        r.getAs[Long]("n_events"), r.getAs[Long]("n_censored"),
        r.getAs[Long]("hazard_pm"), r.getAs[Long]("cum_conv"),
        r.getAs[Long]("conv_pm"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("graph jaccard: open-wedge scores match an in-memory neighbor index") {
    try {
      val ids = spark.read.parquet(s"$sf/customer.parquet")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      val fwd = for (c <- ids.toSeq; k <- 1 to 3; if ids(c + k))
        yield (c, c + k)
      val nbrs = (fwd ++ fwd.map(_.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val edgeSet = fwd.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      val cand = scala.collection.mutable.Map[(Long, Long), Long]()
      nbrs.values.foreach { ns =>
        val sorted = ns.toSeq.sorted
        for (i <- sorted.indices; j <- (i + 1) until sorted.length)
          cand((sorted(i), sorted(j))) = cand.getOrElse(
            (sorted(i), sorted(j)), 0L) + 1
      }
      val expected = cand.toSeq.collect {
        case ((u, v), common) if !edgeSet((u, v)) =>
          val union = nbrs(u).size + nbrs(v).size - common
          (u, v, common, common * 1000 / union)
      }.sortBy { case (u, v, _, j) => (-j, u, v) }.take(20)
      val got = DedupQueries.queries("q_graph_jaccard")(spark, sf).collect()
        .map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
          r.getAs[Long]("common"), r.getAs[Long]("jaccard_pm"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("autocorrelation: floor-mean ACF matches an in-memory series") {
    val daily = graft.sources.EventSource.batch(spark, sf)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).flatMap { case (tpe, rows) =>
      val xs = rows.sortBy(_._2).map(_._3)
      val mean = xs.sum / xs.length
      val dv = xs.map(_ - mean)
      val den = dv.map(d => d * d).sum
      (1 to 3).map { k =>
        val num = dv.dropRight(k).zip(dv.drop(k)).map { case (a, b) => a * b }.sum
        (tpe, k.toLong) -> (num, den,
          BigDecimal(num.toDouble / den.toDouble)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
    }
    val got = EventQueries.queries("q_autocorrelation")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (num, den, acf) = expected(
        (r.getAs[String]("event_type"), r.getAs[Long]("lag_k")))
      assert(r.getAs[Long]("num") === num)
      assert(r.getAs[Long]("den") === den)
      assert(r.getAs[Double]("acf") === acf)
    }
    // non-degenerate: at least one lag must show real signal (|acf| > 0)
    assert(got.exists(r => math.abs(r.getAs[Double]("acf")) > 0.0))
  }

  test("growth accounting: DAU decomposition matches an in-memory grid walk") {
    val ud = graft.sources.EventSource.batch(spark, sf)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).cast("bigint").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byUser = ud.groupBy(_._1).map { case (u, v) => u -> v.map(_._2).sorted }
    val cls = byUser.values.flatMap { ds =>
      ds.zipWithIndex.map { case (d, i) =>
        val st = if (i == 0) "new"
          else if (ds(i - 1) == d - 1) "retained" else "resurrected"
        (d, st)
      }
    }.toSeq
    val days = cls.groupBy(_._1).toSeq.sortBy(_._1).map { case (d, v) =>
      (d, v.length.toLong, v.count(_._2 == "new").toLong,
        v.count(_._2 == "retained").toLong,
        v.count(_._2 == "resurrected").toLong)
    }
    val expected = days.zipWithIndex.map { case ((d, dau, nw, rt, rs), i) =>
      val churned = (if (i == 0) 0L else days(i - 1)._2) - rt
      (d, dau, nw, rt, rs, churned)
    }
    val got = EventQueries.queries("q_growth_accounting")(spark, sf).collect()
      .map(r => (r.getAs[Long]("d"), r.getAs[Long]("dau"),
        r.getAs[Long]("n_new"), r.getAs[Long]("n_retained"),
        r.getAs[Long]("n_resurrected"), r.getAs[Long]("n_churned"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
    // conservation: every DAU row decomposes exactly
    got.foreach { case (_, dau, nw, rt, rs, _) => assert(dau === nw + rt + rs) }
  }

  test("rolling distinct: WAU equals the brute-force per-day window scan") {
    val ud = graft.sources.EventSource.batch(spark, sf)
      .select(col("user_id"),
        datediff(date_trunc("day", col("ts")).cast("date"),
          lit("1970-01-01").cast("date")).cast("bigint").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val dmax = ud.map(_._2).max
    val expected = (ud.map(_._2).min to dmax).map { day =>
      day -> ud.filter { case (_, d) => d <= day && d >= day - 6 }
        .map(_._1).distinct.length.toLong
    }.filter(_._2 > 0).toMap
    val got = EventQueries.queries("q_rolling_distinct")(spark, sf).collect()
      .map(r => r.getAs[Long]("day") -> r.getAs[Long]("wau")).toMap
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("keyword rake: phrase scores match an in-memory RAKE pass") {
    try {
      val stop = Set("the", "a", "of", "and", "in")
      val texts = spark.read.parquet(s"$sf/documents.parquet")
        .select("text").collect().map(_.getString(0))
      // segment exactly: maximal stopword-free token runs
      val phrases = texts.flatMap { t =>
        val out = scala.collection.mutable.ArrayBuffer[Vector[String]]()
        var cur = Vector.empty[String]
        t.split(" ", -1).foreach { w =>
          if (stop(w)) { if (cur.nonEmpty) out += cur; cur = Vector.empty }
          else if (w.nonEmpty) cur = cur :+ w
        }
        if (cur.nonEmpty) out += cur
        out.filter(_.length <= 4)
      }
      val freq = phrases.flatten.groupBy(identity)
        .map { case (w, v) => w -> v.length.toLong }
      val deg = phrases.flatMap(p => p.map(w => w -> p.length.toLong))
        .groupBy(_._1).map { case (w, v) => w -> v.map(_._2).sum }
      val wscore = freq.map { case (w, f) => w -> deg(w) * 1000 / f }
      val expected = phrases.map(p => p.mkString(" "))
        .groupBy(identity).map { case (ph, v) => (ph, v.length.toLong) }
        .filter(_._2 >= 2)
        .map { case (ph, sup) =>
          (ph, sup, ph.split(" ").map(wscore).sum)
        }.toSeq.sortBy { case (ph, _, sc) => (-sc, ph) }.take(20)
      val got = TextQueries.queries("q_keyword_rake")(spark, sf).collect()
        .map(r => (r.getAs[String]("phrase"), r.getAs[Long]("support"),
          r.getAs[Long]("score_pm"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("ma crossover: flips match an in-memory two-window walk") {
    val daily = graft.sources.EventSource.batch(spark, sf)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val expected = daily.groupBy(_._1).toSeq.flatMap { case (tpe, rows) =>
      val xs = rows.sortBy(_._2)
      val above = xs.indices.map { i =>
        val s3 = xs.slice(math.max(0, i - 2), i + 1).map(_._3).sum
        val s7 = xs.slice(math.max(0, i - 6), i + 1).map(_._3).sum
        (xs(i)._2, s3 * 7, s7 * 3, s3 * 7 > s7 * 3)
      }
      above.zipWithIndex.drop(7).collect {
        case ((d, a, b, fa), i) if above(i - 1)._4 != fa =>
          (tpe, d, a, b, if (fa) "golden" else "death")
      }
    }.sortBy(t => (t._1, t._2))
    val got = EventQueries.queries("q_ma_crossover")(spark, sf).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[String]("day"),
        r.getAs[Long]("s3x7"), r.getAs[Long]("s7x3"),
        r.getAs[String]("direction"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("overdispersion: the Fano factor matches the two-moment arithmetic") {
    val daily = graft.sources.EventSource.batch(spark, sf)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(2)))
    val expected = daily.groupBy(_._1).map { case (tpe, rows) =>
      val xs = rows.map(_._2)
      val n = xs.length.toLong; val s = xs.sum; val q = xs.map(x => x * x).sum
      tpe -> (n, s, (n * q - s * s) * 1000 / (n * s))
    }
    val got = EventQueries.queries("q_overdispersion")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, s, vmr) = expected(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_days") === n)
      assert(r.getAs[Long]("total") === s)
      assert(r.getAs[Long]("vmr_pm") === vmr)
      val verdict = if (vmr > 1200) "overdispersed"
        else if (vmr < 800) "underdispersed" else "poisson-like"
      assert(r.getAs[String]("verdict") === verdict)
    }
  }

  test("join size estimation: exact pair counts match the histogram identity") {
    def md5hex4(v: Long): Char = java.security.MessageDigest
      .getInstance("MD5").digest(v.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.charAt(3)
    def expected(keys: Seq[Long], label: String) = {
      val h = keys.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val exact = h.values.map(c => c * c).sum
      val sampledKeys = h.filter { case (k, _) => md5hex4(k) == '0' }
      val est = sampledKeys.values.map(c => c * c).sum * 16
      (label, h.size.toLong, sampledKeys.size.toLong, exact, est,
        math.abs(est - exact) * 1000 / exact)
    }
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_partkey").collect().map(_.getLong(0)).toSeq
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey").collect().map(_.getLong(0)).toSeq
    val exp = Seq(expected(li, "lineitem.l_partkey self-join"),
      expected(ord, "orders.o_custkey self-join")).sortBy(_._1)
    val got = RelationalQueries.queries("q_join_size_est")(spark, sf).collect()
      .map(r => (r.getAs[String]("edge"), r.getAs[Long]("n_keys"),
        r.getAs[Long]("n_sampled"), r.getAs[Long]("exact_pairs"),
        r.getAs[Long]("est_pairs"), r.getAs[Long]("err_pm"))).toSeq
    assert(got === exp)
    // the exact count really is the join size: cross-check one edge
    val joinSize = li.groupBy(identity).map { case (_, v) =>
      v.length.toLong * v.length }.sum
    assert(exp.head._4 === joinSize)
  }

  test("topk merge: pruning-error witnesses match an in-memory merge") {
    try {
      val rows = spark.read.parquet(s"$sf/documents.parquet")
        .select("source", "text").collect()
        .flatMap(r => r.getString(1).split(" ").filter(_.nonEmpty)
          .map(t => (r.getString(0), t)))
      val tc = rows.groupBy(identity).map { case ((s0, t), v) =>
        (s0, t) -> v.length.toLong }
      val localTop = tc.groupBy(_._1._1).values.flatMap { m =>
        m.toSeq.sortBy { case ((_, t), c) => (-c, t) }.take(5).map(_._1._2)
      }.toSet
      val global = tc.groupBy(_._1._2).map { case (t, v) =>
        t -> v.values.sum }
      val exp = global.toSeq.sortBy { case (t, n) => (-n, t) }.take(10)
        .map { case (t, n) => (t, n, localTop(t)) }
      val got = TextQueries.queries("q_topk_merge")(spark, sf).collect()
        .map(r => (r.getAs[String]("tok"), r.getAs[Long]("n"),
          r.getAs[Boolean]("in_merged"))).toSeq
      assert(got === exp)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("bitemporal: the two-snapshot pick matches an in-memory version walk") {
    val custs = spark.read.parquet(s"$sf/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        dayofmonth(col("o_orderdate")).cast("long").as("od")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // Independent ground truth: an explicit argmax over (vf, tx)
    // returning seg — deliberately NOT the engine's packed-integer
    // formula, so a packing bug (e.g. the r14 vf·30 stride that bled
    // vf into the %8 extraction) fails here instead of being
    // replicated.
    def pick(ck: Long, od: Long, txMax: Long): Long = {
      val cands = (0L to 2L).filter(_ <= txMax).flatMap { k =>
        val vf = (ck * 7 + k * 11) % 20 + 1
        if (vf <= od) Some(((vf, k), (ck + k) % 5)) else None
      }
      if (cands.isEmpty) -1L else cands.maxBy(_._1)._2
    }
    val perOrder = orders.filter(o => custs(o._2)).map { case (ok, ck, od) =>
      (pick(ck, od, 1), pick(ck, od, 2), ok)
    }
    val expected = perOrder.groupBy(p => (p._1, p._2)).map { case (k, v) =>
      k -> (v.length.toLong, v.map(_._3).min, v.map(_._3).max)
    }
    val got = RelationalQueries.queries("q_bitemporal")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, mn, mx) = expected(
        (r.getAs[Long]("seg_t1"), r.getAs[Long]("seg_t2")))
      assert(r.getAs[Long]("n_orders") === n)
      assert(r.getAs[Long]("min_ok") === mn)
      assert(r.getAs[Long]("max_ok") === mx)
    }
    // the bitemporal point: the late correction must CHANGE some cells
    assert(got.exists(r =>
      r.getAs[Long]("seg_t1") !== r.getAs[Long]("seg_t2")))
  }

  test("apportionment: exact seats, conservation, and largest-remainder order") {
    try {
      val rows = RelationalQueries.queries("q_apportionment")(spark, sf)
        .collect()
      assert(rows.map(_.getAs[Long]("seats")).sum === 1000L,
        "Hare quota must allocate exactly 1000 seats")
      val counts = spark.read.parquet(s"$sf/documents.parquet")
        .groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val nn = counts.values.sum
      rows.foreach { r =>
        val n = counts(r.getAs[String]("source"))
        assert(r.getAs[Long]("base_seats") === n * 1000 / nn)
        assert(r.getAs[Long]("rem") === n * 1000 % nn)
        assert(r.getAs[Long]("seats") ===
          r.getAs[Long]("base_seats") + r.getAs[Long]("extra"))
      }
      // every extra seat went to a remainder ≥ any non-winner's
      val winners = rows.filter(_.getAs[Long]("extra") === 1L)
        .map(_.getAs[Long]("rem"))
      val losers = rows.filter(_.getAs[Long]("extra") === 0L)
        .map(_.getAs[Long]("rem"))
      if (winners.nonEmpty && losers.nonEmpty)
        assert(winners.min >= losers.max)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("benford: digit counts and deviations match an in-memory audit") {
    val bf = Map('1' -> 301L, '2' -> 176L, '3' -> 125L, '4' -> 97L,
      '5' -> 79L, '6' -> 67L, '7' -> 58L, '8' -> 51L, '9' -> 46L)
    val vals = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_totalprice").collect().map(_.getDouble(0))
    val counts = vals.map(v => math.floor(v).toLong.toString.head)
      .groupBy(identity).map { case (d, v) => d -> v.length.toLong }
    val nn = counts.values.sum
    val dev = counts.map { case (d, n) =>
      d -> (n, n * 1000 / nn, math.abs(n * 1000 / nn - bf(d)))
    }
    val totalDev = dev.values.map(_._3).sum
    val got = RelationalQueries.queries("q_benford")(spark, sf).collect()
    assert(got.length === counts.size)
    got.foreach { r =>
      val d = r.getAs[String]("digit").head
      val (n, obs, dv) = dev(d)
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("obs_pm") === obs)
      assert(r.getAs[Long]("exp_pm") === bf(d))
      assert(r.getAs[Long]("dev_pm") === dv)
      assert(r.getAs[Long]("total_dev_pm") === totalDev)
    }
  }

  test("late orders: priority rates match an in-memory exists walk") {
    val lines = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"),
        (datediff(col("l_shipdate").cast("date"),
          col("o_orderdate").cast("date")) > 21).as("late"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    val perOrder = lines.groupBy(l => (l._1, l._2))
      .map { case (k, v) => k -> v.exists(_._3) }
    val expected = perOrder.groupBy(_._1._2).map { case (p, v) =>
      val n = v.size.toLong; val late = v.count(_._2).toLong
      p -> (n, late, late * 1000 / n)
    }
    val got = RelationalQueries.queries("q_late_orders")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, late, pm) = expected(r.getAs[String]("o_orderpriority"))
      assert(r.getAs[Long]("n_orders") === n)
      assert(r.getAs[Long]("n_late") === late)
      assert(r.getAs[Long]("late_pm") === pm)
    }
    assert(got.map(_.getAs[Long]("n_late")).sum > 0)
  }

  test("blame supplier: sole-late-supplier counts match the Q21 semantics") {
    try {
      val lines = spark.read.parquet(s"$sf/lineitem.parquet")
        .join(spark.read.parquet(s"$sf/orders.parquet"),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (datediff(col("l_shipdate").cast("date"),
            col("o_orderdate").cast("date")) > 21).as("late"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      val os = lines.groupBy(l => (l._1, l._2))
        .map { case (k, v) => k -> v.exists(_._3) }
      val blame = os.groupBy(_._1._1).values.toSeq.flatMap { m =>
        val lateSupp = m.filter(_._2).keys.map(_._2).toSeq
        if (m.size >= 2 && lateSupp.length == 1) lateSupp else Nil
      }.groupBy(identity).map { case (s0, v) => s0 -> v.length.toLong }
      val names = spark.read.parquet(s"$sf/supplier.parquet")
        .select("s_suppkey", "s_name").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val expected = blame.toSeq
        .sortBy { case (s0, n) => (-n, s0) }.take(20)
        .map { case (s0, n) => (s0, names(s0), n) }
      val got = RelationalQueries.queries("q_blame_supplier")(spark, sf)
        .collect().map(r => (r.getAs[Long]("s_suppkey"),
          r.getAs[String]("s_name"), r.getAs[Long]("n_blamed"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("graph hits: two exact iterations match an in-memory adjacency walk") {
    try {
      val ids = spark.read.parquet(s"$sf/customer.parquet")
        .select("c_custkey").collect().map(_.getLong(0)).toSet
      val edges = for (u <- ids.toSeq; k <- 1 to 3; if ids(u + k))
        yield (u, u + k)
      val a1 = edges.groupBy(_._2).map { case (v, e) => v -> e.length.toLong }
      val h1 = edges.groupBy(_._1).map { case (u, e) =>
        u -> e.map(x => a1(x._2)).sum }
      val a2 = edges.filter(e => h1.contains(e._1)).groupBy(_._2)
        .map { case (v, e) => v -> e.map(x => h1(x._1)).sum }
      val mx = a2.values.max
      val expected = a2.toSeq.sortBy { case (v, a) => (-a, v) }.take(20)
        .map { case (v, a) =>
          (v, a1(v), h1.getOrElse(v, 0L), a, a * 1000 / mx) }
      val got = DedupQueries.queries("q_graph_hits")(spark, sf).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[Long]("indeg"),
          r.getAs[Long]("hub"), r.getAs[Long]("auth"),
          r.getAs[Long]("auth_pm"))).toSeq
      assert(got.nonEmpty)
      assert(got === expected)
    } finally graft.queries.QueryCaches.releaseAll(spark)
  }

  test("weighted median: half-cover order statistic matches an in-memory walk") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("q"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = rows.groupBy(_._1).map { case (f, v) =>
      val byQty = v.groupBy(_._2).map { case (q, e) => q -> e.map(_._3).sum }
        .toSeq.sortBy(_._1)
      val tw = byQty.map(_._2).sum
      var cum = 0L
      val (q, c) = byQty.iterator.map { case (q, w) =>
        cum += w; (q, cum)
      }.find(_._2 * 2 >= tw).get
      f -> (q, c, tw, c * 1000 / tw)
    }
    val got = RelationalQueries.queries("q_weighted_median")(spark, sf)
      .collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (q, c, tw, pm) = expected(r.getAs[String]("l_returnflag"))
      assert(r.getAs[Long]("wmedian_qty") === q)
      assert(r.getAs[Long]("cum_cents") === c)
      assert(r.getAs[Long]("total_cents") === tw)
      assert(r.getAs[Long]("cover_pm") === pm)
    }
  }

  test("abandonment: the windowed not-exists matches a per-user scan") {
    val evs = graft.sources.EventSource.batch(spark, sf)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("unix_micros(ts)").as("us"), col("ts").cast("long").as("es"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4), r.getString(5)))
    val byUser = evs.groupBy(_._1)
    val views = byUser.values.flatMap { rows =>
      val purchases = rows.filter(_._3 == "purchase")
      rows.filter(_._3 == "view").map { v =>
        // the engine's frame: (ts, event_id) at-or-after the view, at
        // full timestamp precision; the 1-hour test then runs on
        // truncated epoch seconds (the cast-to-long semantics)
        val next = purchases.filter(p =>
          p._4 > v._4 || (p._4 == v._4 && p._2 >= v._2))
        val abandoned = next.isEmpty ||
          next.minBy(_._4)._5 - v._5 > 3600
        (v._6, abandoned)
      }
    }.toSeq
    val expected = views.groupBy(_._1).map { case (d, v) =>
      val n = v.length.toLong; val a = v.count(_._2).toLong
      d -> (n, a, a * 1000 / n)
    }
    val got = EventQueries.queries("q_abandonment")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, a, pm) = expected(r.getAs[String]("day"))
      assert(r.getAs[Long]("n_views") === n)
      assert(r.getAs[Long]("n_abandoned") === a)
      assert(r.getAs[Long]("abandon_pm") === pm)
    }
    // both outcomes must occur or the fixture exercises only one path
    assert(views.exists(_._2) && views.exists(!_._2))
  }

  test("price index: two-step integer ratio matches an in-memory ledger") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(year(col("l_shipdate")).cast("long").as("yr"),
        expr("CAST(floor(l_extendedprice * 100) AS BIGINT)").as("c"),
        col("l_quantity").cast("long").as("q"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val yearly = rows.groupBy(_._1).map { case (y, v) =>
      (y, v.map(_._2).sum, v.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val up = yearly.map { case (y, c, q) => (y, c, q, c * 1000 / q) }
    val up0 = up.head._4
    val expected = up.map { case (y, c, q, u) => (y, c, q, u, u * 1000 / up0) }
    val got = RelationalQueries.queries("q_price_index")(spark, sf).collect()
      .map(r => (r.getAs[Long]("yr"), r.getAs[Long]("cents"),
        r.getAs[Long]("qty"), r.getAs[Long]("up_mc"),
        r.getAs[Long]("index_pm"))).toSeq
    assert(got === expected)
    assert(got.head._5 === 1000L, "base year indexes to exactly 1000")
  }

  test("revenue pareto: log2-bucket cumulative shares match an in-memory ledger") {
    val perCust = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_custkey"),
        expr("CAST(floor(o_totalprice * 100) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
    val buckets = perCust.values.groupBy(c =>
        java.lang.Long.toBinaryString(c).length.toLong)
      .map { case (b, v) => (b, v.size.toLong, v.sum) }
      .toSeq.sortBy(-_._1)
    val nc = buckets.map(_._2).sum; val tc = buckets.map(_._3).sum
    var (cc, cr) = (0L, 0L)
    val expected = buckets.map { case (b, n, c) =>
      cc += n; cr += c
      (b, n, c, cc * 1000 / nc, cr * 1000 / tc)
    }
    val got = RelationalQueries.queries("q_revenue_pareto")(spark, sf)
      .collect().map(r => (r.getAs[Long]("bucket_bits"),
        r.getAs[Long]("n_customers"), r.getAs[Long]("cents"),
        r.getAs[Long]("cum_customers_pm"), r.getAs[Long]("cum_revenue_pm")))
      .toSeq
    assert(got === expected)
    // concentration is real: the top bucket's revenue share must exceed
    // its customer share
    assert(got.head._5 > got.head._4)
  }

  test("token burstiness: cf/df statistics match an in-memory count table") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val dt = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).map(tok => (id, tok))
    }.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val m = dt.groupBy(_._1._2).map { case (tok, v) =>
      val cf = v.values.sum; val df = v.size.toLong
      val rep = v.values.count(_ >= 2).toLong
      (tok, cf, df, cf * 1000 / df, rep * 1000 / df)
    }.filter(_._3 >= 10)
    val expected = m.toSeq.sortBy { case (t, _, _, b, _) => (-b, t) }.take(20)
    val got = TextQueries.queries("q_token_burstiness")(spark, sf).collect()
      .map(r => (r.getAs[String]("tok"), r.getAs[Long]("cf"),
        r.getAs[Long]("df"), r.getAs[Long]("burst_pm"),
        r.getAs[Long]("repeat_pm"))).toSeq
    assert(got.nonEmpty)
    assert(got === expected)
  }

  test("interarrival: day-bounded gap histogram matches an in-memory walk") {
    val evs = graft.sources.EventSource.batch(spark, sf)
      .select(col("event_type"),
        date_trunc("day", col("ts")).cast("date").cast("string").as("day"),
        col("ts").cast("long").as("es"),
        expr("unix_micros(ts)").as("us"), col("event_id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val gaps = evs.groupBy(e => (e._1, e._2)).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._5))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._1, b._3 - a._3) }
    }.toSeq
    val expected = gaps.groupBy { case (t, g) =>
      (t, java.lang.Long.toBinaryString(math.max(g, 1L)).length.toLong)
    }.map { case (k, v) =>
      val gs = v.map(_._2)
      k -> (gs.length.toLong, gs.min, gs.max, gs.sum / gs.length)
    }
    val got = EventQueries.queries("q_interarrival")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, mn, mx, mean) = expected(
        (r.getAs[String]("event_type"), r.getAs[Long]("gap_bits")))
      assert(r.getAs[Long]("n") === n)
      assert(r.getAs[Long]("min_gap") === mn)
      assert(r.getAs[Long]("max_gap") === mx)
      assert(r.getAs[Long]("mean_gap") === mean)
    }
  }

  test("z-order key interleaves bits: zkey reconstructs gx and gy") {
    val rows = graft.queries.GeoQueries.queries("q_zorder_key")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gx = r.getLong(r.fieldIndex("gx"))
      val gy = r.getLong(r.fieldIndex("gy"))
      val z = r.getLong(r.fieldIndex("zkey"))
      var (rx, ry) = (0L, 0L)
      var j = 0
      while (j < 16) {
        rx |= ((z >> (2 * j)) & 1L) << j
        ry |= ((z >> (2 * j + 1)) & 1L) << j
        j += 1
      }
      assert(rx === gx && ry === gy)
    }
  }
}
