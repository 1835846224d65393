package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, MultimodalQueries, RelationalQueries,
  SimilarityQueries, TextQueries}

/** Round-15 operators, each checked against an independent in-memory
  * reference (never a replica of the engine's own plan): interval
  * concurrency vs a per-day brute-force count, Good–Turing vs direct
  * count-of-counts, CDC chunking vs a Scala reimplementation plus the
  * shift-invariance property that MOTIVATES content-defined chunking,
  * audio VAD vs a byte-level walk, centroid drift vs BigInt/BigDecimal
  * arithmetic.
  */
class Round15OpsSpec extends SparkSpecBase {

  test("interval concurrency: peak matches a per-day brute-force count") {
    val custNat = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natName = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val iv = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(datediff(o_orderdate, DATE '1990-01-01') AS BIGINT)"))
      .collect()
      .flatMap { r =>
        custNat.get(r.getLong(1)).map { nk =>
          val sd = r.getLong(2)
          (nk, sd, sd + r.getLong(0) % 30 + 1)
        }
      }
    // brute force: for every nation, count open intervals at every
    // day in its span ([sd, ed) half-open — ends don't overlap starts)
    val expected = iv.groupBy(_._1).map { case (nk, xs) =>
      val days = xs.map(_._2).min to xs.map(_._3).max
      val peak = days.map(d => xs.count(x => x._2 <= d && d < x._3)).max
      natName(nk) -> (xs.length.toLong, peak.toLong)
    }
    val got = RelationalQueries.queries("q_interval_concurrency")(spark, sf)
      .collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (n, peak) = expected(r.getString(0))
      assert(r.getAs[Long]("n_orders") === n, s"n_orders for ${r.getString(0)}")
      assert(r.getAs[Long]("peak_open") === peak,
        s"peak_open for ${r.getString(0)}")
    }
    // the fixture must actually exercise concurrency, or the sweep
    // proves nothing
    assert(got.exists(_.getAs[Long]("peak_open") >= 2L))
  }

  test("good-turing: count-of-counts and smoothed counts match brute force") {
    val grams = spark.read.parquet(s"$sf/documents.parquet")
      .select("text").collect()
      .flatMap { r =>
        val ts = r.getString(0).split(" ")
        if (ts.length < 3) Array.empty[String]
        else ts.sliding(3).map(_.mkString("_")).toArray
      }
    val counts = grams.groupBy(identity).map(_._2.length.toLong)
    val coc = counts.groupBy(identity).map { case (r, xs) => r -> xs.size.toLong }
    val got = TextQueries.queries("q_good_turing")(spark, sf).collect()
    val expected = coc.keys.filter(_ <= 10).toSeq.sorted
    assert(got.map(_.getAs[Long]("r")).toSeq === expected)
    got.foreach { row =>
      val r = row.getAs[Long]("r")
      assert(row.getAs[Long]("n_r") === coc(r))
      val rstar = (r + 1) * coc.getOrElse(r + 1, 0L) * 10000L / coc(r)
      assert(row.getAs[Long]("rstar_pm") === rstar, s"rstar at r=$r")
    }
    // singletons exist in any Zipfian fixture; GT's whole point is
    // mass at r=1
    assert(got.head.getAs[Long]("r") === 1L)
  }

  // reference chunker: the published CDC definition (16-bit md5 token
  // code, gear over the last two codes, mask 8), written straight-line
  private def cdcChunks(text: String): Vector[String] = {
    def code(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16)
    }
    val toks = text.split(" ").toVector
    val codes = toks.map(code)
    val chunks = Vector.newBuilder[String]
    var cur = Vector.newBuilder[String]
    for (i <- toks.indices) {
      if (i > 0 && (codes(i) * 31 + codes(i - 1) * 7) % 8 == 0) {
        chunks += cur.result().mkString(" "); cur = Vector.newBuilder[String]
      }
      cur += toks(i)
    }
    chunks += cur.result().mkString(" ")
    chunks.result()
  }

  test("cdc chunk dedup: routed (hot-cap) path returns exactly the plain " +
      "path's rows (r16 answer-preservation)") {
    val plain = DedupQueries.queries("q_cdc_chunk_dedup")(spark, sf)
      .collect().map(_.toString).sorted
    withConf("spark.graft.cdc.forceRouted" -> "true") {
      val routed = DedupQueries.queries("q_cdc_chunk_dedup")(spark, sf)
        .collect().map(_.toString).sorted
      assert(routed.toSeq == plain.toSeq,
        "hot-key routing must be a pure plan rewrite")
    }
  }

  test("cdc chunk dedup: exact copies are fully covered; per-doc stats " +
      "match the reference chunker") {
    val rows = DedupQueries.queries("q_cdc_chunk_dedup")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // injected exact copies chunk identically to their base, so every
    // chunk is cross-doc duplicated: dup_pm must be exactly 10000
    val copies = byId.keys.filter(_ >= 2000000L)
    assert(copies.nonEmpty)
    copies.foreach { id =>
      assert(byId(id).getAs[Long]("dup_pm") === 10000L, s"copy $id")
    }
    // full per-doc reference: chunk every corpus doc in memory, mark
    // cross-doc duplicate chunk texts, rebuild each output row
    val base = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val corpus = base ++
      base.filter(_._1 % 4 == 0).map { case (id, t) => (id + 2000000L, t) } ++
      base.filter(_._1 % 3 == 0).map { case (id, t) =>
        (id + 1000000L, t + " zzz tail")
      }
    val chunked = corpus.map { case (id, t) => id -> cdcChunks(t) }
    val docsPerChunk = chunked
      .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
    val expected = chunked.flatMap { case (id, cs) =>
      val dup = cs.filter(c => docsPerChunk(c).exists(_ != id))
      if (dup.isEmpty) None
      else {
        val dupToks = dup.map(_.split(" ").length.toLong).sum
        val tot = cs.map(_.split(" ").length.toLong).sum
        Some(id -> (cs.length.toLong, dup.length.toLong, dupToks,
          dupToks * 10000L / tot))
      }
    }.toMap
    assert(rows.length === expected.size)
    rows.foreach { r =>
      val (nc, nd, dt, pm) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_chunks") === nc, s"n_chunks doc ${r.getLong(0)}")
      assert(r.getAs[Long]("n_dup_chunks") === nd)
      assert(r.getAs[Long]("dup_toks") === dt)
      assert(r.getAs[Long]("dup_pm") === pm)
    }
  }

  test("cdc chunk dedup: boundaries survive a prefix insertion " +
      "(the property fixed-window chunking lacks)") {
    // B = junk prefix + A's text: every A-chunk after B's first
    // content-defined boundary reappears verbatim in B, so the pair
    // shares dup chunks — while any fixed-offset scheme would shift
    // every window. The junk is chosen with a cut guaranteed inside
    // A's copy (the reference chunker proves it in-test, not by hope).
    val aText = spark.read.parquet(s"$sf/documents.parquet")
      .orderBy("doc_id").select("text").limit(1)
      .collect().head.getString(0)
    val bText = "junkprefix " + aText
    val shared = cdcChunks(aText).toSet
      .intersect(cdcChunks(bText).toSet)
    assert(shared.nonEmpty,
      "fixture text must realign within one doc — pick a longer doc if not")
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    import spark.implicits._
    Seq((1L, aText), (2L, bText)).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = DedupQueries.queries("q_cdc_chunk_dedup")(spark, dir).collect()
    // corpus injection adds nothing here (ids 1, 2 match no % rule), so
    // any dup rows come from genuine A/B chunk realignment
    assert(got.map(_.getLong(0)).toSet === Set(1L, 2L),
      "both the original and the prefix-shifted copy must report dup chunks")
  }

  test("cdc chunk dedup: agrees with the reference chunker on random " +
      "tiny-vocabulary corpora") {
    // dense cross-doc chunk collisions + many short/degenerate docs —
    // far more boundary edge cases than the fixture (1-token docs,
    // docs with no cut at all, identical docs at different ids)
    import spark.implicits._
    for (seed <- Seq(7, 23, 41)) {
      val rnd = new scala.util.Random(seed)
      val vocab = Vector("a", "b", "c", "d", "e")
      val docs = (0L until 30L).map { i =>
        val len = 1 + rnd.nextInt(40)
        (i, Vector.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
      } :+ (100L, "a") :+ (101L, "a") // guaranteed duplicate singletons
      val dir = java.nio.file.Files.createTempDirectory(s"graft-cdc-$seed")
        .toString
      docs.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // the query reads through Corpus.withDuplicates — model the same
      // injected exact (%4) and near (%3) copies in the reference
      val corpus = docs ++
        docs.filter(_._1 % 4 == 0).map { case (id, t) => (id + 2000000L, t) } ++
        docs.filter(_._1 % 3 == 0).map { case (id, t) =>
          (id + 1000000L, t + " zzz tail")
        }
      val chunked = corpus.map { case (id, t) => id -> cdcChunks(t) }
      val docsPerChunk = chunked
        .flatMap { case (id, cs) => cs.distinct.map(_ -> id) }
        .groupBy(_._1).map { case (c, xs) => c -> xs.map(_._2).toSet }
      val expected = chunked.flatMap { case (id, cs) =>
        val dup = cs.filter(c => docsPerChunk(c).exists(_ != id))
        if (dup.isEmpty) None
        else {
          val dupToks = dup.map(_.split(" ").length.toLong).sum
          val tot = cs.map(_.split(" ").length.toLong).sum
          Some(id -> (cs.length.toLong, dup.length.toLong, dupToks,
            dupToks * 10000L / tot))
        }
      }.toMap
      val got = DedupQueries.queries("q_cdc_chunk_dedup")(spark, dir)
        .collect()
      assert(got.length === expected.size, s"seed $seed row count")
      got.foreach { r =>
        val (nc, nd, dt, pm) = expected(r.getLong(0))
        assert(r.getAs[Long]("n_chunks") === nc, s"seed $seed doc ${r.getLong(0)}")
        assert(r.getAs[Long]("n_dup_chunks") === nd)
        assert(r.getAs[Long]("dup_toks") === dt)
        assert(r.getAs[Long]("dup_pm") === pm)
      }
      assert(got.map(_.getLong(0)).toSet.contains(100L),
        s"seed $seed: the planted singleton duplicate must be found")
    }
  }

  test("audio vad: segments match a byte-level reference walk") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 20 === 0)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(docs.nonEmpty)
    val expected = docs.map { case (id, text) =>
      val frames = text.getBytes("UTF-8").grouped(256).toVector
        .map(c => (c.length.toLong, c.map(b => (b & 0xff).toLong).sum))
      val totS = frames.map(_._1).sum
      val totE = frames.map(_._2).sum
      val active = frames.map { case (n, e) => e * totS > totE * n }
      // run-length encode the activity series; active runs = segments
      val runs = active.foldLeft(Vector.empty[(Boolean, Long)]) { (acc, a) =>
        if (acc.nonEmpty && acc.last._1 == a) acc.init :+ (a, acc.last._2 + 1)
        else acc :+ (a, 1L)
      }.filter(_._1).map(_._2)
      id -> (frames.length.toLong, active.count(identity).toLong,
        runs.length.toLong, if (runs.isEmpty) 0L else runs.max,
        active.count(identity).toLong * 10000L / frames.length)
    }.toMap
    val got = MultimodalQueries.queries("q_audio_vad")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nf, af, ns, ls, pm) = expected(r.getLong(0))
      assert(r.getAs[Long]("n_frames") === nf)
      assert(r.getAs[Long]("active_frames") === af)
      assert(r.getAs[Long]("n_segments") === ns)
      assert(r.getAs[Long]("longest_seg") === ls)
      assert(r.getAs[Long]("active_pm") === pm)
    }
    // the fixture must produce real segmentation, not all-active
    assert(got.exists(r => r.getAs[Long]("n_segments") >= 1L &&
      r.getAs[Long]("active_pm") < 10000L))
  }

  test("mutual info: cells, margins, and PMI match an in-memory rebuild") {
    val custNat = spark.read.parquet(s"$sf/customer.parquet")
      .select(col("c_custkey").cast("long"), col("c_nationkey").cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val natName = spark.read.parquet(s"$sf/nation.parquet")
      .select(col("n_nationkey").cast("long"), col("n_name")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val pairs = spark.read.parquet(s"$sf/orders.parquet")
      .select("o_custkey", "o_orderpriority").collect()
      .flatMap(r => custNat.get(r.getLong(0)).map(nk =>
        (natName(nk), r.getString(1))))
    val n = pairs.length.toLong
    val cells = pairs.groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val nx = pairs.groupBy(_._1).map { case (k, v) => k -> v.length.toLong }
    val ny = pairs.groupBy(_._2).map { case (k, v) => k -> v.length.toLong }
    def pm(c: Long) = math.min(c * 10000L / n, 9999L)
    val L = graft.queries.TextQueries.lnMyriadScaled
    val got = graft.queries.RelationalQueries
      .queries("q_mutual_info")(spark, sf).collect()
    assert(got.length === cells.size)
    got.foreach { r =>
      val key = (r.getString(0), r.getString(1))
      val cxy = cells(key)
      assert(r.getAs[Long]("n_xy") === cxy)
      val pmi = L(pm(nx(key._1)).toInt) + L(pm(ny(key._2)).toInt) -
        L(pm(cxy).toInt)
      assert(r.getAs[Long]("pmi_p12") === pmi, s"pmi at $key")
      assert(r.getAs[Long]("mi_contrib_p16") === pm(cxy) * pmi)
    }
    // association must actually vary across cells, or MI is vacuous
    assert(got.map(_.getAs[Long]("pmi_p12")).distinct.length > 1)
  }

  test("calibration bins: per-bin stats match a per-doc score rebuild") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    def bucket(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(2).map("%02x".format(_)).mkString, 16) % 256
    }
    val stop = Set("the", "a", "of", "and", "in")
    val perDoc = docs.map { case (_, text) =>
      val toks = text.split(" ")
      val truth = toks.count(stop) * 10000L / toks.length >= 500L
      val wsum = toks.map(t => bucket(t) * 37 % 201).sum
      val scorePm = wsum * 10000L / toks.length
      (math.min(scorePm / 200000L, 9L), scorePm, truth)
    }
    val expected = perDoc.groupBy(_._1).map { case (bin, xs) =>
      bin -> (xs.length.toLong, xs.map(_._2).sum / xs.length,
        xs.count(_._3).toLong * 10000L / xs.length)
    }
    val got = graft.queries.TextQueries
      .queries("q_calibration_bins")(spark, sf).collect()
    assert(got.length === expected.size)
    got.foreach { r =>
      val (nd, ms, pos) = expected(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n_docs") === nd)
      assert(r.getAs[Long]("mean_score_pm") === ms)
      assert(r.getAs[Long]("pos_pm") === pos)
    }
    // a one-bin degenerate histogram proves nothing
    assert(got.length >= 2)
  }

  test("pca power: converges to the dominant eigen-direction of an " +
      "independently-computed covariance") {
    // Independent reference: covariance in plain Double from the RAW
    // floats (not the engine's 2^20 quantization), 60 floating power
    // iterations with L2 normalization (not the engine's integer
    // max-abs renormalizer). Agreement in DIRECTION (|cos| ≥ 0.999)
    // and in Rayleigh quotient then checks the algorithm, not the
    // formula transcription.
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = vecs.length
    val dims = 64
    val mean = Array.tabulate(dims)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(dims, dims)((i, j) =>
      vecs.map(v => (v(i) - mean(i)) * (v(j) - mean(j))).sum / n)
    var ref = Array.fill(dims)(1.0)
    for (_ <- 1 to 60) {
      val w = Array.tabulate(dims)(i =>
        (0 until dims).map(j => cov(i)(j) * ref(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      ref = w.map(_ / norm)
    }
    val refLam = (0 until dims).map(i =>
      (0 until dims).map(j => cov(i)(j) * ref(j)).sum * ref(i)).sum /
      ref.map(x => x * x).sum
    val got = graft.queries.SimilarityQueries.queries("q_pca_power")(spark, sf)
      .collect().sortBy(_.getAs[Long]("i"))
    assert(got.length === 64)
    val v = got.map(_.getAs[Long]("v_scaled").toDouble)
    val cos = (0 until dims).map(i => v(i) * ref(i)).sum /
      (math.sqrt(v.map(x => x * x).sum) * math.sqrt(ref.map(x => x * x).sum))
    assert(math.abs(cos) >= 0.999,
      s"engine direction must match the floating reference, cos=$cos")
    val lam = got.head.getAs[Double]("lambda1")
    assert(math.abs(lam - refLam) <= math.abs(refLam) * 0.01 + 1e-9,
      s"Rayleigh eigenvalue: got $lam, reference $refLam")
    // the direction must be non-degenerate (not the all-ones start)
    assert(v.map(math.abs).max === 1048576.0)
    assert(v.exists(x => math.abs(x) < 1048576.0 * 0.9))
  }

  test("dp noise: released counts match the inverse-CDF Laplace rebuild; " +
      "mechanism is centered and bounded") {
    val rows = graft.queries.TextQueries.queries("q_dp_noise")(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val L = graft.queries.TextQueries.lnMyriadScaled
    val counts = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      val n = counts(src)
      assert(r.getAs[Long]("n_docs") === n)
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(src.getBytes("UTF-8"))
      val u = java.lang.Long.parseLong(
        d.take(2).map("%02x".format(_)).mkString, 16) % 10000
      val c = u - 5000
      val h = math.max(2 * (5000 - math.abs(c)) - 1, 0).toInt
      val noise = java.lang.Long.signum(c) * (50L * L(h) / 1000000000L)
      assert(r.getAs[Long]("released_milli") === n * 1000 + noise,
        s"noise at $src")
      // Laplace(b=50) in milli-units: |noise| ≤ b·ln(10001)·1000 and
      // far below it for typical u — released must stay plausible
      assert(math.abs(r.getAs[Long]("released_milli") - n * 1000) <=
        50L * 9211L)
    }
    // the mechanism must actually perturb (not all keys hash to u=5000)
    assert(rows.exists(r =>
      r.getAs[Long]("released_milli") !== r.getAs[Long]("n_docs") * 1000))
  }

  test("embedding outliers: flags and worst picks match a BigInt rebuild") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), col("label").cast("long"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Float](2).map(x => BigInt(
          math.floor(x.toDouble * 1048576.0).toLong)).toVector))
    val byLabel = vecs.groupBy(_._2)
    val got = graft.queries.SimilarityQueries
      .queries("q_embedding_outliers")(spark, sf).collect()
    assert(got.length === byLabel.size)
    got.foreach { r =>
      val label = r.getAs[Long]("label")
      val members = byLabel(label)
      val n = BigInt(members.length)
      val s = members.map(_._3).reduce((a, b) => a.zip(b).map(t => t._1 + t._2))
      val dds = members.map { case (id, _, q) =>
        id -> q.zip(s).map { case (x, si) =>
          val d = n * x - si; d * d
        }.sum
      }
      val tot = dds.map(_._2).sum
      val mx = dds.map(_._2).max
      assert(r.getAs[Long]("n_vecs") === members.length.toLong)
      assert(r.getAs[Long]("n_outliers") ===
        dds.count { case (_, dd) => n * dd > 4 * tot }.toLong)
      assert(r.getAs[Long]("max_ratio_pm") === (mx * 10000 / tot).toLong)
      assert(r.getAs[Long]("worst_vec") ===
        dds.filter(_._2 == mx).map(_._1).max)
    }
    // the audit must be non-vacuous on the fixture: at least one label
    // has a genuinely far vector or a nonzero outlier count is fine
    assert(got.map(_.getAs[Long]("max_ratio_pm")).max >= 10L)
  }

  test("centroid drift: cosine matches BigInt arithmetic; bounds hold") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("label").cast("long"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1048576.0).toLong)))
    val byLabel = vecs.groupBy(_._1)
    val dims = vecs.head._2.length
    def sumVec(xs: Iterable[Seq[Long]]): Vector[BigInt] =
      xs.foldLeft(Vector.fill(dims)(BigInt(0))) { (acc, v) =>
        acc.zip(v).map { case (a, x) => a + x }
      }
    val global = sumVec(vecs.map(_._2).toSeq)
    val got = SimilarityQueries.queries("q_centroid_drift")(spark, sf)
      .collect()
    assert(got.length === byLabel.size)
    got.foreach { r =>
      val label = r.getAs[Long]("label")
      val g = sumVec(byLabel(label).map(_._2).toSeq)
      val dot = g.zip(global).map { case (a, b) => a * b }.sum
      val n2a = g.map(x => x * x).sum
      val n2b = global.map(x => x * x).sum
      val cos = dot.toDouble / (math.sqrt(n2a.toDouble) * math.sqrt(n2b.toDouble))
      val want = math.round(cos * 10000.0) / 10000.0
      assert(r.getAs[Long]("n_vecs") === byLabel(label).length.toLong)
      assert(math.abs(r.getAs[Double]("drift_cos") - want) <= 1e-4 + 1e-12,
        s"drift_cos label $label: got ${r.getAs[Double]("drift_cos")} want $want")
      assert(math.abs(r.getAs[Double]("drift_cos")) <= 1.0)
    }
  }
}
