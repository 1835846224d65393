package graft

import org.apache.spark.sql.functions._
import graft.queries.{DedupQueries, MultimodalQueries, SimilarityQueries, TextQueries}

class LlmOpsSpec extends SparkSpecBase {

  test("every dedup/similarity/text/multimodal query runs with rows at sf0.001") {
    (DedupQueries.queries ++ SimilarityQueries.queries ++
      TextQueries.queries ++ MultimodalQueries.queries).foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("exact dedup collapses injected copies") {
    val df = DedupQueries.queries("q_dedup_exact")(spark, sf)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    val nearCopies = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 3 === 0).count()
    // distinct contents = originals + near-copies (distinct text each)
    assert(df.count() == docs + nearCopies)
    // every doc_id % 4 == 0 text has exactly 2 copies
    val dups = df.filter(col("n_copies") === 2).count()
    val expected = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 4 === 0).count()
    assert(dups == expected, s"dups=$dups expected=$expected")
  }

  test("near-twin Jaccard is high and flagged") {
    val df = DedupQueries.queries("q_dedup_ngram")(spark, sf)
    assert(df.filter(!col("is_near_dup")).count() == 0,
      "every appended-tail twin should clear the 0.5 threshold")
    val minJ = df.agg(min(col("jaccard"))).head().getDouble(0)
    assert(minJ >= 0.6, s"twin jaccard unexpectedly low: $minJ")
  }

  test("minhash LSH finds every injected twin pair") {
    val pairs = DedupQueries.queries("q_dedup_minhash")(spark, sf)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    val twins = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0)
      .collect().map(r => r.getAs[Long]("doc_id"))
      .map(id => (id, id + 1000000L)).toSet
    // banding with 4 bands × 2 rows at jaccard ~0.95 → p(detect) ≈ 1
    assert(twins.subsetOf(pairs),
      s"missing twin pairs: ${twins -- pairs}")
  }

  test("simhash of identical text is identical; twin hamming is small") {
    import spark.implicits._
    val sh = Seq((0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon zzz tail"))
      .toDF("doc_id", "text")
    // reuse the query's udf indirectly: simhash must be deterministic
    val q = DedupQueries.queries("q_dedup_simhash")(spark, sf)
    val vals = q.limit(5).collect().map(_.getAs[Long]("simhash16"))
    val vals2 = q.limit(5).collect().map(_.getAs[Long]("simhash16"))
    assert(vals.sameElements(vals2))
    assert(vals.forall(v => v >= 0 && v < 65536))
  }

  test("simhash banding recalls most twins; hamming verifies") {
    val pairs = DedupQueries.queries("q_dedup_simhash_pairs")(spark, sf)
      .collect()
    val twinPairs = pairs.filter(r =>
      r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
    val nTwins = spark.read.parquet(s"$sf/documents.parquet")
      .filter(col("doc_id") % 10 === 0).count()
    // 4×16 banding guarantees recall only for hamming ≤ 3; appended-
    // tail twins land around 0–10 → high-but-not-total recall (the
    // MinHash pass has 100% recall on the same twins)
    assert(twinPairs.length >= 0.8 * nTwins,
      s"twin recall ${twinPairs.length}/$nTwins")
    twinPairs.foreach(r => assert(r.getAs[Long]("hamming") <= 12))
  }

  test("brute-force and LSH top-k agree inside the query's bucket") {
    val brute = SimilarityQueries.queries("q_ann_cosine")(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    val lsh = SimilarityQueries.queries("q_ann_lsh")(spark, sf)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("sim")).toMap
    // LSH searches a subset → its best sim can never exceed brute force
    lsh.foreach { case (q, sim) =>
      assert(sim <= brute.getOrElse(q, Double.MaxValue) + 1e-9)
    }
  }

  test("embedding near-dup finds exactly the injected copies") {
    val pairs = SimilarityQueries.queries("q_embedding_near_dup")(spark, sf)
      .collect()
    val copies = spark.read.parquet(s"$sf/embeddings.parquet")
      .filter(col("vec_id") % 7 === 0).count()
    assert(pairs.length == copies,
      s"expected $copies exact-copy pairs, got ${pairs.length}")
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_b") == r.getAs[Long]("id_a") + 1000000L)
      assert(r.getAs[Double]("sim") >= 0.9999)
    }
  }

  test("fingerprints overlap heavily between a text and its tail-extended twin") {
    val base = "the quick brown fox jumps over the lazy dog again and again and again"
    val twin = base + " zzz"
    val a = TextQueries.fingerprints(base).toSet
    val b = TextQueries.fingerprints(twin).toSet
    val jac = a.intersect(b).size.toDouble / a.union(b).size
    assert(jac > 0.8, s"fingerprint jaccard $jac")
    assert(TextQueries.fingerprints(base).sameElements(TextQueries.fingerprints(base)))
  }

  test("multimodal meta is stable and dimension-bounded") {
    val df = MultimodalQueries.queries("q_multimodal_meta")(spark, sf)
    df.collect().foreach { r =>
      val w = r.getAs[Long]("width"); val h = r.getAs[Long]("height")
      assert(w >= 16 && w <= 31 && h >= 16 && h <= 31)
      assert(Set("png", "jpeg").contains(r.getAs[String]("format")))
    }
  }

  test("image header codec round-trips PNG and BMP and rejects garbage") {
    import graft.multimodal.MultimodalOps
    for (w <- Seq(1, 16, 255, 70000); h <- Seq(1, 31, 65537); c <- Seq(1, 3, 4)) {
      val png = MultimodalOps.decodeImageHeader(1L, MultimodalOps.encodePngHeader(w, h, c))
      assert((png.format, png.width, png.height, png.channels) == ("png", w, h, c))
      val bmp = MultimodalOps.decodeImageHeader(2L, MultimodalOps.encodeBmpHeader(w, h, c))
      assert((bmp.format, bmp.width, bmp.height, bmp.channels) == ("bmp", w, h, c))
    }
    val junk = MultimodalOps.decodeImageHeader(3L, "not an image".getBytes)
    assert(junk.format == "unknown" && junk.width == 0)
  }

  test("nearest-neighbor resize: identity, downscale mapping, and loud bounds") {
    import graft.multimodal.MultimodalOps
    val blob = MultimodalOps.encodeGrayBmp(42L, bump = false)
    val hdr = MultimodalOps.decodeImageHeader(42L, blob)
    val (w, h) = (hdr.width, hdr.height)
    // identity resize returns the source plane byte for byte
    val same = MultimodalOps.resizeGrayNearest(blob, 54, w, h, w, h)
    assert(same.sameElements(blob.slice(54, 54 + w * h)))
    // 2x downscale samples exactly the floor-mapped source pixels
    val halfW = w / 2; val halfH = h / 2
    val half = MultimodalOps.resizeGrayNearest(blob, 54, w, h, halfW, halfH)
    for (dy <- 0 until halfH; dx <- 0 until halfW) {
      val sx = dx * w / halfW; val sy = dy * h / halfH
      assert(half(dy * halfW + dx) == blob(54 + sy * w + sx), s"($dx,$dy)")
    }
    // a blob shorter than its claimed pixel plane fails loudly...
    val e = intercept[IllegalArgumentException](
      MultimodalOps.resizeGrayNearest(blob, 54, w, h + 1000, w, h))
    assert(e.getMessage.contains("pixel plane"))
    // ...including when the claimed dims would wrap an Int product
    val e2 = intercept[IllegalArgumentException](
      MultimodalOps.resizeGrayNearest(blob, 54, 65536, 65536, 32, 32))
    assert(e2.getMessage.contains("pixel plane"))
  }

  test("frame sample contains only even frames within bounds") {
    val meta = MultimodalQueries.queries("q_multimodal_meta")(spark, sf)
      .select(col("doc_id"), col("n_frames")).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_frames")).toMap
    MultimodalQueries.queries("q_frame_sample")(spark, sf).collect().foreach { r =>
      val id = r.getAs[Long]("doc_id"); val f = r.getAs[Long]("frame_idx")
      assert(f % 2 == 0 && f < meta(id))
    }
  }
}
