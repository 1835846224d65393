package graft

import org.apache.spark.sql.functions._
import graft.tools.Scale10

/** The N× fixture synthesizer must model a real bigger corpus: keys
  * disjoint across copies, within-copy dup structure preserved (text
  * transforms are bijections), cross-copy text/vectors unrelated
  * (embedding rotation is an isometry, so within-copy geometry is
  * exact). A bug here silently turns the 10× scale run into either a
  * 45×-pair pathological corpus or a no-op.
  */
class Scale10Spec extends SparkSpecBase {

  private lazy val out: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_scale2_").toString
    Scale10.build(spark, sf, dir, 2)
    dir
  }

  test("charPerm: 40 distinct bijections, identity at 0, pairwise no-gap") {
    // copies 0..19: (i mod 5, i mod 4) injective by CRT over the
    // forward vowel order; 20..39 repeat the rotation family over the
    // REVERSED order (r20), and a reversed 5-rotation never equals a
    // forward one — all 40 maps Scale10.build accepts are distinct
    val perms = (0 until 40).map(Scale10.charPerm)
    assert(perms(0) == Scale10.PermSrc)
    assert(perms.distinct.length == 40)
    perms.foreach(p => assert(p.sorted == Scale10.PermSrc.sorted, p))
    // rotations move whole blocks, so any two copies' maps disagree on
    // ≥4 source chars. The first design's i/i+5 gap was only {s, t}:
    // 2 chars.
    for (i <- 0 until 40; j <- (i + 1) until 40) {
      val nDiff = Scale10.PermSrc.indices.count(x => perms(i)(x) != perms(j)(x))
      assert(nDiff >= 4, s"copies $i/$j differ on only $nDiff chars")
    }
    // The exact agreement-set family (corrected r20): with the
    // reversed-vowel half, forward×reversed pairs sharing a consonant
    // rotation agree on 1 vowel + all 4 consonants — so "must lack an
    // entire block" was too strong. Pin the full enumeration so any
    // future extension that widens an agreement set (and therefore
    // weakens build()'s replicableRows guard condition) fails here.
    val allowed = Set("", "a", "e", "i", "o", "u", "nrst", "aeiou",
      "anrst", "enrst", "inrst", "norst", "nrstu")
    for (i <- 0 until 40; j <- (i + 1) until 40) {
      val agree = Scale10.PermSrc.indices
        .collect { case x if perms(i)(x) == perms(j)(x) => Scale10.PermSrc(x) }
        .sorted.mkString
      assert(allowed.contains(agree),
        s"copies $i/$j agree on unpinned set '$agree'")
    }
  }

  test("build refuses a corpus with rows inside a cross-copy agreement " +
    "class (replicableRows guard, r20)") {
    import spark.implicits._
    // one distinct lowercase vowel + consonants ⊆ {nrst}: fixed point
    // of the (0,24)-style mixed pairs — must be counted
    val degenerate = Seq("TRANS ALARM bad dataA a na", "resolute xyz").toDF("text")
    assert(Scale10.replicableRows(degenerate, "text") === 1L)
    // no lowercase stnr at all (vowel-block-only usage): also counted
    val vowelOnly = Seq("veo wee hid up").toDF("text")
    assert(Scale10.replicableRows(vowelOnly, "text") === 1L)
    // two distinct vowels AND a consonant: clean
    val clean = Seq("stone age").toDF("text")
    assert(Scale10.replicableRows(clean, "text") === 0L)
    // and the real fixtures measure zero on both translated columns —
    // the precondition build() now enforces at every scale-up
    assert(Scale10.replicableRows(
      spark.read.parquet(s"$sf/documents.parquet"), "text") === 0L)
    assert(Scale10.replicableRows(
      spark.read.parquet(s"$sf/customer.parquet"), "c_name") === 0L)
  }

  test("row counts double and keys are disjoint across copies") {
    for (t <- Seq("documents", "embeddings", "customer", "lineitem",
        "orders", "events")) {
      val base = spark.read.parquet(s"$sf/$t.parquet").count()
      val big = spark.read.parquet(s"$out/$t.parquet")
      assert(big.count() == 2 * base, t)
    }
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    // dims copy verbatim
    assert(spark.read.parquet(s"$out/nation.parquet").count() ==
      spark.read.parquet(s"$sf/nation.parquet").count())
  }

  test("copy texts: within-copy equality preserved, cross-copy distinct") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val a = docs.filter(col("doc_id") < 10000000L)
      .select(col("doc_id"), col("text").as("ta"))
    val b = docs.filter(col("doc_id") >= 10000000L)
      .select((col("doc_id") - 10000000L).as("doc_id"), col("text").as("tb"))
    val j = a.join(b, "doc_id").cache()
    try {
      // bijection: lengths identical, text different wherever any mapped
      // char occurs (real text always has vowels)
      assert(j.filter(length(col("ta")) =!= length(col("tb"))).count() == 0)
      val same = j.filter(col("ta") === col("tb")).count()
      assert(same == 0, s"$same cross-copy identical texts")
      // within-copy exact-dup structure identical in both copies: the
      // per-copy multiset of duplicated-text group sizes must match
      def groupSizes(c: org.apache.spark.sql.Column) = j.groupBy(c)
        .count().filter(col("count") > 1)
        .groupBy("count").count()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(groupSizes(col("ta")) == groupSizes(col("tb")))
    } finally { j.unpersist(); () }
  }

  test("copy embeddings: signed permutation is an isometry with shifted labels") {
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val a = e.filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), col("embedding").as("ea"), col("label").as("la"))
    val b = e.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"),
        col("embedding").as("eb"), col("label").as("lb"))
    // copy 1 = rotate by 6 then flip by the seeded ±1 vector (exact in
    // float); labels shifted by 10 (disjoint cell spaces)
    val flipSql = Scale10.signFlips(1)
      .map(f => if (f > 0) "1.0" else "-1.0")
      .mkString("array(", ",", ")")
    val j = a.join(b, "vec_id")
      .withColumn("expect", expr(
        "cast(zip_with(concat(slice(ea, 7, 58), slice(ea, 1, 6)), " +
          s"$flipSql, (x, s) -> x * s) as array<float>)"))
    assert(j.filter(col("expect") =!= col("eb")).count() == 0)
    assert(j.filter(col("lb") =!= col("la") + 10).count() == 0)
    assert(e.agg(min("label"), max("label")).collect()
      .forall(r => r.getInt(0) == 0 && r.getInt(1) == 19))
  }

  test("copy embeddings decorrelate from the LSH hyperplane family") {
    // the r13 20×-superlinear root cause, pinned: a vector and its
    // copy-1 image must NOT systematically share banded-LSH keys. With
    // the bare rotation the arithmetic weight family aliased onto
    // itself and most pairs agreed on some band; with the signed
    // permutation agreement collapses to the random-baseline rate.
    graft.plans.VecKernels.register(spark)
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val a = e.filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), expr("vec_bands(embedding)").as("ba"))
    val b = e.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"),
        expr("vec_bands(embedding)").as("bb"))
    val j = a.join(b, "vec_id")
      .withColumn("shared", expr(
        "size(filter(zip_with(ba, bb, (x, y) -> x = y), s -> s))"))
    val total = j.count()
    val colliding = j.filter(col("shared") > 0).count()
    assert(colliding <= math.max(2L, total / 20),
      s"$colliding of $total source→copy pairs share a band key — " +
        "the copy transform still aliases the hyperplane family")
  }

  test("per-copy audio fingerprint dispersion: copies share no fingerprints " +
      "and true-pair truth grows linearly, not cluster-quadratically") {
    // VERDICT r17 #3: the base PCM signal (srcId·17 + t·11) mod 251 is
    // determined by srcId mod 251 alone, so every copy used to land in
    // the SAME ≤251-value fingerprint space and Hamming-≤6 truth grew
    // quadratically with corpus size (~1.79M pairs at 20×), making the
    // capped-path recall audit degenerate. encodePcm now varies the t
    // coefficient by copy index (doc_id div 10⁷ — 0 at every gated
    // fixture, so oracles are untouched); this pins the dispersion.
    import graft.multimodal.MultimodalOps
    def fp(id: Long): Long = MultimodalOps.audioFp64(
      id, MultimodalOps.encodePcm(id, bump = false))._2
    val baseIds = (0L until 2000L by 4L).toVector
    val copyFps = (0 to 3).map { c =>
      baseIds.map(b => fp(b + c * 10000000L)).toSet
    }
    // cross-copy: fingerprint SETS of distinct copies are disjoint (the
    // vetted coefficient table admits 12 near-colliding value pairs over
    // the whole 251-phase space × 190 copy pairs; exact equality across
    // these 4 copies' 500-id samples would need one of those)
    for (i <- copyFps.indices; j <- (i + 1) until copyFps.size)
      assert((copyFps(i) & copyFps(j)).isEmpty,
        s"copies $i/$j share exact fingerprints — copy spaces collapsed")
    // within-copy truth is bounded by the exact-phase floor for vetted
    // coefficients: distinct-fp count per copy stays maximal (251 values
    // over ≥251 sampled phases), so per-copy pair density is flat and
    // total truth is a SUM of per-copy constants — linear in copies
    copyFps.zipWithIndex.foreach { case (s, c) =>
      assert(s.size >= 200,
        s"copy $c collapsed to ${s.size} distinct fingerprints")
    }
    // bump near-dups survive every copy's coefficient: the +1 injection
    // stays within the Hamming-6 verify bound (the dedup signal the
    // scale fixtures plant must not be destroyed by the dispersion fix)
    for (c <- 0 to 3; b <- baseIds.take(50)) {
      val id = b + c * 10000000L
      val d = java.lang.Long.bitCount(fp(id) ^ MultimodalOps.audioFp64(
        id, MultimodalOps.encodePcm(id, bump = true))._2)
      assert(d <= 6, s"bump dup at copy $c id $id drifted to Hamming $d")
    }
  }
}
