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

  test("charPerm: 10 distinct bijections, identity at 0, pairwise no-gap") {
    val perms = (0 until 10).map(Scale10.charPerm)
    assert(perms(0) == Scale10.PermSrc)
    assert(perms.distinct.length == 10)
    perms.foreach(p => assert(p.sorted == Scale10.PermSrc.sorted, p))
    // rotations move whole blocks, so any two copies' maps disagree on
    // ≥4 source chars (all 5 vowels, all 4 consonants, or both) — a
    // cross-copy-identical text must lack an entire block. The first
    // design's i/i+5 gap was only {s, t}: 2 chars.
    for (i <- 0 until 10; j <- (i + 1) until 10) {
      val nDiff = Scale10.PermSrc.indices.count(x => perms(i)(x) != perms(j)(x))
      assert(nDiff >= 4, s"copies $i/$j differ on only $nDiff chars")
    }
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

  test("copy embeddings: rotation is an isometry with shifted labels") {
    val e = spark.read.parquet(s"$out/embeddings.parquet")
    val a = e.filter(col("vec_id") < 10000000L)
      .select(col("vec_id"), col("embedding").as("ea"), col("label").as("la"))
    val b = e.filter(col("vec_id") >= 10000000L)
      .select((col("vec_id") - 10000000L).as("vec_id"),
        col("embedding").as("eb"), col("label").as("lb"))
    val j = a.join(b, "vec_id")
      .withColumn("rot", expr("concat(slice(ea, 7, 58), slice(ea, 1, 6))"))
    // copy 1 = rotate by 6; labels shifted by 10 (disjoint cell spaces)
    assert(j.filter(col("rot") =!= col("eb")).count() == 0)
    assert(j.filter(col("lb") =!= col("la") + 10).count() == 0)
    assert(e.agg(min("label"), max("label")).collect()
      .forall(r => r.getInt(0) == 0 && r.getInt(1) == 19))
  }
}
