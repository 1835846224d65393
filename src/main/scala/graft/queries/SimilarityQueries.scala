package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` fixture (64-dim float
  * vectors).
  *
  * Operators:
  *   - brute-force cosine top-k (the correctness baseline): queries ×
  *     candidates with a compiled dot-product kernel (higher-order
  *     function expressions evaluate interpreted per element — a loop
  *     with identical accumulation order is ~2× faster and bit-equal);
  *   - LSH-bucketed top-k (the scale path): 8 deterministic pseudo-
  *     random hyperplanes → 8-bit bucket; candidates searched only
  *     within the query's bucket. At 100 TB the bucket is the shuffle/
  *     partition key and each bucket's search is local — this query is
  *     that plan at fixture scale;
  *   - embedding near-dup detection: exact-copy injection (like
  *     Corpus.withDuplicates) → LSH bucket → within-bucket pairwise
  *     cosine ≥ 0.99. Buckets bound the pair blow-up exactly the way
  *     banding does for MinHash.
  *
  * Cross-engine determinism: dots/norms are computed on
  * float→double-cast values; similarities round to 4 decimals BEFORE
  * ranking; rank ties break on vec_id.
  */
object SimilarityQueries {

  /** Dot product of two float-array columns as doubles — the native
    * codegen'd `vec_dot` expression (graft.plans.VecDot): index-order
    * summation identical to `aggregate(zip_with(...))`, so similarities
    * are bit-identical to the oracle, but the kernel runs inside the
    * whole-stage-codegen loop reading ArrayData in place — no per-pair
    * Seq conversion/boxing (the prior ScalaUDF) and no interpreted
    * per-element lambdas (the HOF form).
    */
  private def dot(a: String, b: String): Column = expr(s"vec_dot($a, $b)")

  private def norm(a: String): Column = sqrt(dot(a, a))

  /** 8-bit hyperplane bucket: bit j set iff
    * Σ_d w(j,d)·e[d] > 0 with w(j,d) = +1 if ((j·64+d)·37) mod 97 < 48
    * else −1 (d 0-based). Pure arithmetic → oracle-reproducible; the
    * native `vec_bucket` expression does the identical double
    * arithmetic in the identical order, codegen'd (HOF lambdas are
    * interpreted per element — 8×64 = 512 evals/row dominated the
    * bucketed queries; the prior ScalaUDF still boxed every array).
    */
  private def bucket(e: String): Column = expr(s"vec_bucket($e)")

  /** The fixture is a single row group → a single scan partition, so
    * the dot/bucket kernels downstream would run on one core. A
    * round-robin redistribute after the skinny scan spreads the
    * compute; on a real cluster the scan is already many-split and the
    * exchange is a no-op cost next to the kernel work it balances.
    */
  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.plans.VecKernels.register(s)
    s.read.parquet(s"$dir/embeddings.parquet").repartition(col("vec_id"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-3 per query vector. Norms are computed
    // ONCE per vector before the join (a projection), not per pair —
    // at N×M pair counts that's the difference between O(N+M) and
    // O(N·M) norm work.
    "q_ann_cosine" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          norm("embedding").as("qn"))
      val c = e.filter(col("vec_id") >= 5)
        .select(col("vec_id"), col("embedding").as("ce"),
          norm("embedding").as("cn"))
      val scored = q.crossJoin(c)
        .withColumn("sim", round(dot("qe", "ce") / (col("qn") * col("cn")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "vec_id", "sim")
        .orderBy("query_id", "rank")
    }),

    // LSH-bucketed top-2: candidates restricted to the query's bucket.
    "q_ann_lsh" -> ((s, dir) => {
      // persisted: the query/candidate branches below would otherwise
      // each re-evaluate the 8×64-term bucket expression over all rows
      val e = QueryCaches.cache(emb(s, dir).withColumn("bucket", bucket("embedding")))
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          norm("embedding").as("qn"), col("bucket"))
      val c = e.filter(col("vec_id") >= 5)
        .select(col("vec_id"), col("embedding").as("ce"),
          norm("embedding").as("cn"), col("bucket"))
      val scored = q.join(c, "bucket")
        .withColumn("sim", round(dot("qe", "ce") / (col("qn") * col("cn")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 2)
        .select(col("query_id"), col("bucket"), col("rank"), col("vec_id"), col("sim"))
        .orderBy("query_id", "rank")
    }),

    // IVF-style top-k: the label column plays the coarse-quantizer
    // cell id (as if assigned by a trained k-means); each query probes
    // ONLY its own cell. At scale the cell id is the partition key and
    // each cell's posting list is searched locally — the inverted-file
    // counterpart to the hyperplane-LSH variant above.
    "q_ann_ivf" -> ((s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
          norm("embedding").as("qn"), col("label"))
      val c = e.filter(col("vec_id") >= 5)
        .select(col("vec_id"), col("embedding").as("ce"),
          norm("embedding").as("cn"), col("label"))
      val scored = q.join(c, "label")
        .withColumn("sim", round(dot("qe", "ce") / (col("qn") * col("cn")), 4))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select(col("query_id"), col("label").cast("bigint").as("cell"),
          col("rank"), col("vec_id"), col("sim"))
        .orderBy("query_id", "rank")
    }),

    // Int8 quantization of the embedding column — the storage/transfer
    // compression step real vector indexes apply before ANN search.
    // scale = 127/max|v|; q_d = round(v_d · scale) — every step is an
    // exactly-rounded IEEE op (max, div, mul, round-half-away), so the
    // quantized vectors are bit-identical cross-engine. Pure
    // higher-order-function expressions (no UDF): 64 elements/row keeps
    // interpreted lambda cost trivial here.
    "q_embedding_quantize" -> ((s, dir) =>
      emb(s, dir)
        .filter(col("vec_id") % 5 === 0)
        .withColumn("maxabs", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
        .withColumn("qvec", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT))"))
        .select(col("vec_id"),
          round(col("maxabs"), 4).as("maxabs"),
          expr("aggregate(qvec, CAST(0 AS BIGINT), (a, q) -> a + q)").as("q_sum"),
          expr("CAST(size(filter(qvec, q -> abs(q) >= 100)) AS BIGINT)").as("n_large"),
          expr("CAST(size(filter(qvec, q -> q = 0)) AS BIGINT)").as("n_zero"))
        .orderBy("vec_id")),

    // ANN over the QUANTIZED vectors: int8 dot products are exact
    // 64-bit integer arithmetic — the arithmetic real vector stores run
    // after compression, and (unlike float scores) bit-deterministic by
    // construction, so ranking needs no rounding guard at all.
    "q_ann_quantized" -> ((s, dir) => {
      val quantized = emb(s, dir)
        .withColumn("maxabs", expr(
          "aggregate(embedding, CAST(0.0 AS DOUBLE), (a, x) -> greatest(a, abs(CAST(x AS DOUBLE))))"))
        .withColumn("qv", expr(
          "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * (127.0 / maxabs)) AS BIGINT))"))
        .select(col("vec_id"), col("qv"))
        .transform(QueryCaches.cache(_)) // both branches below
      val q = quantized.filter(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("qv").as("qa"))
      val c = quantized.filter(col("vec_id") >= 5 && col("vec_id") % 5 === 0)
        .select(col("vec_id"), col("qv").as("qb"))
      val scored = q.crossJoin(c)
        .withColumn("score", expr(
          "aggregate(zip_with(qa, qb, (x, y) -> x * y), CAST(0 AS BIGINT), (a, x) -> a + x)"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
        .select("query_id", "rank", "vec_id", "score")
        .orderBy("query_id", "rank")
    }),

    // IVF/k-means centroid update (the M-step): per cell (label), the
    // elementwise mean of member embeddings — how a vector index's
    // coarse quantizer is (re)trained. The sum runs in the typed
    // VecSumAgg Aggregator: one 64-double buffer per cell per
    // partition, merged elementwise, so only |cells|·dims doubles cross
    // the shuffle (the posexplode alternative shuffles |vectors|·dims
    // rows). Mean = sum ÷ count in the projection; round(4) absorbs
    // summation-order ulps cross-engine.
    "q_ivf_centroids" -> ((s, dir) => {
      val vecsum = udaf(graft.functions.VecSumAgg,
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
      emb(s, dir)
        .groupBy(col("label").cast("bigint").as("cell"))
        .agg(vecsum(col("embedding")).as("sums"), count(lit(1)).as("n_members"))
        .select(col("cell"), col("n_members"),
          posexplode(col("sums")).as(Seq("d", "sum_d")))
        .select(col("cell"), col("n_members"),
          (col("d") + 1).cast("bigint").as("dim"),
          round(col("sum_d") / col("n_members"), 4).as("centroid"))
        .orderBy("cell", "dim")
    }),

    // Near-duplicate embeddings: exact copies injected for vec_id%7==0,
    // found via bucket-blocked pairwise cosine ≥ 0.99.
    "q_embedding_near_dup" -> ((s, dir) => {
      val base = emb(s, dir).select(col("vec_id"), col("embedding"))
      val copies = base.filter(col("vec_id") % 7 === 0)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding"))
      val corpus = base.unionByName(copies)
        .withColumn("bucket", bucket("embedding"))
        .withColumn("nrm", norm("embedding"))
        .transform(QueryCaches.cache(_)) // self-joined: avoid re-evaluating bucket+norm per branch
      val a = corpus.select(col("vec_id").as("id_a"), col("embedding").as("ea"),
        col("nrm").as("na"), col("bucket"))
      val b = corpus.select(col("vec_id").as("id_b"), col("embedding").as("eb"),
        col("nrm").as("nb"), col("bucket"))
      a.join(b, "bucket")
        .filter(col("id_a") < col("id_b"))
        .withColumn("sim", round(dot("ea", "eb") / (col("na") * col("nb")), 4))
        .filter(col("sim") >= 0.99)
        .select("id_a", "id_b", "sim")
        .orderBy("id_a", "id_b")
    }),
  )

  // ---- oracles -----------------------------------------------------

  // constant 64-dim bound: DuckDB's generate_series table function
  // cannot take correlated (lateral) arguments like len($a)
  private val dotSql: (String, String) => String = (a, b) =>
    s"(SELECT sum(CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)) FROM generate_series(1, 64) t(i))"

  private def bucketSql(e: String): String =
    s"""(SELECT CAST(sum(CASE WHEN (
       |   SELECT sum(CASE WHEN ((j * 64 + d.i - 1) * 37) % 97 < 48 THEN 1.0 ELSE -1.0 END
       |              * CAST($e[d.i] AS DOUBLE))
       |   FROM generate_series(1, 64) d(i)) > 0
       |  THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT)
       | FROM generate_series(0, 7) jt(j))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_ivf_centroids" ->
      """WITH ex AS (
        |  SELECT CAST(label AS BIGINT) AS cell, t.i AS dim,
        |         CAST(embedding[t.i] AS DOUBLE) AS x
        |  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
        |)
        |SELECT cell, CAST(count(*) AS BIGINT) AS n_members,
        |       CAST(dim AS BIGINT) AS dim,
        |       round(sum(x) / count(*), 4) AS centroid
        |FROM ex GROUP BY cell, dim ORDER BY cell, dim""".stripMargin,

    "q_ann_cosine" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding AS ce FROM embeddings WHERE vec_id >= 5),
         |scored AS (
         |  SELECT q.query_id, c.vec_id,
         |         round(${dotSql("qe", "ce")} /
         |               (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("ce", "ce")})), 4) AS sim
         |  FROM q CROSS JOIN c
         |),
         |ranked AS (
         |  SELECT query_id, vec_id, sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored
         |)
         |SELECT query_id, rank, vec_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q_ann_lsh" ->
      s"""WITH eb AS (
         |  SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM embeddings
         |),
         |q AS (SELECT vec_id AS query_id, embedding AS qe, bucket FROM eb WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding AS ce, bucket FROM eb WHERE vec_id >= 5),
         |scored AS (
         |  SELECT q.query_id, q.bucket, c.vec_id,
         |         round(${dotSql("qe", "ce")} /
         |               (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("ce", "ce")})), 4) AS sim
         |  FROM q JOIN c ON q.bucket = c.bucket
         |),
         |ranked AS (
         |  SELECT query_id, bucket, vec_id, sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored
         |)
         |SELECT query_id, bucket, rank, vec_id, sim FROM ranked
         |WHERE rank <= 2 ORDER BY query_id, rank""".stripMargin,

    "q_ann_ivf" ->
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qe, label FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id, embedding AS ce, label FROM embeddings WHERE vec_id >= 5),
         |scored AS (
         |  SELECT q.query_id, CAST(q.label AS BIGINT) AS cell, c.vec_id,
         |         round(${dotSql("qe", "ce")} /
         |               (sqrt(${dotSql("qe", "qe")}) * sqrt(${dotSql("ce", "ce")})), 4) AS sim
         |  FROM q JOIN c ON q.label = c.label
         |),
         |ranked AS (
         |  SELECT query_id, cell, vec_id, sim,
         |         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
         |  FROM scored
         |)
         |SELECT query_id, cell, rank, vec_id, sim FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q_ann_quantized" ->
      s"""WITH ma AS (
         |  SELECT vec_id, embedding,
         |         (SELECT max(abs(CAST(embedding[i] AS DOUBLE)))
         |          FROM generate_series(1, 64) t(i)) AS maxabs
         |  FROM embeddings WHERE vec_id < 5 OR vec_id % 5 = 0
         |),
         |qz AS (
         |  SELECT vec_id, maxabs, i,
         |         CAST(round(CAST(embedding[i] AS DOUBLE) * (127.0 / maxabs)) AS BIGINT) AS qv
         |  FROM ma CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
         |),
         |scored AS (
         |  SELECT a.vec_id AS query_id, b.vec_id,
         |         CAST(sum(a.qv * b.qv) AS BIGINT) AS score
         |  FROM qz a JOIN qz b ON a.i = b.i
         |  WHERE a.vec_id < 5 AND b.vec_id >= 5 AND b.vec_id % 5 = 0
         |  GROUP BY 1, 2
         |),
         |ranked AS (
         |  SELECT query_id, vec_id, score,
         |         row_number() OVER (PARTITION BY query_id
         |                            ORDER BY score DESC, vec_id) AS rank
         |  FROM scored
         |)
         |SELECT query_id, rank, vec_id, score FROM ranked
         |WHERE rank <= 3 ORDER BY query_id, rank""".stripMargin,

    "q_embedding_quantize" ->
      s"""WITH sub AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 5 = 0),
         |ma AS (
         |  SELECT vec_id, embedding,
         |         (SELECT max(abs(CAST(embedding[i] AS DOUBLE)))
         |          FROM generate_series(1, 64) t(i)) AS maxabs
         |  FROM sub
         |),
         |q AS (
         |  SELECT vec_id, maxabs, i,
         |         CAST(round(CAST(embedding[i] AS DOUBLE) * (127.0 / maxabs)) AS BIGINT) AS qv
         |  FROM ma CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
         |)
         |SELECT vec_id, round(maxabs, 4) AS maxabs,
         |       CAST(sum(qv) AS BIGINT) AS q_sum,
         |       CAST(sum(CASE WHEN abs(qv) >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_large,
         |       CAST(sum(CASE WHEN qv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero
         |FROM q GROUP BY vec_id, maxabs ORDER BY vec_id""".stripMargin,

    "q_embedding_near_dup" ->
      s"""WITH corpus AS (
         |  SELECT vec_id, embedding FROM embeddings
         |  UNION ALL
         |  SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 7 = 0
         |),
         |eb AS (SELECT vec_id, embedding, ${bucketSql("embedding")} AS bucket FROM corpus)
         |SELECT id_a, id_b, sim FROM (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |         round(${dotSql("a.embedding", "b.embedding")} /
         |               (sqrt(${dotSql("a.embedding", "a.embedding")}) *
         |                sqrt(${dotSql("b.embedding", "b.embedding")})), 4) AS sim
         |  FROM eb a JOIN eb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |)
         |WHERE sim >= 0.99 ORDER BY id_a, id_b""".stripMargin,
  )
}
