package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared corpus constructions for the dedup/text operators.
  *
  * The `documents` fixture contains no duplicates (500 distinct texts
  * at sf0.01), so dedup queries operate on a deterministic "re-crawl"
  * corpus both engines can rebuild:
  *   - every doc_id % 4 == 0 gains an EXACT copy   (id + 2,000,000)
  *   - every doc_id % 3 == 0 gains a NEAR copy     (id + 1,000,000,
  *     text ⊕ " zzz tail")
  * This mirrors real training-data pipelines, where dedup keys on
  * content hashes/shingles across crawls, not on row identity.
  */
object Corpus {

  /** doc_id, text, with exact + near duplicates injected.
    *
    * NOT spread here (optimization r20): a corpus-wide
    * [[graft.queries.Spread.ifNarrow]] at this choke point was
    * trialed and measured-rejected — the round's one VALID
    * same-session A/B read the off arm 0.68–0.70× (i.e. the spread
    * COSTS 30–40%) on the heaviest consumers (q_cdc_chunk_dedup,
    * q_span_dedup), because most consumers cache derived frames and a
    * cached plan's pinned 32-partition layout multiplies every
    * downstream stage's task count (OPTIMIZATION_r20.md §2).
    */
  def withDuplicates(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val exactCopies = docs.filter(col("doc_id") % 4 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text"))
    val nearCopies = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("text"), lit(" zzz tail")).as("text"))
    docs.unionByName(exactCopies).unionByName(nearCopies)
  }

  /** Matching DuckDB CTE. */
  val corpusCte: String =
    """corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 2000000, text FROM documents WHERE doc_id % 4 = 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, text || ' zzz tail' FROM documents WHERE doc_id % 3 = 0
      |)""".stripMargin

  /** Token 3-gram shingle array (distinct) of the named text column.
    *
    * Two non-obvious constraints shape the expression:
    *   - Spark's `sequence(1, 0)` is a DESCENDING sequence, not empty,
    *     so short texts need the explicit CASE branch;
    *   - `split($text)` must be bound ONCE via the outer lambda
    *     variable (`transform(array(split(..)), toks -> …)`), not
    *     referenced inside the per-element lambda — codegen does not
    *     hoist loop-invariant subexpressions out of higher-order
    *     function bodies, so the inline form re-splits the text per
    *     shingle element (~180× per row; measured seconds at sf0.1).
    */
  def shingles(textCol: String): Column = expr(
    s"""element_at(transform(array(split($textCol, ' ')), toks ->
       |  CASE WHEN size(toks) < 3 THEN array()
       |  ELSE array_distinct(transform(
       |    sequence(1, size(toks) - 2),
       |    i -> concat_ws(' ', element_at(toks, i),
       |                   element_at(toks, i + 1),
       |                   element_at(toks, i + 2))))
       |  END), 1)""".stripMargin)

  /** Same shingle list in DuckDB SQL (references a `text` column in
    * scope; DuckDB's generate_series(1,0) is empty, no guard needed).
    */
  val shinglesSql: String =
    """list_distinct(list_transform(
      |  generate_series(1, greatest(len(string_split(text, ' ')) - 2, 0)),
      |  i -> string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1] || ' ' || string_split(text, ' ')[i+2]
      |))""".stripMargin
}
