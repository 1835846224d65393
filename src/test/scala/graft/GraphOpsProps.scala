package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.queries.GraphOps

/** Property test for the shared connected-components helper: on random
  * small graphs, min-label propagation run for (n−1) rounds — an upper
  * bound on any component's diameter — must agree exactly with a serial
  * union-find reference. This is the guard both clustering queries
  * (content-hash and embedding-similarity) lean on.
  */
object GraphOpsProps extends Properties("graphops") {

  // each case runs real Spark jobs (rounds × joins): keep the sample small
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8)

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val graphGen: Gen[(Int, List[(Int, Int)])] = for {
    n <- Gen.chooseNum(1, 10)
    m <- Gen.chooseNum(0, 15)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1)
      b <- Gen.chooseNum(0, n - 1)
    } yield (a, b))
  } yield (n, edges.filter(e => e._1 != e._2))

  /** union-find reference over the same edge list. */
  private def reference(n: Int, edges: List[(Int, Int)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
    (0 until n).groupBy(find)
      .flatMap { case (_, members) =>
        val mn = members.min.toLong
        members.map(_.toLong -> mn)
      }
  }

  // guard against ScalaCheck shrinking (n, edges) to inconsistent values
  // (endpoints >= n): a genuine failure must shrink to a VALID smaller
  // case, not crash the reference mid-shrink
  private def valid(n: Int, edges: List[(Int, Int)]): Boolean =
    edges.forall(e => e._1 >= 0 && e._1 < n && e._2 >= 0 && e._2 < n && e._1 != e._2)

  private def edgesDf(s: SparkSession, edges: List[(Int, Int)]) = {
    import s.implicits._
    val undirected = edges.flatMap { case (a, b) =>
      Seq((a.toLong, b.toLong), (b.toLong, a.toLong)) }
    if (undirected.isEmpty) Seq.empty[(Long, Long)].toDF("src", "dst")
    else undirected.toDF("src", "dst")
  }

  property("labelPropagationEqualsUnionFind") =
    Prop.forAll(graphGen) { case (n, edges) =>
      valid(n, edges) ==> {
        val s = spark
        import s.implicits._
        s.sparkContext.setLogLevel("ERROR")
        val nodes = (0 until n).map(_.toLong).toDF("id")
        val got = GraphOps.minLabelPropagate(nodes, edgesDf(s, edges),
            rounds = math.max(1, n - 1))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        got == reference(n, edges)
      }
    }

  property("alternatingStarEqualsUnionFind") =
    Prop.forAll(graphGen) { case (n, edges) =>
      valid(n, edges) ==> {
        val s = spark
        import s.implicits._
        s.sparkContext.setLogLevel("ERROR")
        val nodes = (0 until n).map(_.toLong).toDF("id")
        val (labels, rounds) =
          GraphOps.alternatingStarComponents(nodes, edgesDf(s, edges))
        val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.queries.QueryCaches.releaseAll(s)
        // the O(log d) claim, pinned: diameter < n, +2 covers the
        // final no-change confirmation round and the n=1 edge cases
        val logBound = (math.log(math.max(n, 2)) / math.log(2)).ceil.toInt + 2
        (got == reference(n, edges)) :| s"labels: $got" &&
          (rounds <= logBound) :| s"rounds=$rounds exceeds log bound $logBound (n=$n)"
      }
    }

  // the scale claim itself: a 64-node chain has diameter 63 — plain
  // min-label propagation needs 63 shuffle rounds to carry the minimum
  // to the far end; the star alternation must close it in ≤ log2(64)+2
  property("chainOf64ClosesInLogRounds") = {
    val s = spark
    import s.implicits._
    s.sparkContext.setLogLevel("ERROR")
    val n = 64
    val nodes = (0 until n).map(_.toLong).toDF("id")
    val chain = (0 until n - 1).map(i => (i.toLong, (i + 1).toLong)).toList
    val (labels, rounds) = GraphOps.alternatingStarComponents(
      nodes, chain.toDF("src", "dst"))
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.queries.QueryCaches.releaseAll(s)
    (got == (0 until n).map(_.toLong -> 0L).toMap) :| s"labels: $got" &&
      (rounds <= 8) :| s"rounds=$rounds — star alternation must beat O(diameter)=63"
  }

  property("fixpointEqualsUnionFind") =
    Prop.forAll(graphGen) { case (n, edges) =>
      valid(n, edges) ==> {
        val s = spark
        import s.implicits._
        s.sparkContext.setLogLevel("ERROR")
        val nodes = (0 until n).map(_.toLong).toDF("id")
        val got = GraphOps.minLabelPropagateToFixpoint(nodes, edgesDf(s, edges))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        graft.queries.QueryCaches.releaseAll(s)
        got == reference(n, edges)
      }
    }
}
