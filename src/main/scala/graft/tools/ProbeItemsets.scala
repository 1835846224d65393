package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-timing + variant A/B probe for q_freq_itemsets (r14: the
  * query landed at 4.1 s median sf0.1 — the heaviest headline row).
  * Times each stage of the current shape, then whole-query variants:
  *   base     — the committed shape (cached bi, self-join pairs)
  *   nocache  — same, bi not cached
  *   hofpairs — collect_list per basket + HOF pair expansion instead
  *              of the basket self-join
  * Usage: runMain graft.tools.ProbeItemsets <sfDir> [passes=3]
  */
object ProbeItemsets {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    def time(label: String)(body: => Unit): Double = {
      val t0 = System.nanoTime(); body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] $label%-22s $dt%6.3f s"); dt
    }

    def bi(cached: Boolean): DataFrame = {
      val raw = s.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
        .join(s.read.parquet(s"$dir/part.parquet")
          .select(col("p_partkey"), col("p_brand")),
          col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
        .distinct()
      if (cached) raw.cache() else raw
    }

    // --- stage timing on the committed shape
    println("=== stage timing (cached bi) ===")
    val b0 = bi(cached = true)
    time("bi materialize")(b0.count())
    time("bounds countDistinct")(b0.agg(countDistinct(col("basket"))).collect())
    val itemCnt = b0.groupBy("item").agg(count(lit(1)).as("ic"))
    time("itemCnt")(itemCnt.collect())
    val bounds = b0.agg(countDistinct(col("basket")).as("n_baskets"))
    val freq = itemCnt.crossJoin(broadcast(bounds))
      .filter(col("ic") >= expr("n_baskets div 50"))
      .select(col("item"), col("ic"))
    val fb = b0.join(freq.select("item"), Seq("item"), "left_semi")
    time("fb semi-join")(fb.count())
    val pairs = fb.as("a").join(fb.as("b"),
        col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
      .agg(count(lit(1)).as("pair_support"))
    time("pairs self-join")(pairs.count())
    b0.unpersist(blocking = true)

    def whole(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to passes).map { _ =>
        val df = mk
        val t0 = System.nanoTime(); df.collect()
        s.sharedState.cacheManager.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $label%-10s min ${ts.min}%6.3f  med " +
        f"${ts.sorted.apply(ts.length / 2)}%6.3f  (${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    def finish(fbIn: DataFrame, pairsIn: DataFrame, freqIn: DataFrame,
        boundsIn: DataFrame): DataFrame =
      pairsIn.crossJoin(broadcast(boundsIn))
        .filter(col("pair_support") >= expr("n_baskets div 50"))
        .join(freqIn.withColumnRenamed("item", "item1")
          .withColumnRenamed("ic", "ic1"), "item1")
        .join(freqIn.withColumnRenamed("item", "item2")
          .withColumnRenamed("ic", "ic2"), "item2")
        .select(col("item1"), col("item2"), col("pair_support"),
          expr("pair_support * n_baskets * 10000 div (ic1 * ic2)")
            .as("lift_pmyr"))
        .orderBy(col("pair_support").desc, col("item1"), col("item2"))
        .limit(20)

    println(s"=== whole-query variants ($passes passes) ===")
    whole("base") {
      val b = bi(cached = true)
      val bounds = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val ic = b.groupBy("item").agg(count(lit(1)).as("ic"))
      val fr = ic.crossJoin(broadcast(bounds))
        .filter(col("ic") >= expr("n_baskets div 50"))
        .select(col("item"), col("ic"))
      val f = b.join(fr.select("item"), Seq("item"), "left_semi")
      val p = f.as("a").join(f.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
        .agg(count(lit(1)).as("pair_support"))
      finish(f, p, fr, bounds)
    }
    whole("nocache") {
      val b = bi(cached = false)
      val bounds = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val ic = b.groupBy("item").agg(count(lit(1)).as("ic"))
      val fr = ic.crossJoin(broadcast(bounds))
        .filter(col("ic") >= expr("n_baskets div 50"))
        .select(col("item"), col("ic"))
      val f = b.join(fr.select("item"), Seq("item"), "left_semi")
      val p = f.as("a").join(f.as("b"),
          col("a.basket") === col("b.basket") && col("a.item") < col("b.item"))
        .groupBy(col("a.item").as("item1"), col("b.item").as("item2"))
        .agg(count(lit(1)).as("pair_support"))
      finish(f, p, fr, bounds)
    }
    whole("nocachehof") {
      val b = bi(cached = false)
      val bounds = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val ic = b.groupBy("item").agg(count(lit(1)).as("ic"))
      val fr = ic.crossJoin(broadcast(bounds))
        .filter(col("ic") >= expr("n_baskets div 50"))
        .select(col("item"), col("ic"))
      val f = b.join(fr.select("item"), Seq("item"), "left_semi")
      val p = f.groupBy("basket").agg(sort_array(collect_list("item")).as("its"))
        .select(explode(expr(
          """flatten(transform(its, (x, i) ->
            |  transform(slice(its, i + 2, size(its)),
            |    y -> named_struct('item1', x, 'item2', y))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
        .agg(count(lit(1)).as("pair_support"))
      finish(f, p, fr, bounds)
    }
    whole("hofpairs") {
      val b = bi(cached = true)
      val bounds = b.agg(countDistinct(col("basket")).as("n_baskets"))
      val ic = b.groupBy("item").agg(count(lit(1)).as("ic"))
      val fr = ic.crossJoin(broadcast(bounds))
        .filter(col("ic") >= expr("n_baskets div 50"))
        .select(col("item"), col("ic"))
      val f = b.join(fr.select("item"), Seq("item"), "left_semi")
      // one basket-keyed shuffle into sorted item lists, then pairs by HOF
      val p = f.groupBy("basket").agg(sort_array(collect_list("item")).as("its"))
        .select(explode(expr(
          """flatten(transform(its, (x, i) ->
            |  transform(slice(its, i + 2, size(its)),
            |    y -> named_struct('item1', x, 'item2', y))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.item1").as("item1"), col("p.item2").as("item2"))
        .agg(count(lit(1)).as("pair_support"))
      finish(f, p, fr, bounds)
    }
    s.stop()
  }
}
