package graft.tools

import org.apache.spark.sql.SparkSession

/** Window-immune A/B probe (optimization r20, guide §1): the sandbox
  * host drifts 1.1–1.5× across minutes, so two back-to-back ProbePhases
  * runs confound a code/conf delta with the window shift (sentinel
  * queries moved +30–50% between the r20 spread probes). This tool
  * times the SAME query under two session-conf bundles ALTERNATING
  * within one session — each A sample has a B sample seconds away, so
  * the min/median ratio is a property of the change, not the window.
  *
  * Conf bundles apply via `spark.conf.set` per sample, so they reach
  * (a) query-construction gates that read session conf (e.g.
  * `spark.graft.spread`) and (b) runtime-settable SQL confs. Statically
  * captured confs (shuffle service, memory) are out of scope.
  *
  * Usage: runMain graft.tools.ProbeAB <sfDir> <q1,q2,...> \
  *          "<kA=vA;...>@<kB=vB;...>" [pairs=3]
  */
object ProbeAB {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ProbeAB <sfDir> <q1,q2,...> <confA@confB> [pairs]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val Array(aSpec, bSpec) = args(2).split("@", 2)
    val pairs = if (args.length > 3) args(3).toInt else 3
    def parse(spec: String): Seq[(String, String)] = spec
      .split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
      .toSeq
    val (confA, confB) = (parse(aSpec), parse(bSpec))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    graft.sinks.S3Sink.disableLocalWriteChecksums(s)
    try {
      s.range(1000000).selectExpr("sum(id)").collect()
      s.read.parquet(s"$dir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    val all = graft.SparkEntry.queries
    def withConf[T](conf: Seq[(String, String)])(body: => T): T = {
      val prev = conf.map { case (k, _) => k -> s.conf.getOption(k) }
      conf.foreach { case (k, v) => s.conf.set(k, v) }
      try body finally prev.foreach {
        case (k, Some(v)) => s.conf.set(k, v)
        case (k, None) => s.conf.unset(k)
      }
    }
    println(s"[ab] A: ${confA.mkString("; ")}   B: ${confB.mkString("; ")}")
    names.foreach { n =>
      all.get(n) match {
        case None => println(s"[ab] unknown query: $n")
        case Some(fn) =>
          def run(conf: Seq[(String, String)]): Double = withConf(conf) {
            val t0 = System.nanoTime()
            try fn(s, dir).queryExecution.toRdd.count()
            catch { case e: Throwable =>
              println(s"[ab] $n FAILED: ${e.getMessage.take(120)}") }
            val dt = (System.nanoTime() - t0) / 1e9
            graft.queries.QueryCaches.releaseAll(s)
            dt
          }
          // one untimed warmup per arm (codegen, side stores)
          run(confA); run(confB)
          val (as, bs) = (Array.ofDim[Double](pairs), Array.ofDim[Double](pairs))
          (0 until pairs).foreach { i => as(i) = run(confA); bs(i) = run(confB) }
          def med(xs: Array[Double]): Double = {
            val t = xs.sorted
            if (t.length % 2 == 1) t(t.length / 2)
            else (t(t.length / 2 - 1) + t(t.length / 2)) / 2.0
          }
          println(f"[ab] $n%-26s A(min=${as.min}%6.3f med=${med(as)}%6.3f) " +
            f"B(min=${bs.min}%6.3f med=${med(bs)}%6.3f) " +
            f"min B/A=${bs.min / math.max(as.min, 1e-9)}%5.2f " +
            f"med B/A=${med(bs) / math.max(med(as), 1e-9)}%5.2f")
      }
    }
    s.stop()
  }
}
