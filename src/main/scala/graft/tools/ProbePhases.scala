package graft.tools

import org.apache.spark.sql.SparkSession

/** Phase-split probe (optimization r20, guide §1/§7.3): for each named
  * query, separates the per-invocation DRIVER cost — DataFrame
  * construction + analysis (`fn(...)`) and optimization/physical
  * planning (`queryExecution.executedPlan`) — from cluster-side
  * EXECUTION (`toRdd.count()`, the Bench basis). The bench re-invokes
  * `fn` every pass, so build+plan time is paid inside every timed
  * sample; a query whose wall is mostly driver planning needs a plan-
  * complexity fix (fewer nodes / cheaper constructors), not a shuffle
  * fix, and the two look identical in the bench total.
  *
  * reps: per-query repetitions AFTER one untimed warmup (codegen/JIT/
  * side-store builds land there, as in Bench's pass 0). Reported
  * number is the MIN over reps (machine-load floor).
  *
  * Usage: runMain graft.tools.ProbePhases <sfDir> <q1,q2,...> [reps=3]
  */
object ProbePhases {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: ProbePhases <sfDir> <q1,q2,...> [reps]")
    val dir = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // A/B hook: SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" applies session confs
    // before any query runs, so a config candidate (guide §9) can be
    // measured against the identical query set without code edits.
    val extra = sys.env.getOrElse("SPARK_GRAFT_EXTRA_CONF", "")
      .split(";").map(_.trim).filter(_.contains("="))
      .map { kv => val i = kv.indexOf('='); (kv.take(i), kv.drop(i + 1)) }
    val b0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    val s = extra.foldLeft(b0) { case (b, (k, v)) => b.config(k, v) }
      .getOrCreate()
    if (extra.nonEmpty)
      println(s"[phases] extra conf: ${extra.map { case (k, v) => s"$k=$v" }.mkString("; ")}")
    s.sparkContext.setLogLevel("WARN")
    graft.sinks.S3Sink.disableLocalWriteChecksums(s)
    // session warmup, mirroring Bench
    try {
      s.range(1000000).selectExpr("sum(id)").collect()
      s.read.parquet(s"$dir/lineitem.parquet").limit(1).collect()
    } catch { case _: Throwable => () }
    // job/stage counter: eager-build queries pay per-job scheduler
    // turnaround (job canary ≈ 9 ms/job); this names the queries where
    // that fixed cost concentrates
    val jobs = new java.util.concurrent.atomic.AtomicInteger
    val stages = new java.util.concurrent.atomic.AtomicInteger
    val tasks = new java.util.concurrent.atomic.AtomicInteger
    s.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); stages.addAndGet(j.stageInfos.size)
        tasks.addAndGet(j.stageInfos.map(_.numTasks).sum); ()
      }
    })
    val all = graft.SparkEntry.queries
    names.foreach { n =>
      all.get(n) match {
        case None => println(s"[phases] unknown query: $n")
        case Some(fn) =>
          // untimed warmup execution (side stores, codegen, JIT)
          try { fn(s, dir).queryExecution.toRdd.count() }
          catch { case e: Throwable =>
            println(s"[phases] $n warmup failed: ${e.getMessage}") }
          graft.queries.QueryCaches.releaseAll(s)
          var bBuild = Double.MaxValue; var bPlan = Double.MaxValue
          var bExec = Double.MaxValue; var bTotal = Double.MaxValue
          jobs.set(0); stages.set(0); tasks.set(0)
          (1 to reps).foreach { _ =>
            val t0 = System.nanoTime()
            val df = fn(s, dir)
            val t1 = System.nanoTime()
            df.queryExecution.executedPlan
            val t2 = System.nanoTime()
            df.queryExecution.toRdd.count()
            val t3 = System.nanoTime()
            graft.queries.QueryCaches.releaseAll(s)
            bBuild = math.min(bBuild, (t1 - t0) / 1e9)
            bPlan = math.min(bPlan, (t2 - t1) / 1e9)
            bExec = math.min(bExec, (t3 - t2) / 1e9)
            bTotal = math.min(bTotal, (t3 - t0) / 1e9)
          }
          // listener events drain asynchronously; settle before reading
          Thread.sleep(200)
          println(f"[phases] $n%-28s build=$bBuild%7.3f plan=$bPlan%7.3f " +
            f"exec=$bExec%7.3f total=$bTotal%7.3f " +
            f"jobs/rep=${jobs.get / reps}%3d stages/rep=${stages.get / reps}%3d " +
            f"tasks/rep=${tasks.get / reps}%5d")
      }
    }
    s.stop()
  }
}
