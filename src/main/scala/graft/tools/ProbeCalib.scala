package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the r15 Part-8 open question (r16 verdict item #4):
  * the CARRIED truth shape (label computed in the same projection that
  * explodes the tokens) measured 3.56 s inside q_calibration_bins but
  * ~0.9 s inside q_confusion_matrix, with node-identical plans up to
  * the tails. This probe builds the shared carried front half and A/Bs
  * four tails to locate which composition tips execution into the slow
  * mode:
  *   A carried + confusion tail   (1-row metric aggregate)
  *   B carried + calibration tail (score_pm -> bin -> 10-row aggregate)
  *   C carried + minimal tail     (sum(score_pm) only — no bin column)
  *   D narrow-join + calibration tail (the shipped fast shape)
  * Each variant runs `passes` timed executions after one warmup;
  * prints min/med and the executed plan's codegen stage count.
  *
  * Usage: runMain graft.tools.ProbeCalib <sfDir> [passes]
  */
object ProbeCalib {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val passes = if (args.length > 1) args(1).toInt else 4
    val s = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    sys.env.get("PROBECALIB_AQE").foreach(v =>
      s.conf.set("spark.sql.adaptive.enabled", v))

    def weights = s.range(256).select(col("id").as("bucket"),
      (col("id") * 37 % 201).as("w"))

    // carried front half — verbatim the r15 pre-fix projection
    def carriedPerDoc: DataFrame =
      s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          expr("""CAST(size(filter(split(text, ' '),
            |  t -> t IN ('the','a','of','and','in'))) AS BIGINT) * 10000
            |div CAST(size(split(text, ' ')) AS BIGINT) >= 500""".stripMargin)
            .as("truth"),
          explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), col("truth"), expr(
          "CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT) % 256")
          .as("bucket"))
        .join(broadcast(weights), "bucket")
        .groupBy("doc_id", "truth")
        .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("wsum"))

    def confusionTail(perDoc: DataFrame): DataFrame =
      perDoc.withColumn("pred", expr("wsum * 10000 div n_toks") >= 1000000L)
        .agg(
          sum(when(col("truth") && col("pred"), 1L).otherwise(0L)).as("tp"),
          sum(when(!col("truth") && col("pred"), 1L).otherwise(0L)).as("fp"),
          sum(when(col("truth") && !col("pred"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("truth") && !col("pred"), 1L).otherwise(0L)).as("tn"))

    def calibrationTail(perDoc: DataFrame): DataFrame =
      perDoc.withColumn("score_pm", expr("wsum * 10000 div n_toks"))
        .withColumn("bin", expr("least(score_pm div 200000, 9)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_pm) div count(1)").as("mean_score_pm"),
          expr("""sum(CASE WHEN truth THEN 1 ELSE 0 END) * 10000
                 | div count(1)""".stripMargin).as("pos_pm"))
        .orderBy("bin")

    def minimalTail(perDoc: DataFrame): DataFrame =
      perDoc.withColumn("score_pm", expr("wsum * 10000 div n_toks"))
        .agg(sum("score_pm").as("s"))

    def narrowJoinCalib: DataFrame = {
      val truths = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          expr("""CAST(size(filter(split(text, ' '),
            |  t -> t IN ('the','a','of','and','in'))) AS BIGINT) * 10000
            |div CAST(size(split(text, ' ')) AS BIGINT) >= 500""".stripMargin)
            .as("truth"))
      val scored = s.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
        .select(col("doc_id"), expr(
          "CAST(conv(substring(md5(tok), 1, 4), 16, 10) AS BIGINT) % 256")
          .as("bucket"))
        .join(broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_toks"), sum(col("w")).as("wsum"))
      calibrationTail(scored.join(truths, "doc_id")
        .select(col("doc_id"), col("truth"), col("n_toks"), col("wsum")))
    }

    def calibTailNoSort(perDoc: DataFrame): DataFrame =
      perDoc.withColumn("score_pm", expr("wsum * 10000 div n_toks"))
        .withColumn("bin", expr("least(score_pm div 200000, 9)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_pm) div count(1)").as("mean_score_pm"),
          expr("""sum(CASE WHEN truth THEN 1 ELSE 0 END) * 10000
                 | div count(1)""".stripMargin).as("pos_pm"))

    def calibTailNoTruth(perDoc: DataFrame): DataFrame =
      perDoc.withColumn("score_pm", expr("wsum * 10000 div n_toks"))
        .withColumn("bin", expr("least(score_pm div 200000, 9)"))
        .groupBy("bin")
        .agg(count(lit(1)).as("n_docs"),
          expr("sum(score_pm) div count(1)").as("mean_score_pm"))
        .orderBy("bin")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("A_carried_confusion", () => confusionTail(carriedPerDoc)),
      ("B_carried_calibration", () => calibrationTail(carriedPerDoc)),
      ("B1_carried_calib_nosort", () => calibTailNoSort(carriedPerDoc)),
      ("B2_carried_calib_notruth", () => calibTailNoTruth(carriedPerDoc)),
      ("C_carried_minimal", () => minimalTail(carriedPerDoc)),
      ("D_narrowjoin_calibration", () => narrowJoinCalib))

    val stageLog = new scala.collection.mutable.ArrayBuffer[String]()
    s.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          stageLog += f"stage=${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"run=${si.taskMetrics.executorRunTime / 1000.0}%.2fs " +
            f"cpu=${si.taskMetrics.executorCpuTime / 1e9}%.2fs " +
            f"inRec=${si.taskMetrics.inputMetrics.recordsRead}%d " +
            f"shRec=${si.taskMetrics.shuffleReadMetrics.recordsRead}%d " +
            f"shWr=${si.taskMetrics.shuffleWriteMetrics.recordsWritten}%d"
        }
      })

    variants.foreach { case (name, f) =>
      f().count() // warmup: codegen + JIT + page cache
      if (sys.env.contains("PROBECALIB_STAGES")) stageLog.clear()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
      val sorted = times.sorted
      println(f"[probecalib] $name%-26s min=${sorted.head}%.3f " +
        f"med=${sorted(sorted.length / 2)}%.3f all=${times.map(t => f"$t%.2f").mkString(",")}")
      if (sys.env.contains("PROBECALIB_STAGES")) {
        Thread.sleep(300) // listener drain
        println(s"==== stages $name (last timed pass onward) ====")
        stageLog.foreach(l => println(s"  $l"))
      }
      if (sys.env.contains("PROBECALIB_PLANS")) {
        val df = f(); df.collect()
        println(s"==== final plan $name ====")
        println(df.queryExecution.executedPlan.toString)
      }
      if (sys.env.contains("PROBECALIB_METRICS")) {
        val df = f(); df.collect()
        println(s"==== node metrics $name ====")
        df.queryExecution.executedPlan.foreach { node =>
          val m = node.metrics.map { case (k, v) => s"$k=${v.value}" }
            .mkString(" ")
          println(s"  ${node.nodeName}: $m")
        }
      }
    }
    s.stop()
  }
}
