package graft.tools
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val q = args(0); val dir = args(1)
    val all = graft.SparkEntry.queries
    val df = all(q)(s, dir)
    df.count()
    println("=== FINAL PLAN " + q + " ===")
    println(df.queryExecution.executedPlan.toString.linesIterator
      .map(_.take(160)).take(80).mkString("\n"))
    s.stop()
  }
}
