package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs; one per suite (lazy). */
trait SparkSpecBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // same local-write behavior as the Verify/Bench/PipelineMain entry
    // points: no .crc sidecars (S3Sink.disableLocalWriteChecksums doc)
    graft.sinks.S3Sink.disableLocalWriteChecksums(s)
    s
  }

  val sf: String = "/root/testdata/sf0.001"

  /** Scope session confs to `body`, restoring the previous value (or
    * unsetting) afterwards — the session is SHARED across suites
    * (getOrCreate), so any conf a test sets must be restored or it
    * leaks into every later suite.
    */
  def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
