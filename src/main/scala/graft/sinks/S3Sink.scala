package graft.sinks

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** SNK-5/6: the S3 upload target with graceful degradation.
  *
  * The reference wraps its boto3 import in try/except and falls back to
  * local-only output when the client isn't available (ETL.py:77–92), then
  * uploads zip + JSON per product under `bucket/prefix` (ETL.py:377–406).
  * The Spark-native counterpart is not a per-file upload loop: outputs are
  * WRITTEN DIRECTLY to an `s3a://bucket/prefix` URI through the Hadoop
  * filesystem connector, so every executor streams its own partitions to
  * the store in parallel — no driver-side staging, no re-upload pass.
  *
  * Config (SparkConf / `--conf`):
  *   - `spark.graft.sink.s3.enabled` — default false (local-only)
  *   - `spark.graft.sink.s3.uri` — e.g. `s3a://company-data-hub/climate`
  *
  * Degradation contract: enabled-but-unusable (no URI, unregistered
  * scheme — e.g. hadoop-aws jars absent, exactly the reference's missing
  * boto3 — or an unreachable store) logs a warning and returns the local
  * root, mirroring ETL.py's "Files won't be uploaded" path. The pipeline
  * run never fails because the upload target is down.
  *
  * Cluster deployment note (documented, not force-applied — requires the
  * spark-hadoop-cloud + hadoop-aws jars on the classpath): use the S3A
  * "magic" committer so task commits are O(1) metadata operations instead
  * of copy-then-delete renames — see [[recommendedS3aConf]].
  */
object S3Sink {

  val EnabledKey = "spark.graft.sink.s3.enabled"
  val UriKey     = "spark.graft.sink.s3.uri"

  /** The standard zero-rename committer recipe for s3a output at scale.
    * Apply via `--conf` at submit time on a cluster with the cloud
    * committer jars; harmless to omit for local/HDFS output.
    */
  val recommendedS3aConf: Map[String, String] = Map(
    "spark.hadoop.fs.s3a.committer.name" -> "magic",
    "spark.hadoop.fs.s3a.committer.magic.enabled" -> "true",
    "spark.sql.sources.commitProtocolClass" ->
      "org.apache.spark.internal.io.cloud.PathOutputCommitProtocol",
    "spark.sql.parquet.output.committer.class" ->
      "org.apache.spark.internal.io.cloud.BindingParquetOutputCommitter",
    // parallel multipart uploads from each executor
    "spark.hadoop.fs.s3a.fast.upload" -> "true",
    "spark.hadoop.fs.s3a.connection.maximum" -> "96",
  )

  /** Resolve the effective output root: the configured object-store URI
    * when the sink is enabled AND the scheme is actually usable in this
    * deployment; otherwise `localRoot` (with a logged warning when the
    * intent was S3 — SNK-6).
    */
  def resolveRoot(spark: SparkSession, localRoot: String): String = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    if (!spark.conf.get(EnabledKey, "false").toBoolean) localRoot
    else spark.conf.get(UriKey, "") match {
      case "" =>
        log.warn(s"$EnabledKey=true but $UriKey is unset - writing locally to $localRoot")
        localRoot
      case target =>
        try {
          // probes scheme registration (ClassNotFound/NoFileSystem when the
          // connector jars are missing) without touching any object yet
          FileSystem.get(new URI(target), spark.sessionState.newHadoopConf())
          target
        } catch {
          case e: Exception =>
            log.warn(s"S3 sink target $target unusable (${e.getMessage}) - " +
              s"files won't be uploaded; writing locally to $localRoot")
            localRoot
        }
    }
  }

  /** Subset of the driver's Hadoop conf a partition-side writer needs to
    * reconstruct a filesystem handle on the executor (connector settings,
    * endpoints, credentials providers — everything under `fs.`).
    */
  def fsConfEntries(spark: SparkSession): Map[String, String] = {
    val conf = spark.sessionState.newHadoopConf()
    val it = conf.iterator()
    val b = Map.newBuilder[String, String]
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith("fs.")) b += e.getKey -> e.getValue
    }
    b.result()
  }

  /** Executor-side: filesystem handle for `root` from shipped entries.
    *
    * For the local scheme this returns the RAW local filesystem — no
    * `.crc` checksum sidecars. The sidecars are a ChecksumFileSystem
    * artifact of local mode only (object stores and HDFS carry their
    * own integrity), and they DOUBLE the small-file count of every
    * multi-sink write: 826 of q_pipeline_e2e's 1652 output files were
    * `.crc`, on exactly the small-file-write axis local mode is
    * slowest and most host-sensitive on (ROUND20_NOTES §9b). Unwrapping
    * the cached instance's raw layer mutates no shared state; writes
    * land byte-identical, and readers through either layer are
    * unaffected (ChecksumFileSystem only verifies when a sidecar
    * exists). Sinks write to fresh temp/staging dirs, so no file with a
    * pre-existing sidecar is ever overwritten through the raw layer.
    */
  def fileSystemFor(root: String, entries: Map[String, String]): FileSystem = {
    val conf = new Configuration()
    entries.foreach { case (k, v) => conf.set(k, v) }
    new Path(root).getFileSystem(conf) match {
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRawFileSystem
      case other => other
    }
  }

  /** Session-level counterpart of [[fileSystemFor]]'s raw-layer unwrap:
    * stop `.crc` sidecar writes from the JVM's CACHED local filesystem,
    * the instance Spark's OWN writers use — streaming-checkpoint
    * offsets/commits/state files and parquet part files otherwise each
    * carry one sidecar, doubling the small-file count of every stream
    * drain and every local parquet write. Local scheme only (no other
    * scheme's cached instance is touched); readers verify checksums
    * only when a sidecar exists, and every write path here lands in a
    * fresh directory (parquet overwrite deletes the tree first;
    * checkpoint and staging dirs are per-run), so no file is ever
    * rewritten in place under a stale sidecar. Call once after session
    * creation in local-mode entry points.
    */
  def disableLocalWriteChecksums(spark: SparkSession): Unit =
    try FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
      .setWriteChecksum(false)
    catch { case _: Throwable => () }
}
