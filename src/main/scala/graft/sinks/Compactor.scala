package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-files compaction — the table-maintenance pass every long-lived
  * 100 TB store needs: streaming ingests and per-partition writers leave
  * thousands of KB-sized files whose open/footer overhead eventually
  * dominates scans. Compaction rewrites a parquet directory into files
  * sized near `targetBytes`, preserving rows exactly.
  *
  * Sizing comes from the LISTING (sum of file lengths ÷ target), not a
  * data scan; the rewrite itself is one read → `coalesce(n)` → write to
  * a temp dir, then an atomic-ish swap. `coalesce` (not `repartition`)
  * keeps it shuffle-FREE: upstream splits are merged map-side, so the
  * cost is one pass of IO. Column order, schema, and row content are
  * unchanged — only the file layout.
  */
object Compactor {

  /** @return (filesBefore, filesAfter) */
  def compact(spark: SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val parts = fs.listStatus(path)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val n = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    if (parts.length <= n) return (parts.length, parts.length)

    val tmp = new Path(path.getParent, path.getName + "._compacting")
    spark.read.parquet(dir).coalesce(n)
      .write.mode("overwrite").parquet(tmp.toString)
    // Hadoop rename signals failure by BOOLEAN; every step is checked so
    // a failed swap can never reach the delete and destroy the only copy
    val bak = new Path(path.getParent, path.getName + "._old")
    if (fs.exists(bak) && !fs.delete(bak, true))
      throw new java.io.IOException(s"compact: cannot clear stale $bak")
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compact: cannot move $path aside")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // restore the original before failing
      throw new java.io.IOException(s"compact: cannot install $tmp at $path")
    }
    if (!fs.delete(bak, true))
      org.slf4j.LoggerFactory.getLogger(getClass)
        .warn(s"compact: left behind backup dir $bak")

    val after = fs.listStatus(path)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }
}
