package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.{DataFrame, Row}

/** Zip packaging sink (SNK-3; ETL.py:315–346): one .zip per group,
  * entries = the group's sidecar files, lockfiles excluded upstream
  * (PRJ-5 — the *grouping* is a query, see EtlQueries.q_zip_group; this
  * module is only the I/O).
  *
  * Executed with `foreachPartition` semantics: every partition writes
  * its own groups, no driver collection — per-group single-file output
  * is inherently a sink-side concern (SURVEY.md §7.6.5). Paths are
  * java.nio against a shared filesystem; at cluster scale the same
  * writer runs against a Hadoop FileSystem handle (s3a/HDFS) —
  * one-file-per-group semantics are unchanged.
  */
object ZipSink {

  /** Expects schema: zip_name STRING, entries ARRAY<STRUCT<name STRING,
    * content STRING>>. Writes `outDir/<zip_name>` files.
    */
  def write(df: DataFrame, outDir: String): Unit = {
    Files.createDirectories(Paths.get(outDir))
    df.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { row =>
        val zipName = row.getAs[String]("zip_name")
        val entries = row.getAs[collection.Seq[Row]]("entries")
        val out = new ZipOutputStream(new BufferedOutputStream(
          new FileOutputStream(Paths.get(outDir, zipName).toFile)))
        try {
          entries.foreach { e =>
            out.putNextEntry(new ZipEntry(e.getAs[String]("name")))
            out.write(e.getAs[String]("content").getBytes(StandardCharsets.UTF_8))
            out.closeEntry()
          }
        } finally out.close()
      }
    }
  }
}
