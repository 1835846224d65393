package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-only Hadoop filesystem registered under the `mock-s3://` scheme
  * (`fs.mock-s3.impl`): local storage behind an object-store-shaped URI.
  *
  * This is the stand-in the offline image needs for SNK-5's happy path:
  * `S3Sink.resolveRoot` probes scheme registration exactly as it would
  * for `s3a://` (missing connector jars → ClassNotFound → degrade), and
  * with this class registered the probe SUCCEEDS, so the pipeline's
  * writers — parquet catalog, zip sink, per-doc JSON writer rebuilt on
  * executors from shipped `fs.*` conf — all stream through the
  * non-`file:` scheme end-to-end.
  */
class MockS3FileSystem extends RawLocalFileSystem {
  override def getUri: URI = URI.create("mock-s3:///")
}
