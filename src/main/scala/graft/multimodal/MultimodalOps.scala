package graft.multimodal

import java.security.MessageDigest

/** Multimodal column handling: media as opaque `binary` columns with
  * typed metadata, decoded/feature-extracted executor-side.
  *
  * The decode itself is a clearly-marked STUB — no image/audio codecs
  * exist in this container — but it is a *deterministic* fake (derived
  * from the content digest), so the Spark-side plumbing (binary
  * columns, typed Dataset mapPartitions, batch shape, frame-sampling
  * explode) is fully real and verifiable. Swapping `decodeImageStub`
  * for a real codec changes no plan shape.
  */
object MultimodalOps {

  /** Typed metadata a real decoder would produce. */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String,
      n_frames: Int)

  private def md5Hex(bytes: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString

  private def hexVal(c: Char): Int = Character.digit(c, 16)

  /** STUB DECODER — deterministic fake in place of a real image codec.
    * Real implementation would parse the container header; this derives
    * plausible metadata from the content digest so results are stable
    * and cross-checkable. Formula (shared with the DuckDB oracle):
    * width = 16 + hex0(md5), height = 16 + hex1(md5),
    * channels = 1 + hex2(md5) % 4, n_frames = len/256 + 1.
    */
  def decodeImageStub(docId: Long, content: Array[Byte]): MediaMeta = {
    val h = md5Hex(content)
    MediaMeta(
      doc_id = docId,
      byte_len = content.length.toLong,
      width = 16 + hexVal(h.charAt(0)),
      height = 16 + hexVal(h.charAt(1)),
      channels = 1 + hexVal(h.charAt(2)) % 4,
      format = if (hexVal(h.charAt(3)) < 8) "png" else "jpeg",
      n_frames = (content.length / 256 + 1).toInt)
  }

  /** STUB resize — a real kernel would rescale pixel data; the stub
    * keeps the metadata arithmetic (aspect-preserving fit) real.
    */
  def resizeStub(m: MediaMeta, maxSide: Int): (Int, Int) = {
    val scale = maxSide.toDouble / math.max(m.width, m.height)
    if (scale >= 1.0) (m.width, m.height)
    else (math.max(1, math.rint(m.width * scale).toInt),
      math.max(1, math.rint(m.height * scale).toInt))
  }
}
