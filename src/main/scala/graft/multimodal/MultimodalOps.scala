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

  /** Typed metadata a real decoder would produce (resized_w/h: the
    * aspect-fit thumbnail dims a feature-extraction stage consumes).
    */
  final case class MediaMeta(
      doc_id: Long,
      byte_len: Long,
      width: Int,
      height: Int,
      channels: Int,
      format: String,
      n_frames: Int,
      resized_w: Int,
      resized_h: Int)

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
  val ResizeMaxSide = 24

  def decodeImageStub(docId: Long, content: Array[Byte]): MediaMeta = {
    val h = md5Hex(content)
    val width = 16 + hexVal(h.charAt(0))
    val height = 16 + hexVal(h.charAt(1))
    val (rw, rh) = resizeStub(width, height, ResizeMaxSide)
    MediaMeta(
      doc_id = docId,
      byte_len = content.length.toLong,
      width = width,
      height = height,
      channels = 1 + hexVal(h.charAt(2)) % 4,
      format = if (hexVal(h.charAt(3)) < 8) "png" else "jpeg",
      n_frames = (content.length / 256 + 1).toInt,
      resized_w = rw,
      resized_h = rh)
  }

  /** STUB resize — a real kernel would rescale pixel data; the stub
    * keeps the metadata arithmetic (aspect-preserving fit) real. Uses
    * FLOOR (integer) arithmetic so the SQL oracle reproduces it with
    * integer division — no float-rounding boundary between engines.
    */
  def resizeStub(width: Int, height: Int, maxSide: Int): (Int, Int) = {
    val longSide = math.max(width, height)
    if (longSide <= maxSide) (width, height)
    else (math.max(1, width * maxSide / longSide),
      math.max(1, height * maxSide / longSide))
  }
}
