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

  /** Parsed container header — what [[decodeImageHeader]] returns. */
  final case class ImageHeader(
      doc_id: Long,
      format: String,
      width: Int,
      height: Int,
      channels: Int,
      header_len: Int)

  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  private val PngMagic =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Build a spec-conformant PNG signature + IHDR chunk (no pixel
    * data): 8-byte magic, chunk length 13 (big-endian), "IHDR",
    * width/height as big-endian i32, bit depth 8, color type from the
    * channel count (0 gray, 2 RGB, 6 RGBA), zeroed CRC (the header
    * decoder doesn't checksum).
    */
  def encodePngHeader(width: Int, height: Int, channels: Int): Array[Byte] = {
    val colorType = channels match {
      case 1 => 0; case 2 => 4; case 3 => 2; case _ => 6
    }
    val out = new Array[Byte](33)
    PngMagic.copyToArray(out, 0)
    out(11) = 13 // IHDR data length, big-endian (high bytes stay 0)
    Array[Byte]('I', 'H', 'D', 'R').copyToArray(out, 12)
    var i = 0
    while (i < 4) {
      out(16 + i) = (width >>> (24 - 8 * i)).toByte
      out(20 + i) = (height >>> (24 - 8 * i)).toByte
      i += 1
    }
    out(24) = 8 // bit depth
    out(25) = colorType.toByte
    out // compression/filter/interlace/CRC stay 0
  }

  /** Build a BMP file header + BITMAPINFOHEADER (no pixel data):
    * "BM", 54-byte data offset, 40-byte DIB size, width/height as
    * little-endian i32, 1 plane, bit count = channels·8.
    */
  def encodeBmpHeader(width: Int, height: Int, channels: Int): Array[Byte] = {
    val out = new Array[Byte](54)
    out(0) = 'B'; out(1) = 'M'
    def putLe(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    putLe(2, 54) // file size = headers only (no pixel array)
    putLe(10, 54) // pixel data offset
    putLe(14, 40) // BITMAPINFOHEADER size
    putLe(18, width)
    putLe(22, height)
    out(26) = 1 // planes (2-byte LE)
    // bit count: 2-byte LE at 28; compression dword at 30 stays 0
    out(28) = (channels * 8).toByte; out(29) = ((channels * 8) >>> 8).toByte
    out
  }

  /** REAL header decode — magic-byte dispatch, endian-correct field
    * reads (PNG IHDR is big-endian at offsets 16/20 with the color
    * type at 25; BMP DIB is little-endian at 18/22 with the bit count
    * at 28). This is the genuine parsing a media-lake metadata pass
    * runs; only pixel decode needs an external codec.
    */
  def decodeImageHeader(docId: Long, bytes: Array[Byte]): ImageHeader = {
    if (bytes.length >= 26 && bytes.take(8).sameElements(PngMagic) &&
        bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R') {
      val channels = bytes(25) match {
        case 0 => 1; case 4 => 2; case 2 => 3; case _ => 4
      }
      ImageHeader(docId, "png", beInt(bytes, 16), beInt(bytes, 20),
        channels, bytes.length)
    } else if (bytes.length >= 30 && bytes(0) == 'B' && bytes(1) == 'M') {
      val bits = (bytes(28) & 0xff) | ((bytes(29) & 0xff) << 8)
      ImageHeader(docId, "bmp", leInt(bytes, 18), leInt(bytes, 22),
        math.max(1, bits / 8), bytes.length)
    } else ImageHeader(docId, "unknown", 0, 0, 0, bytes.length)
  }

  /** REAL nearest-neighbor resize of an 8-bpp grayscale pixel plane
    * (the production thumbnail kernel, not a stub): destination pixel
    * (dx, dy) samples source (dx·w ÷ rw, dy·h ÷ rh) — pure integer
    * floor arithmetic, so the SQL oracle re-derives every output pixel
    * with `//` and no float-rounding boundary exists between engines.
    * `pixOff` is where the pixel plane starts in the blob (54 for the
    * fixture BMPs).
    */
  def resizeGrayNearest(blob: Array[Byte], pixOff: Int, w: Int, h: Int,
      rw: Int, rh: Int): Array[Byte] = {
    require(w > 0 && h > 0 && rw > 0 && rh > 0, "resize dims must be positive")
    // Long arithmetic: corrupt/hostile header dims (e.g. 65536×65536)
    // would wrap an Int product to 0 and defeat the very check that
    // exists to catch them
    require(blob.length.toLong >= pixOff.toLong + w.toLong * h,
      "blob shorter than its pixel plane")
    require(rw.toLong * rh <= Int.MaxValue.toLong, "implausible target dims")
    val out = new Array[Byte](rw * rh)
    var dy = 0
    while (dy < rh) {
      val sy = (dy.toLong * h / rh).toInt
      var dx = 0
      while (dx < rw) {
        val sx = (dx.toLong * w / rw).toInt
        out(dy * rw + dx) = blob(pixOff + sy * w + sx)
        dx += 1
      }
      dy += 1
    }
    out
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

  /** Synthesize an 8-bpp grayscale image blob: the real BMP header
    * (little-endian dims, bit count 8) followed by raw row-major
    * top-down pixel bytes — fixture convention: no row padding, no
    * palette (a real BMP is bottom-up and 4-byte padded; the HEADER
    * fields are what the decoder exercises). Pixels are deterministic
    * arithmetic on the SOURCE id — pixel(x, y) = (id·31 + x·7 + y·13)
    * mod 251 — so the SQL oracle can re-derive them without any codec.
    * `bump` nudges pixel (0,0) by +1: the near-duplicate injection, a
    * visually-identical image whose bytes differ.
    */
  def encodeGrayBmp(srcId: Long, bump: Boolean): Array[Byte] = {
    val w = (16 + srcId % 101).toInt
    val h = (16 + (srcId * 7) % 97).toInt
    val out = java.util.Arrays.copyOf(encodeBmpHeader(w, h, 1), 54 + w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var v = ((srcId * 31 + x * 7 + y * 13) % 251).toInt
        if (bump && x == 0 && y == 0) v += 1
        out(54 + y * w + x) = v.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Synthesize a raw audio blob (PCM-u8-mono fixture convention: no
    * header, one byte per sample, 4160 samples = 65 windows × 64).
    * Samples are deterministic arithmetic on the SOURCE id —
    * sample(t) = (id·17 + t·11) mod 251 — so the SQL oracle re-derives
    * them without a codec. `bump` nudges sample 0 by +1: the
    * near-duplicate injection, an audibly-identical clip whose bytes
    * differ.
    */
  /** Per-copy sample-step coefficients for the PCM synth (index =
    * doc_id div 10⁷, the Scale10 copy index; 0 at every gated fixture,
    * where doc_id < 10⁶ — FixtureContractSpec). The base signal
    * (srcId·17 + t·11) mod 251 is fully determined by srcId mod 251,
    * so the whole corpus carries ≤251 distinct signals and true
    * near-dup pairs grow QUADRATICALLY with corpus size (r17 scale
    * runs: ~1.79M Hamming-≤6 pairs at 20× — a degenerate space that
    * made the capped-path recall audit read 0). Varying the t
    * coefficient per copy changes the modular wrap pattern inside
    * every 64-sample window, so copies share no fingerprints: the
    * energy-delta hash spaces of two coefficients from this table
    * overlap in 12 value pairs TOTAL over the full 251-phase space ×
    * all 780 copy pairs (exhaustively enumerated — every one of the 12
    * from the single legacy (109, 142) pair; the r20 extension added
    * ZERO), vs every pair colliding under a shared coefficient.
    * Entries beyond index 0 were vetted by exhaustive scan of all 250
    * units mod 251 for minimal within-copy near-pair density (unvetted
    * picks measure up to ~780k phase-pair collisions — window phase
    * shifts 64k ≈ 0 mod 251 collapse the space; the vetted entries sit
    * at 0–12 distinct-phase pairs each, legacy k=11 at 281) and for
    * bump-dup preservation (every +1-bump stays Hamming ≤ 6 of its
    * source, all 251 phases). Indices 20–39 (r20, for the 40× probe)
    * re-ran the same exhaustive scan: candidate pool = bump-safe units
    * with within-copy density ≤ 12, greedy pick minimizing added
    * cross-coefficient collisions against the growing set — every pick
    * added 0. Scale10Spec pins the per-copy dispersion (VERDICT r17 #3).
    */
  private val PcmCoef: Array[Long] = Array(
    11, 45, 53, 60, 61, 65, 68, 70, 73, 74,
    80, 95, 96, 104, 105, 109, 111, 140, 142, 146,
    147, 155, 156, 171, 177, 178, 181, 183, 186, 190,
    191, 198, 206, 88, 115, 136, 163, 44, 207, 119)

  def encodePcm(srcId: Long, bump: Boolean): Array[Byte] = {
    val out = new Array[Byte](4160)
    // No silent wrap past the vetted table: a ≥(PcmCoef.length)× fixture
    // reusing coefficients would reintroduce the cross-copy fingerprint
    // collapse this table exists to fix (ADVICE r18) — extend the vetted
    // table rather than wrapping.
    val copy = srcId / 10000000L
    require(copy >= 0 && copy < PcmCoef.length,
      s"PCM copy index $copy (srcId=$srcId) exceeds the vetted coefficient " +
        s"table (${PcmCoef.length} entries); extend PcmCoef before scaling past " +
        s"${PcmCoef.length} copies")
    val k = PcmCoef(copy.toInt)
    var t = 0
    while (t < 4160) {
      var v = ((srcId * 17 + t * k) % 251).toInt
      if (bump && t == 0) v += 1
      out(t) = v.toByte
      t += 1
    }
    out
  }

  /** Integer-only energy-delta audio fingerprint (the Haitsma–Kalker
    * construction at its core): the blob splits into 65 fixed windows,
    * per-window energy = sum of sample magnitudes, and bit w of the
    * 64-bit hash is set iff energy(w+1) > energy(w). Pure integer
    * comparisons — robust to uniform gain changes in a real pipeline
    * and reproducible in SQL. Returns (docId, hash).
    */
  def audioFp64(docId: Long, blob: Array[Byte]): (Long, Long) = {
    val en = new Array[Long](65)
    var t = 0
    while (t < blob.length) { en(t / 64) += blob(t) & 0xff; t += 1 }
    var hash = 0L
    var w = 0
    while (w < 64) { if (en(w + 1) > en(w)) hash |= 1L << w; w += 1 }
    (docId, hash)
  }

  /** Integer-only average-hash (aHash/blockhash) over a grayscale
    * blob from [[encodeGrayBmp]]: dims parsed from the real header,
    * pixels bucketed into the 8×8 block grid by the exact integer map
    * b = (x·8) div w (no resampling kernel — block averaging IS the
    * downscale), one bit per block set iff the block mean exceeds the
    * global mean, compared cross-multiplied (sum_b·N > S·n_b) so no
    * division ever happens — every step reproducible in SQL integer
    * arithmetic. Returns (docId, 64-bit hash, bit b = block row·8 +
    * col).
    */
  def aHash64(docId: Long, blob: Array[Byte]): (Long, Long) = {
    val w = leInt(blob, 18)
    val h = leInt(blob, 22)
    val sums = new Array[Long](64)
    val cnts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val by = y * 8 / h
      var x = 0
      while (x < w) {
        val b = by * 8 + x * 8 / w
        sums(b) += blob(54 + y * w + x) & 0xff
        cnts(b) += 1
        x += 1
      }
      y += 1
    }
    var ts = 0L; var tc = 0L
    var i = 0
    while (i < 64) { ts += sums(i); tc += cnts(i); i += 1 }
    var hash = 0L
    i = 0
    while (i < 64) {
      if (sums(i) * tc > ts * cnts(i)) hash |= 1L << i
      i += 1
    }
    (docId, hash)
  }
}
