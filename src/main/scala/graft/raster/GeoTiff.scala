package graft.raster

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM Cloud-Optimized GeoTIFF codec (SNK-1; reference
  * behavior at ETL.py:259–262 — `CopyRaster_management(...,
  * "CLOUD_OPTIMIZED_GEOTIFF")` + `DefineProjection_management`). The
  * container image has no GDAL, so this is a from-the-spec TIFF 6.0
  * writer: single band, float32 samples, TILED, no compression,
  * little-endian, with the three GeoTIFF georeferencing tags
  * (ModelPixelScale, ModelTiepoint, GeoKeyDirectory carrying the
  * projected CRS code) and GDAL's NODATA ascii tag.
  *
  * COG layout (what distinguishes this from a plain tiled TIFF):
  *   1. ALL IFDs live at the head of the file — the full-resolution
  *      IFD first, then one reduced-resolution overview IFD per 2×
  *      pyramid level (NewSubfileType = 1), chained via next-IFD
  *      pointers, each level halving (ceil) until the image fits a
  *      single tile.
  *   2. The tile offset/count arrays follow the IFDs, still ahead of
  *      any pixel data, so one small initial HTTP range read captures
  *      every byte a client needs to plan tile fetches.
  *   3. Tile data is ordered SMALLEST overview first, full resolution
  *      last — a zoomed-out viewer reads only the head of the file.
  *
  * Overview pixels are the NODATA-aware 2×2 block mean of the previous
  * level (exactly q_raster_downsample's math), with each level rounded
  * to float32 before it feeds the next so the emitted file is
  * self-consistent: decoding level i and downsampling it reproduces
  * level i+1 bit-for-bit.
  *
  * The byte layout is DETERMINISTIC and closed-form in (ncols, nrows):
  * header(8) + mainIFD(2 + 15·12 + 4) + (nLevels−1)·ovIFD(2 + 12·12 +
  * 4) + pixel-scale(24) + tiepoint(48) + geokeys(32) + nodata-ascii(6)
  * + Σᵢ[offset/count arrays 8·ntᵢ iff ntᵢ > 1] + Σᵢ ntᵢ·TileW·TileH·4 —
  * `expectedLength` is that formula, and q_geotiff_catalog gates
  * emitted bytes against the same arithmetic (recursive-CTE pyramid)
  * in the DuckDB oracle.
  */
object GeoTiff {

  /** Default tile size: small so the tiny test grids (≤12×9) still
    * exercise the multi-tile path AND grow a real overview level, and
    * so the catalog oracle's closed-form arithmetic stays fixture-
    * scale. NOTE: TIFF 6.0 requires tile dimensions be multiples of
    * 16 for strict conformance — production callers should pass
    * tw/th = 256 (spec-conformant, range-read friendly); the layout
    * math, writer, and reader are tile-size-independent and the
    * conformant path is spec-tested (GeoTiffSpec).
    */
  val TileW = 8
  val TileH = 8

  private val NTags = 15
  private val NTagsOv = 12
  private val HeaderLen = 8
  private val IfdLen = 2 + NTags * 12 + 4 // 186
  private val IfdOvLen = 2 + NTagsOv * 12 + 4 // 150
  private val PixelScaleLen = 24
  private val TiepointLen = 48
  private val GeoKeysLen = 32 // 16 shorts: 4 header + 3 keys × 4
  private val NodataAsciiLen = 6 // "-9999" + NUL (TIFF ASCII fields are NUL-terminated)

  def nTilesX(ncols: Int, tw: Int = TileW): Int = (ncols + tw - 1) / tw
  def nTilesY(nrows: Int, th: Int = TileH): Int = (nrows + th - 1) / th
  def nTiles(ncols: Int, nrows: Int, tw: Int = TileW, th: Int = TileH): Int =
    nTilesX(ncols, tw) * nTilesY(nrows, th)

  /** Pyramid level dimensions, full resolution first: halve (ceiling)
    * while the level still spans more than one tile. A grid already
    * fitting one tile gets no overviews.
    */
  def levelDims(ncols: Int, nrows: Int, tw: Int = TileW,
      th: Int = TileH): Vector[(Int, Int)] = {
    val b = Vector.newBuilder[(Int, Int)]
    var w = ncols; var h = nrows
    b += ((w, h))
    while (w > tw || h > th) {
      w = (w + 1) / 2; h = (h + 1) / 2
      b += ((w, h))
    }
    b.result()
  }

  /** Total tiles across the whole pyramid. */
  def nTilesAll(ncols: Int, nrows: Int, tw: Int = TileW, th: Int = TileH): Int =
    levelDims(ncols, nrows, tw, th)
      .map { case (w, h) => nTiles(w, h, tw, th) }.sum

  /** Closed-form emitted length — mirrored by q_geotiff_catalog's
    * oracle SQL (recursive CTE over the same halving). The 8·nt term
    * exists only when a level's tile offset/count arrays overflow
    * their inline 4-byte slots (nt > 1).
    */
  def expectedLength(ncols: Int, nrows: Int, tw: Int = TileW,
      th: Int = TileH): Long = {
    val lv = levelDims(ncols, nrows, tw, th)
    val fixed = HeaderLen.toLong + IfdLen + (lv.size - 1).toLong * IfdOvLen +
      PixelScaleLen + TiepointLen + GeoKeysLen + NodataAsciiLen
    val arrays = lv.iterator.map { case (w, h) =>
      val nt = nTiles(w, h, tw, th); if (nt > 1) 8L * nt else 0L
    }.sum
    val tiles = lv.iterator.map { case (w, h) =>
      nTiles(w, h, tw, th).toLong * tw * th * 4
    }.sum
    fixed + arrays + tiles
  }

  // TIFF field types
  private val TShort = 3
  private val TLong = 4
  private val TAscii = 2
  private val TDouble = 12

  /** One 2× downsample step: NODATA-aware 2×2 block mean (the
    * q_raster_downsample kernel), result rounded to float32 — the
    * precision the file stores, so cascaded levels are reproducible
    * from the emitted bytes alone.
    */
  def downsample(vals: Array[Double], w: Int, h: Int,
      nodata: Double): Array[Double] = {
    val bw = (w + 1) / 2; val bh = (h + 1) / 2
    val out = new Array[Double](bw * bh)
    // the pyramid lives on the float32-rounded grid (level 0 is rounded
    // before the first call, every level's means are rounded on output),
    // so the sentinel must be rounded the same way: an unrounded nodata
    // like -9999.9 would never equal any rounded pixel (ADVICE r11)
    val nd = nodata.toFloat.toDouble
    var bi = 0
    while (bi < out.length) {
      val r0 = (bi / bw) * 2; val c0 = (bi % bw) * 2
      var sum = 0.0; var n = 0
      var r = r0
      while (r < math.min(r0 + 2, h)) {
        var c = c0
        while (c < math.min(c0 + 2, w)) {
          val v = vals(r * w + c)
          if (v != nd) { sum += v; n += 1 }
          c += 1
        }
        r += 1
      }
      out(bi) = if (n == 0) nd else (sum / n).toFloat.toDouble
      bi += 1
    }
    out
  }

  /** Encode one grid as a COG-layout GeoTIFF. Tile padding cells
    * (outside the grid) are written as 0.0f so each level's whole-
    * tile-data pixel sum equals its plain cell-value sum — the
    * checksum the catalog oracle computes.
    */
  /** Preflight for the classic-TIFF 2 GiB ceiling (ADVICE r10): the
    * writer's offsets are Int arithmetic, so refuse loudly at the size
    * where they would wrap instead of emitting garbage. Public so sink
    * callers can validate dimensions before materializing pixels.
    */
  def checkWritable(ncols: Int, nrows: Int, tw: Int = TileW,
      th: Int = TileH): Unit =
    require(expectedLength(ncols, nrows, tw, th) <= Int.MaxValue.toLong,
      s"raster ${ncols}x$nrows exceeds this writer's 2 GiB " +
        "single-file limit (classic-TIFF Int offsets); shard the raster")

  def write(g: AsciiGrid, srid: Int = 2193, tw: Int = TileW,
      th: Int = TileH): Array[Byte] = {
    require(tw > 0 && th > 0, "tile dimensions must be positive")
    checkWritable(g.ncols, g.nrows, tw, th)
    val lv = levelDims(g.ncols, g.nrows, tw, th)
    val nLevels = lv.size
    val tileBytes = tw * th * 4
    val ntBy = lv.map { case (w, h) => nTiles(w, h, tw, th) }

    // pixel arrays per level, float32-rounded, cascading
    val valsBy = new Array[Array[Double]](nLevels)
    valsBy(0) = g.values.map(_.toFloat.toDouble)
    var i = 1
    while (i < nLevels) {
      val (pw, ph) = lv(i - 1)
      valsBy(i) = downsample(valsBy(i - 1), pw, ph, g.nodata)
      i += 1
    }

    // file offsets (all closed-form)
    def ifdOffset(level: Int): Int =
      HeaderLen + (if (level == 0) 0 else IfdLen + (level - 1) * IfdOvLen)
    val extBase = HeaderLen + IfdLen + (nLevels - 1) * IfdOvLen
    val offPixelScale = extBase
    val offTiepoint = offPixelScale + PixelScaleLen
    val offGeoKeys = offTiepoint + TiepointLen
    val offNodata = offGeoKeys + GeoKeysLen
    val offArrays = offNodata + NodataAsciiLen
    // per-level external-array offsets, laid out in level order
    val arrOff = new Array[Int](nLevels)
    var cursor = offArrays
    i = 0
    while (i < nLevels) {
      arrOff(i) = cursor
      if (ntBy(i) > 1) cursor += 8 * ntBy(i)
      i += 1
    }
    // tile data: smallest overview FIRST, full resolution LAST (COG)
    val tileDataOff = new Array[Int](nLevels)
    i = nLevels - 1
    while (i >= 0) {
      tileDataOff(i) = cursor
      cursor += ntBy(i) * tileBytes
      i -= 1
    }
    val total = expectedLength(g.ncols, g.nrows, tw, th).toInt
    require(cursor == total, s"layout drift: planned $cursor vs formula $total")
    val buf = ByteBuffer.allocate(total).order(ByteOrder.LITTLE_ENDIAN)

    // header: II, magic 42, first-IFD offset
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(HeaderLen)

    def tag(id: Int, tpe: Int, count: Int, value: Int): Unit = {
      buf.putShort(id.toShort).putShort(tpe.toShort).putInt(count)
      if (tpe == TShort && count == 1) buf.putShort(value.toShort).putShort(0)
      else buf.putInt(value)
    }
    def tileTags(level: Int): Unit = {
      val nt = ntBy(level)
      tag(322, TLong, 1, tw)                 // TileWidth
      tag(323, TLong, 1, th)                 // TileLength
      if (nt == 1) tag(324, TLong, 1, tileDataOff(level))
      else tag(324, TLong, nt, arrOff(level))          // TileOffsets
      if (nt == 1) tag(325, TLong, 1, tileBytes)
      else tag(325, TLong, nt, arrOff(level) + 4 * nt) // TileByteCounts
    }

    // main IFD: tag count, then 15 entries ascending by tag id
    buf.putShort(NTags.toShort)
    tag(256, TLong, 1, g.ncols)            // ImageWidth
    tag(257, TLong, 1, g.nrows)            // ImageLength
    tag(258, TShort, 1, 32)                // BitsPerSample
    tag(259, TShort, 1, 1)                 // Compression = none
    tag(262, TShort, 1, 1)                 // Photometric = BlackIsZero
    tag(277, TShort, 1, 1)                 // SamplesPerPixel
    tileTags(0)
    tag(339, TShort, 1, 3)                 // SampleFormat = IEEE float
    tag(33550, TDouble, 3, offPixelScale)  // ModelPixelScale
    tag(33922, TDouble, 6, offTiepoint)    // ModelTiepoint
    tag(34735, TShort, 16, offGeoKeys)     // GeoKeyDirectory
    tag(42113, TAscii, NodataAsciiLen, offNodata) // GDAL_NODATA
    buf.putInt(if (nLevels > 1) ifdOffset(1) else 0) // next IFD

    // overview IFDs: 12 tags each, chained
    i = 1
    while (i < nLevels) {
      val (w, h) = lv(i)
      buf.putShort(NTagsOv.toShort)
      tag(254, TLong, 1, 1)                // NewSubfileType = reduced-res
      tag(256, TLong, 1, w)
      tag(257, TLong, 1, h)
      tag(258, TShort, 1, 32)
      tag(259, TShort, 1, 1)
      tag(262, TShort, 1, 1)
      tag(277, TShort, 1, 1)
      tileTags(i)
      tag(339, TShort, 1, 3)
      buf.putInt(if (i + 1 < nLevels) ifdOffset(i + 1) else 0)
      i += 1
    }

    // external value areas, fixed order
    buf.putDouble(g.cellsize).putDouble(g.cellsize).putDouble(0.0)
    // tiepoint: raster (0,0,0) = upper-left corner -> (xll, ymax, 0)
    buf.putDouble(0.0).putDouble(0.0).putDouble(0.0)
      .putDouble(g.xllcorner).putDouble(g.ymax).putDouble(0.0)
    // GeoKeyDirectory: version 1.1.0, 3 keys
    Seq(1, 1, 0, 3,
      1024, 0, 1, 1,      // GTModelTypeGeoKey = projected
      1025, 0, 1, 1,      // GTRasterTypeGeoKey = PixelIsArea
      3072, 0, 1, srid    // ProjectedCSTypeGeoKey
    ).foreach(v => buf.putShort(v.toShort))
    buf.put("-9999\u0000".getBytes("US-ASCII"))

    // per-level tile offset/count arrays (only levels with nt > 1)
    i = 0
    while (i < nLevels) {
      val nt = ntBy(i)
      if (nt > 1) {
        var t = 0
        while (t < nt) { buf.putInt(tileDataOff(i) + t * tileBytes); t += 1 }
        t = 0
        while (t < nt) { buf.putInt(tileBytes); t += 1 }
      }
      i += 1
    }

    // tile data, smallest level first: row-major tiles, row-major
    // pixels within a tile, padding 0.0f
    i = nLevels - 1
    while (i >= 0) {
      val (w, h) = lv(i)
      val vals = valsBy(i)
      val ntx = nTilesX(w, tw); val nty = nTilesY(h, th)
      var ty = 0
      while (ty < nty) {
        var tx = 0
        while (tx < ntx) {
          var r = 0
          while (r < th) {
            var c = 0
            while (c < tw) {
              val gr = ty * th + r; val gc = tx * tw + c
              val v = if (gr < h && gc < w) vals(gr * w + gc) else 0.0
              buf.putFloat(v.toFloat)
              c += 1
            }
            r += 1
          }
          tx += 1
        }
        ty += 1
      }
      i -= 1
    }
    require(buf.position() == total,
      s"layout drift: wrote ${buf.position()} of $total planned bytes")
    buf.array()
  }

  /** Decoded view: full-res grid pixels (padding cropped) +
    * georeferencing + the decoded overview pyramid (each overview's
    * georeferencing synthesized from the main grid's: cellsize doubles
    * per level, anchored at the same upper-left corner).
    */
  final case class Parsed(grid: AsciiGrid, srid: Int, nTiles: Int,
      tileW: Int, tileH: Int, overviews: Vector[AsciiGrid] = Vector.empty) {
    def nIfds: Int = 1 + overviews.size
  }

  /** Generic baseline-TIFF reader for the subset this writer emits —
    * walks the IFD chain by tag id (not by fixed offset), so it would
    * catch a writer layout bug rather than mirror it.
    */
  def read(bytes: Array[Byte]): Parsed = {
    val buf = ByteBuffer.wrap(bytes)
    require(bytes(0) == 'I' && bytes(1) == 'I', "not little-endian TIFF")
    buf.order(ByteOrder.LITTLE_ENDIAN)
    require(buf.getShort(2) == 42, "bad TIFF magic")

    // one IFD at `ifd` -> (tags, next-IFD offset)
    def parseIfd(ifd: Int): (Map[Int, (Int, Int, Int)], Int) = {
      val n = buf.getShort(ifd) & 0xffff
      var tags = Map.empty[Int, (Int, Int, Int)]
      var i = 0
      while (i < n) {
        val e = ifd + 2 + i * 12
        tags += (buf.getShort(e) & 0xffff) ->
          ((buf.getShort(e + 2) & 0xffff, buf.getInt(e + 4), e + 8))
        i += 1
      }
      (tags, buf.getInt(ifd + 2 + n * 12))
    }
    def intVal(tags: Map[Int, (Int, Int, Int)], id: Int): Int = {
      val (tpe, count, slot) = tags(id)
      require(count == 1, s"tag $id: expected scalar, count=$count")
      if (tpe == TShort) buf.getShort(slot) & 0xffff else buf.getInt(slot)
    }
    // a corrupted count field must fail loudly, never drive a blind
    // multi-GB allocation; 2^24 entries is far past any classic-TIFF
    // file this reader can address
    def checkCount(id: Int, count: Int): Unit =
      require(count >= 1 && count <= (1 << 24),
        s"tag $id: implausible value count $count")
    def longArr(tags: Map[Int, (Int, Int, Int)], id: Int): Array[Int] = {
      val (tpe, count, slot) = tags(id)
      require(tpe == TLong, s"tag $id: expected LONG")
      checkCount(id, count)
      if (count == 1) Array(buf.getInt(slot))
      else { val off = buf.getInt(slot); Array.tabulate(count)(j => buf.getInt(off + 4 * j)) }
    }
    def doubleArr(tags: Map[Int, (Int, Int, Int)], id: Int): Array[Double] = {
      val (_, count, slot) = tags(id)
      checkCount(id, count)
      val off = buf.getInt(slot)
      Array.tabulate(count)(j => buf.getDouble(off + 8 * j))
    }
    // decode one IFD's tiled float32 pixels (padding cropped)
    def pixels(tags: Map[Int, (Int, Int, Int)]): (Int, Int, Int, Int, Int, Array[Double]) = {
      val w = intVal(tags, 256); val h = intVal(tags, 257)
      require(intVal(tags, 258) == 32 && intVal(tags, 339) == 3, "expected float32 samples")
      require(intVal(tags, 259) == 1, "expected uncompressed")
      // all size math below in Long first: a corrupt header claiming
      // huge dims must hit THESE requires, not wrap Int products into
      // a NegativeArraySize/IndexOutOfBounds further down. 2^29 pixels
      // is already past what a 2 GiB classic-TIFF file can address.
      require(w > 0 && h > 0 && w.toLong * h <= (1L << 29),
        s"bad or implausible image dims ${w}x$h")
      val tw = intVal(tags, 322); val th = intVal(tags, 323)
      require(tw > 0 && th > 0 && tw.toLong * th * 4 <= Int.MaxValue.toLong,
        s"bad or implausible tile dims ${tw}x$th")
      val offsets = longArr(tags, 324); val counts = longArr(tags, 325)
      val ntx = (w + tw - 1) / tw
      val nty = (h + th - 1) / th
      // corrupted counts must fail loudly before any blind allocation
      require(offsets.length == ntx * nty && counts.length == offsets.length,
        s"tile index mismatch: ${offsets.length} offsets / ${counts.length} " +
          s"counts for ${ntx}x$nty tiles")
      val values = new Array[Double](w * h)
      var t = 0
      while (t < offsets.length) {
        require(counts(t).toLong == tw.toLong * th * 4,
          s"tile $t: unexpected byte count")
        val ty = t / ntx; val tx = t % ntx
        var r = 0
        while (r < th) {
          var c = 0
          while (c < tw) {
            val gr = ty * th + r; val gc = tx * tw + c
            if (gr < h && gc < w)
              values(gr * w + gc) = buf.getFloat(offsets(t) + (r * tw + c) * 4).toDouble
            c += 1
          }
          r += 1
        }
        t += 1
      }
      (w, h, tw, th, offsets.length, values)
    }

    val (tags0, next0) = parseIfd(buf.getInt(4))
    val (w, h, tw, th, nt0, values) = pixels(tags0)
    val scale = doubleArr(tags0, 33550)
    // AsciiGrid carries ONE cellsize and the overview chain synthesizes
    // its y-extent from scale(0); a non-square-pixel file (which this
    // otherwise-generic baseline reader could parse) would come back
    // with a silently wrong vertical extent — fail loudly instead
    // (ADVICE r11)
    require(scale(0) == scale(1),
      s"non-square pixels (${scale(0)} x ${scale(1)}) not representable")
    val tie = doubleArr(tags0, 33922)
    // geokeys: scan the key directory for ProjectedCSTypeGeoKey (3072)
    val (_, gkCount, gkSlot) = tags0(34735)
    val gkOff = buf.getInt(gkSlot)
    val keys = Array.tabulate(gkCount)(j => buf.getShort(gkOff + 2 * j) & 0xffff)
    val srid = keys.grouped(4).drop(1)
      .collectFirst { case Array(3072, 0, 1, v) => v }
      .getOrElse(0)
    // nodata ascii
    val (_, ndCount, ndSlot) = tags0(42113)
    val ndOff = buf.getInt(ndSlot)
    val nodata = new String(bytes, ndOff, ndCount - 1, "US-ASCII").trim.toDouble
    val xll = tie(3)
    val ymax = tie(4)
    val yll = ymax - h * scale(1)

    // follow the overview chain
    val ovs = Vector.newBuilder[AsciiGrid]
    var next = next0
    var level = 1
    // a corrupted/hostile file can point the next-IFD offset back into
    // the chain; without these guards the walk would loop forever
    var visited = Set(buf.getInt(4))
    while (next != 0) {
      require(!visited(next), s"cyclic IFD chain (offset $next revisited)")
      require(visited.size <= 32, "IFD chain longer than 32 levels — refusing")
      visited += next
      val (tags, n2) = parseIfd(next)
      require(intVal(tags, 254) == 1, "chained IFD is not a reduced-resolution overview")
      val (ow, oh, otw, oth, _, ovals) = pixels(tags)
      require(otw == tw && oth == th, "overview tile size differs from main")
      val cs = scale(0) * (1L << level)
      ovs += AsciiGrid(ow, oh, xll, ymax - oh * cs, cs, nodata, ovals)
      next = n2
      level += 1
    }
    Parsed(AsciiGrid(w, h, xll, yll, scale(0), nodata, values), srid,
      nt0, tw, th, ovs.result())
  }
}
