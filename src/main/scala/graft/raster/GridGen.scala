package graft.raster

/** Deterministic synthetic grid per region key — the raster fixture
  * generator shared (by formula) with the DuckDB oracle, mirroring how
  * Manifest derives files from `part`.
  *
  * Per key k: ncols = 8 + k%5, nrows = 6 + k%4, cellsize 500 m
  * (the reference's resolution, ETL.py:479), lower-left anchored at
  * the same (x0,y0) as GeoQueries' triangle for key k, NODATA −9999.
  * Cell i (row-major from the top row):
  *   value(i) = NODATA                    if (13·i + 7·k) mod 11 == 0
  *            = (37·i + 17·k) mod 1000    otherwise  (integer-valued →
  *              exact double arithmetic in both engines)
  */
object GridGen {
  val Nodata = -9999.0

  def ncols(k: Int): Int = 8 + k % 5
  def nrows(k: Int): Int = 6 + k % 4
  def xll(k: Int): Double = 1600000.0 + 9000.0 * k
  def yll(k: Int): Double = 5000000.0 + 7000.0 * k

  def value(k: Int, i: Int): Double =
    if ((13 * i + 7 * k) % 11 == 0) Nodata
    else ((37 * i + 17 * k) % 1000).toDouble

  def gen(k: Int): AsciiGrid = {
    val nc = ncols(k); val nr = nrows(k)
    AsciiGrid(nc, nr, xll(k), yll(k), 500.0, Nodata,
      Array.tabulate(nc * nr)(i => value(k, i)))
  }

  /** The grid as ASCII text — queries run parse(genText(k)) so the
    * parser sits in the executed plan, like a binaryFile read would.
    */
  def genText(k: Int): String = AsciiGrid.write(gen(k))
}
