package graft.core

/** Web-Mercator Z/X/Y tile math (standard slippy-map scheme) — the
  * raster-tile assignment target grid (north_star: "raster-tile assignment
  * mapping decoded image pixels to Z/X/Y tiles"). */
object TileMath {
  val MaxLat = 85.05112878

  @inline def clampLat(lat: Double): Double =
    if (lat > MaxLat) MaxLat else if (lat < -MaxLat) -MaxLat else lat

  def tileX(lon: Double, z: Int): Long = {
    val n = 1L << z
    val x = math.floor((lon + 180.0) / 360.0 * n).toLong
    if (x < 0) 0 else if (x >= n) n - 1 else x
  }

  def tileY(lat: Double, z: Int): Long = {
    val n = 1L << z
    val latR = math.toRadians(clampLat(lat))
    val y = math.floor((1.0 - math.log(math.tan(latR) + 1.0 / math.cos(latR)) / math.Pi) / 2.0 * n).toLong
    if (y < 0) 0 else if (y >= n) n - 1 else y
  }

  /** Packed tile key: [z (6 bits) | x (29) | y (29)]. */
  def pack(z: Int, x: Long, y: Long): Long = (z.toLong << 58) | (x << 29) | y
  def unpack(t: Long): (Int, Long, Long) =
    ((t >>> 58).toInt, (t >> 29) & ((1L << 29) - 1), t & ((1L << 29) - 1))

  /** Tile of a lon/lat point at zoom z. */
  def tile(lon: Double, lat: Double, z: Int): Long = pack(z, tileX(lon, z), tileY(lat, z))

  /** Inverse: tile x -> west longitude, tile y -> north latitude. */
  def tileLon(x: Long, z: Int): Double = x.toDouble / (1L << z) * 360.0 - 180.0
  def tileLat(y: Long, z: Int): Double = {
    val n = math.Pi - 2.0 * math.Pi * y.toDouble / (1L << z)
    math.toDegrees(math.atan(math.sinh(n)))
  }
}
