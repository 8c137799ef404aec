package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Geospatial scalar functions the reference engine exposes:
  *
  *  - geohash encode at precision 5..8 (reference behavior:
  *    `region.py:34-40`, `cal_orig_area.py:45-52`,
  *    `cal_subarea_portion.py:79-80,152-155` — Python `Geohash.encode`
  *    wrapped in per-precision UDFs);
  *  - geohash neighbor expansion, the 3×3 block of self + 8 adjacent cells
  *    (`cal_orig_area.py:62-72`, `cal_subarea_portion.py:170-178`);
  *  - haversine great-circle distance in meters, R=6372800
  *    (`cal_subarea_portion.py:83-92`).
  *
  * The geohash is computed by *integer cell-index scaling* rather than
  * per-bit interval bisection: precision p has ceil(5p/2) longitude bits
  * and floor(5p/2) latitude bits; `xi = floor((lon+180)/360 * 2^lonBits)`
  * (clamped), `yi` likewise; the base-32 string is the MSB-first
  * interleave (lon bit first) of xi/yi. This is numerically identical to
  * the classic bisection for all non-boundary points, makes neighbor
  * computation exact integer arithmetic (no re-encode drift), and — the
  * design reason — is expressible 1:1 in ANSI SQL so the DuckDB oracle
  * can verify geohash-bearing queries (no geohash built-in in DuckDB).
  * Fresh implementation from the public geohash spec (geohash.org).
  */
object GeoFunctions {
  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  def lonBits(precision: Int): Int = (5 * precision + 1) / 2
  def latBits(precision: Int): Int = (5 * precision) / 2

  /** Integer cell index of a coordinate along one axis. */
  private def cellIndex(v: Double, lo: Double, span: Double, bits: Int): Long = {
    val n = 1L << bits
    val i = math.floor((v - lo) / span * n).toLong
    if (i < 0) 0L else if (i >= n) n - 1 else i
  }

  def lonIndex(lon: Double, precision: Int): Long = cellIndex(lon, -180.0, 360.0, lonBits(precision))
  def latIndex(lat: Double, precision: Int): Long = cellIndex(lat, -90.0, 180.0, latBits(precision))

  /** Encode from integer cell indices (MSB-first interleave, lon first). */
  def encodeIndices(xi: Long, yi: Long, precision: Int): String = {
    val lb = lonBits(precision); val tb = latBits(precision)
    val sb = new java.lang.StringBuilder(precision)
    var g = 0 // global interleaved bit position
    var ch = 0; var bits = 0
    while (sb.length < precision) {
      val bit =
        if (g % 2 == 0) ((xi >> (lb - 1 - g / 2)) & 1L).toInt
        else ((yi >> (tb - 1 - (g - 1) / 2)) & 1L).toInt
      ch = (ch << 1) | bit
      bits += 1; g += 1
      if (bits == 5) { sb.append(Base32.charAt(ch)); ch = 0; bits = 0 }
    }
    sb.toString
  }

  def geohashEncode(lat: Double, lon: Double, precision: Int): String = {
    require(precision > 0 && precision <= 12, s"precision $precision")
    encodeIndices(lonIndex(lon, precision), latIndex(lat, precision), precision)
  }

  /** Self + 8 neighbors via integer index arithmetic: lon wraps mod 2^lonBits
    * (antimeridian), lat clamps at the poles (out-of-range rows dropped). */
  def geohashNeighbors(gh: String): Seq[String] = {
    val p = gh.length
    val (xi, yi) = decodeIndices(gh)
    val nLon = 1L << lonBits(p); val nLat = 1L << latBits(p)
    val out = for {
      dy <- Seq(-1L, 0L, 1L); dx <- Seq(-1L, 0L, 1L)
      ny = yi + dy if ny >= 0 && ny < nLat
    } yield encodeIndices(java.lang.Math.floorMod(xi + dx, nLon), ny, p)
    out.distinct
  }

  /** [[geohashNeighbors]] in Catalyst's internal representation — the
    * kernel behind the native `geohash_neighbors` expression (called
    * from generated code, so it takes/returns internal types directly:
    * no UTF8String↔String round-trip per element beyond the one decode). */
  def neighborsArray(gh: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val out = geohashNeighbors(gh.toString)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray[Any])
  }

  /** Inverse of encodeIndices. */
  def decodeIndices(gh: String): (Long, Long) = {
    var xi = 0L; var yi = 0L; var g = 0
    gh.foreach { c =>
      val cd = Base32.indexOf(c.toLower)
      require(cd >= 0, s"bad geohash char '$c'")
      var mask = 16
      while (mask > 0) {
        val bit = if ((cd & mask) != 0) 1L else 0L
        if (g % 2 == 0) xi = (xi << 1) | bit else yi = (yi << 1) | bit
        g += 1; mask >>= 1
      }
    }
    (xi, yi)
  }

  /** Cell center (lat, lon). */
  def geohashCenter(gh: String): (Double, Double) = {
    val p = gh.length
    val (xi, yi) = decodeIndices(gh)
    val lonSpan = 360.0 / (1L << lonBits(p)); val latSpan = 180.0 / (1L << latBits(p))
    (-90.0 + (yi + 0.5) * latSpan, -180.0 + (xi + 0.5) * lonSpan)
  }

  /** Great-circle distance in meters (haversine), same Earth radius the
    * reference uses (R=6372800). */
  def haversineMeters(lat1: Double, lon1: Double, lat2: Double, lon2: Double): Double = {
    val R = 6372800.0
    val dLat = math.toRadians(lat2 - lat1)
    val dLon = math.toRadians(lon2 - lon1)
    val a = math.sin(dLat / 2) * math.sin(dLat / 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.sin(dLon / 2) * math.sin(dLon / 2)
    2 * R * math.atan2(math.sqrt(a), math.sqrt(1 - a))
  }

  /** Column-expression haversine built ONLY from codegen'd built-ins —
    * stays inside whole-stage codegen (no UDF boundary) and is
    * expressible 1:1 in the DuckDB oracle. Result in meters. */
  def haversineCol(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val R = lit(6372800.0)
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = sin(dLat / 2) * sin(dLat / 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * sin(dLon / 2) * sin(dLon / 2)
    lit(2) * R * atan2(sqrt(a), sqrt(lit(1) - a))
  }

  /** Column-expression integer cell index along one axis — the Catalyst
    * twin of [[lonIndex]]/[[latIndex]] and of `Portable.lonIndexSql`/
    * `latIndexSql` (same double ops → same cell everywhere). */
  def lonIndexCol(lon: Column, precision: Int): Column = {
    val lb = lonBits(precision)
    least(greatest(floor((lon + 180.0) / 360.0 * lit(1L << lb)), lit(0)), lit((1L << lb) - 1)).cast("long")
  }
  def latIndexCol(lat: Column, precision: Int): Column = {
    val tb = latBits(precision)
    least(greatest(floor((lat + 90.0) / 180.0 * lit(1L << tb)), lit(0)), lit((1L << tb) - 1)).cast("long")
  }

  /** Column-expression geohash encode from the same scaling formula,
    * built from codegen'd built-ins (conv-free: arithmetic + substring).
    * Kept for plan-quality; the UDF below is the simpler default. */
  def geohashCol(lat: Column, lon: Column, precision: Int): Column = {
    val lb = lonBits(precision); val tb = latBits(precision)
    val xi = least(greatest(floor((lon + 180.0) / 360.0 * pow(lit(2), lb)), lit(0)), lit((1L << lb) - 1)).cast("long")
    val yi = least(greatest(floor((lat + 90.0) / 180.0 * pow(lit(2), tb)), lit(0)), lit((1L << tb) - 1)).cast("long")
    val built = (0 until precision).map { k =>
      // char k covers interleaved global bits 5k .. 5k+4
      val digit = (0 until 5).map { j =>
        val g = 5 * k + j
        val bit =
          if (g % 2 == 0) shiftright(xi, lb - 1 - g / 2) % 2
          else shiftright(yi, tb - 1 - (g - 1) / 2) % 2
        bit * lit(1 << (4 - j))
      }.reduce(_ + _)
      substr(lit(Base32), (digit + 1).cast("int"), lit(1))
    }
    concat(built: _*)
  }

  /** Register the geo UDFs for SQL use (reference D1 surface:
    * geohash5..geohash8, plus neighbors and haversine). */
  def register(spark: SparkSession): Unit = {
    spark.udf.register("geohash", (lat: Double, lon: Double, p: Int) => geohashEncode(lat, lon, p))
    Seq(5, 6, 7, 8).foreach { p =>
      spark.udf.register(s"geohash$p", (lat: Double, lon: Double) => geohashEncode(lat, lon, p))
    }
    spark.udf.register("geohash_neighbors", (gh: String) => geohashNeighbors(gh))
    spark.udf.register("haversine_m",
      (lat1: Double, lon1: Double, lat2: Double, lon2: Double) => haversineMeters(lat1, lon1, lat2, lon2))
  }

  def geohashUdf(p: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((lat: Double, lon: Double) => geohashEncode(lat, lon, p))

  val geohashNeighborsUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((gh: String) => geohashNeighbors(gh))
}
