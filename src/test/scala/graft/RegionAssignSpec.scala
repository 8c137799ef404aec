package graft

import org.apache.spark.sql.functions._
import graft.engine.RegionAssign
import graft.functions.GeoFunctions

/** Cascading fallback join (coalesce form): finer precision wins,
  * unmatched points fall through level by level to the sentinel. */
class RegionAssignSpec extends SparkSpec {

  test("priority ladder: finest geohash match wins, then fallback, then sentinel") {
    val s = spark
    import s.implicits._
    // dictionary POIs: one at Shanghai center, one ~0.3 deg away (shares
    // geohash3 but not geohash6 with the center)
    val dict = Seq(
      (100L, 31.2304, 121.4737),
      (200L, 31.4000, 121.6000)
    ).toDF("agent", "dlat", "dlon")
    val points = Seq(
      (1L, 31.2304, 121.4737), // exact: matches agent 100 at p6
      (2L, 31.4001, 121.6001), // ~agent 200's p6 cell
      (3L, 31.3000, 121.5200), // same p3 cell, different p6: fallback level
      (4L, -33.8600, 151.2100) // Sydney: no match at all -> sentinel
    ).toDF("id", "lat", "lon")
    val out = RegionAssign.assign(points, col("lat"), col("lon"),
        dict, col("dlat"), col("dlon"), col("agent"),
        precisions = Seq(6, 3), sentinel = 0L)
      .select($"id", $"agent_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) == 100L)
    assert(out(2L) == 200L)
    // point 3 misses both p6 cells but shares the p3 cell with both POIs:
    // per-cell dedupe keeps min(agent) = 100
    assert(GeoFunctions.geohashEncode(31.3000, 121.5200, 3) ==
      GeoFunctions.geohashEncode(31.2304, 121.4737, 3))
    assert(out(3L) == 100L)
    assert(out(4L) == 0L)
  }

  test("neighbor expansion: a fix one cell away matches; two cells away does not") {
    val s = spark
    import s.implicits._
    val dict = Seq((100L, 31.2304, 121.4737)).toDF("agent", "dlat", "dlon")
    val home = GeoFunctions.geohashEncode(31.2304, 121.4737, 6)
    val (xi, yi) = GeoFunctions.decodeIndices(home)
    // centers of the east neighbor (+1 cell) and a +2-cell miss
    def center(dx: Long, dy: Long) = GeoFunctions.geohashCenter(
      GeoFunctions.encodeIndices(xi + dx, yi + dy, 6))
    val (nLat, nLon) = center(1, 0)
    val (fLat, fLon) = center(2, 0)
    val points = Seq((1L, nLat, nLon), (2L, fLat, fLon)).toDF("id", "lat", "lon")
    def run(expand: Boolean) = RegionAssign.assign(points, col("lat"), col("lon"),
        dict, col("dlat"), col("dlon"), col("agent"),
        precisions = Seq(6), sentinel = 0L, expandNeighbors = expand)
      .select($"id", $"agent_id").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val plain = run(expand = false)
    assert(plain(1L) == 0L && plain(2L) == 0L) // exact join: both miss
    val nb = run(expand = true)
    assert(nb(1L) == 100L) // adjacent cell claimed by the expanded dict
    assert(nb(2L) == 0L)   // 2 cells away stays unclaimed
  }

  test("dictAtNeighbors: overlapping 3x3 blocks keep the global min agent") {
    val s = spark
    import s.implicits._
    // two POIs in ADJACENT p6 cells: their 3x3 blocks overlap; every
    // overlapped cell must resolve to min(5, 9) = 5
    val home = GeoFunctions.geohashEncode(31.2304, 121.4737, 6)
    val (xi, yi) = GeoFunctions.decodeIndices(home)
    val (aLat, aLon) = GeoFunctions.geohashCenter(GeoFunctions.encodeIndices(xi, yi, 6))
    val (bLat, bLon) = GeoFunctions.geohashCenter(GeoFunctions.encodeIndices(xi + 1, yi, 6))
    val dict = Seq((9L, aLat, aLon), (5L, bLat, bLon)).toDF("agent", "dlat", "dlon")
    val d = RegionAssign.dictAtNeighbors(dict, col("dlat"), col("dlon"), col("agent"), 6)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 3x3 ∪ 3x3 of adjacent cells = 12 distinct cells
    assert(d.size == 12)
    // the home cell is inside both blocks -> min wins
    assert(d(home) == 5L)
    // a cell only in POI a's block keeps a's agent
    val westOfA = GeoFunctions.encodeIndices(xi - 1, yi, 6)
    assert(d(westOfA) == 9L)
  }

  test("dictAt dedupes each cell to the smallest agent id") {
    val s = spark
    import s.implicits._
    val dict = Seq(
      (9L, 31.2304, 121.4737),
      (5L, 31.2305, 121.4738) // same p6 cell
    ).toDF("agent", "dlat", "dlon")
    val d = RegionAssign.dictAt(dict, col("dlat"), col("dlon"), col("agent"), 6)
      .collect()
    assert(d.length == 1)
    assert(d(0).getLong(1) == 5L)
  }
}
