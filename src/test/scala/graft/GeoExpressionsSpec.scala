package graft

import org.apache.spark.sql.functions._
import graft.functions.GeoFunctions

/** Native Catalyst expressions: SQL registration via GraftExtensions,
  * agreement with the pure functions, null propagation, constant folding. */
class GeoExpressionsSpec extends SparkSpec {

  test("geohash_encode and haversine_meters resolve from SQL") {
    val r = spark.sql(
      """SELECT geohash_encode(31.2304, 121.4737, 5) AS g,
        |       haversine_meters(0, 0, 1, 0) AS d""".stripMargin).head()
    assert(r.getString(0) == "wtw3s")
    assert(math.abs(r.getDouble(1) - math.Pi * 6372800.0 / 180.0) < 1e-6)
  }

  test("native expressions agree with the Scala functions on random points") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(11)
    val pts = Seq.fill(200)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
      .toDF("lat", "lon")
    val rows = pts.select($"lat", $"lon",
      call_function("geohash_encode", $"lat", $"lon", lit(7)).as("gh"),
      call_function("haversine_meters", $"lat", $"lon", lit(31.23), lit(121.47)).as("d"))
      .collect()
    rows.foreach { r =>
      assert(r.getString(2) == GeoFunctions.geohashEncode(r.getDouble(0), r.getDouble(1), 7))
      assert(r.getDouble(3) ==
        GeoFunctions.haversineMeters(r.getDouble(0), r.getDouble(1), 31.23, 121.47))
    }
  }

  test("geohash_neighbors native expression matches the Scala function") {
    val s = spark
    import s.implicits._
    val rnd = new scala.util.Random(13)
    val cells = (Seq.fill(100)((rnd.nextDouble() * 180 - 90, rnd.nextDouble() * 360 - 180))
      ++ Seq((89.99, 0.0), (-89.99, 0.0), (0.0, 179.99), (0.0, -179.99)))
      .map { case (la, lo) => GeoFunctions.geohashEncode(la, lo, 5) }
    val rows = cells.toDF("gh")
      .select($"gh", call_function("geohash_neighbors", $"gh").as("nb"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == GeoFunctions.geohashNeighbors(r.getString(0)))
    }
  }

  test("geohash_neighbors folds constants and propagates null") {
    val folded = spark.sql("SELECT geohash_neighbors('wtw3s') AS nb")
      .queryExecution.optimizedPlan
    assert(folded.toString.contains("wtw3t"), folded.toString) // an adjacent cell
    assert(spark.sql("SELECT geohash_neighbors(CAST(NULL AS STRING)) AS nb").head().isNullAt(0))
  }

  test("null inputs propagate to null (nullIntolerant)") {
    val r = spark.sql(
      """SELECT geohash_encode(CAST(NULL AS DOUBLE), 121.0, 5) AS g,
        |       haversine_meters(1.0, CAST(NULL AS DOUBLE), 2.0, 2.0) AS d""".stripMargin)
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("constant arguments fold at plan time") {
    val plan = spark.sql("SELECT geohash_encode(31.2304, 121.4737, 5) AS g")
      .queryExecution.optimizedPlan
    // after ConstantFolding the literal result appears in the plan
    assert(plan.toString.contains("wtw3s"))
  }
}
