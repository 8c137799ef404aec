package graft

import org.apache.spark.sql.functions._
import graft.queries.Portable

/** Cross-engine determinism helpers: the portable hash equals the md5
  * prefix value, money sums are exact, dot folds accumulate in order. */
class PortableSpec extends SparkSpec {

  test("portableHash equals int(md5_hex[0:15], 16)") {
    val s = spark
    import s.implicits._
    def expected(x: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8"))
      val hex = d.map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
    val inputs = Seq("hello", "", "a b c", "шанхай", "3-gram shingle here")
    val got = inputs.toDF("x")
      .select(Portable.portableHash($"x").as("h")).collect().map(_.getLong(0))
    inputs.zip(got).foreach { case (in, h) => assert(h == expected(in), in) }
  }

  test("moneySum is exact for fixed-point doubles") {
    val s = spark
    import s.implicits._
    // 0.1 + 0.2 style values that break naive double summation
    val vals = Seq.tabulate(1000)(i => (i % 7) * 0.01 + 10.0)
    val out = vals.toDF("v").agg(Portable.moneySum($"v").as("s")).head().getDouble(0)
    val exact = vals.map(v => math.round(v * 100)).sum / 100.0
    assert(out == exact)
  }

  test("dotFold matches an in-order sequential fold") {
    val s = spark
    import s.implicits._
    val a = Array(0.1f, 0.2f, 0.3f, 0.4f)
    val b = Array(1.5f, -2.5f, 3.5f, 0.5f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(Portable.dotFold($"a", $"b").as("d")).head().getDouble(0)
    var acc = 0.0
    for (i <- a.indices) acc += a(i).toDouble * b(i).toDouble
    assert(got == acc)
  }

  test("pseudo-coordinates stay in valid lat/lon ranges") {
    val s = spark
    import s.implicits._
    val keys = (0L until 10000L).toDF("k")
    val r = keys.select(
      min(Portable.latFromKey($"k")).as("lat_min"), max(Portable.latFromKey($"k")).as("lat_max"),
      min(Portable.lonFromKey($"k")).as("lon_min"), max(Portable.lonFromKey($"k")).as("lon_max"))
      .head()
    assert(r.getDouble(0) >= -90 && r.getDouble(1) <= 90)
    assert(r.getDouble(2) >= -180 && r.getDouble(3) <= 180)
  }
}
