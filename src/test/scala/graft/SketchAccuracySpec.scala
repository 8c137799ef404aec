package graft

import org.apache.spark.sql.functions._
import graft.queries.Relational

/** Correctness signal for the one judged query with no DuckDB oracle:
  * a01's HLL++ sketch (rsd = 0.02). The standard error bound says the
  * estimate is within 3·rsd of the exact distinct count with ~99.7%
  * probability per group; on the FIXED sf0.01 testdata the realized
  * errors are deterministic, so asserting every group inside the bound
  * is a stable regression pin (a sketch-precision or hashing regression
  * would blow it immediately), not a flaky statistical test. */
class SketchAccuracySpec extends SparkSpec {

  test("a01 approx_count_distinct within 3*rsd of exact per group") {
    val dir = "/root/testdata/sf0.01"
    val approx = Relational.queries("a01_approx_presence")(spark, dir)

    val exact = graft.engine.Tables.events(spark, dir)
      .withColumn("hour", date_trunc("hour", col("ts")))
      .groupBy(col("hour"), col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
      .select(graft.queries.Portable.tsSec(col("hour")).as("hour"),
        col("event_type"), col("n_exact"))

    val joined = approx.join(exact, Seq("hour", "event_type"), "full")
      .select(col("hour"), col("event_type"),
        col("n_users_approx"), col("n_exact"))
      .collect()

    assert(joined.nonEmpty)
    // 3·rsd is the asymptotic bound; tiny groups sit in HLL's
    // linear-counting regime where a single hash collision is a ±1
    // count (= a huge *relative* error on an 8-user group), so the pin
    // is max(2 absolute, 3·rsd relative) per group
    val rsd = 0.02
    joined.foreach { r =>
      assert(!r.isNullAt(2) && !r.isNullAt(3),
        s"group mismatch between approx and exact: $r")
      val (a, e) = (r.getLong(2).toDouble, r.getLong(3).toDouble)
      val bound = math.max(2.0, 3 * rsd * e)
      assert(math.abs(a - e) <= bound,
        s"group (${r.getString(0)}, ${r.getString(1)}): approx $a vs exact $e exceeds ±$bound")
    }
  }

  test("a13 HLL union estimate within 3*rsd of exact per event_type") {
    val dir = "/root/testdata/sf0.01"
    val approx = Relational.queries("a13_hll_union")(spark, dir)
    val exact = graft.engine.Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_exact"))
    val joined = approx.join(exact, Seq("event_type"), "full").collect()
    assert(joined.nonEmpty)
    // DataSketches HLL at lgConfigK=12: rsd ≈ 1.04 / sqrt(2^12) ≈ 1.6%;
    // same max(2 absolute, 3·rsd relative) floor as the a01 pin
    val rsd = 1.04 / math.sqrt(1 << 12)
    joined.foreach { r =>
      val a = r.getAs[Long]("n_users_approx").toDouble
      val e = r.getAs[Long]("n_exact").toDouble
      val bound = math.max(2.0, 3 * rsd * e)
      assert(math.abs(a - e) <= bound,
        s"type ${r.getString(0)}: union estimate $a vs exact $e exceeds ±$bound")
    }
  }

  test("a14 approx_percentile brackets between exact rank-error bounds") {
    val dir = "/root/testdata/sf0.01"
    val approx = Relational.queries("a14_approx_quantile")(spark, dir)
    // GK at accuracy 10000 guarantees rank error ≤ n/10000 (= 0.01%);
    // bracket each approx value between exact percentiles ±1% rank —
    // 100× slacker than the guarantee, immune to interpolation details
    val exact = graft.engine.Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.49)").as("p50_lo"),
        expr("percentile(l_extendedprice, 0.51)").as("p50_hi"),
        expr("percentile(l_extendedprice, 0.94)").as("p95_lo"),
        expr("percentile(l_extendedprice, 0.96)").as("p95_hi"))
    val joined = approx.join(exact, Seq("l_returnflag"), "full").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val (a50, a95) = (r.getAs[Double]("p50_approx"), r.getAs[Double]("p95_approx"))
      assert(a50 >= r.getAs[Double]("p50_lo") && a50 <= r.getAs[Double]("p50_hi"),
        s"flag ${r.getString(0)}: p50 $a50 outside exact ±1%-rank bracket")
      assert(a95 >= r.getAs[Double]("p95_lo") && a95 <= r.getAs[Double]("p95_hi"),
        s"flag ${r.getString(0)}: p95 $a95 outside exact ±1%-rank bracket")
    }
  }
}
