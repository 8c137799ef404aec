package graft

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import graft.engine.Trajectory

/** Gap-fill branch tests mirroring the reference generator's cases
  * (diff ∈ {1, 2, 24, 25}, first record, last record), plus the
  * relational-vs-typed equivalence contract. */
class TrajectorySpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private val stateSchema = StructType(Seq(
    StructField("user_id", LongType),
    StructField("hour", TimestampType),
    StructField("region", StringType),
    StructField("pre_hour", TimestampType),
    StructField("pre_region", StringType),
    StructField("is_last", BooleanType),
    StructField("diff", LongType)))

  private def stateDf(rows: Seq[(Long, String, String, Option[String], Option[String], Boolean)]) = {
    val data = rows.map { case (u, h, r, ph, pr, last) =>
      val diff: java.lang.Long = ph.map { p =>
        java.lang.Long.valueOf((ts(h).getTime - ts(p).getTime) / 3600000L)
      }.orNull
      Row(u, ts(h), r, ph.map(ts).orNull, pr.orNull, last, diff)
    }
    spark.createDataFrame(spark.sparkContext.parallelize(data), stateSchema)
  }

  private def runBoth(rows: Seq[(Long, String, String, Option[String], Option[String], Boolean)]) = {
    val st = stateDf(rows)
    val rel = Trajectory.gapFillRelational(st)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getString(2))).toSet
    val typed = Trajectory.gapFillTyped(st, spark)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getString(2))).toSet
    assert(rel == typed, "relational and typed gap-fill must agree")
    rel
  }

  test("first record (no pre) is kept as-is") {
    val out = runBoth(Seq((1L, "2019-07-01 05:00:00", "A", None, None, false)))
    assert(out == Set((1L, "2019-07-01 05:00:00.0", "A")))
  }

  test("diff=1 keeps the record, no fill") {
    val out = runBoth(Seq(
      (1L, "2019-07-01 06:00:00", "B", Some("2019-07-01 05:00:00"), Some("A"), false)))
    assert(out == Set((1L, "2019-07-01 06:00:00.0", "B")))
  }

  test("1 < diff <= 24 forward-fills the previous region") {
    val out = runBoth(Seq(
      (1L, "2019-07-01 08:00:00", "B", Some("2019-07-01 05:00:00"), Some("A"), false)))
    assert(out == Set(
      (1L, "2019-07-01 06:00:00.0", "A"),
      (1L, "2019-07-01 07:00:00.0", "A"),
      (1L, "2019-07-01 08:00:00.0", "B")))
  }

  test("diff=24 still forward-fills (boundary)") {
    val out = runBoth(Seq(
      (1L, "2019-07-02 05:00:00", "B", Some("2019-07-01 05:00:00"), Some("A"), false)))
    assert(out.size == 24)
    assert(out.count(_._3 == "A") == 23)
    assert(out((1L, "2019-07-02 05:00:00.0", "B")))
    assert(out((1L, "2019-07-01 06:00:00.0", "A")))
  }

  test("diff>24 emits a single sentinel-0 departure instead of a fill") {
    val out = runBoth(Seq(
      (1L, "2019-07-02 06:00:00", "B", Some("2019-07-01 05:00:00"), Some("A"), false)))
    assert(out == Set(
      (1L, "2019-07-01 06:00:00.0", "0"),
      (1L, "2019-07-02 06:00:00.0", "B")))
  }

  test("last record appends a sentinel-0 exit one hour later") {
    val out = runBoth(Seq(
      (1L, "2019-07-01 05:00:00", "A", None, None, true)))
    assert(out == Set(
      (1L, "2019-07-01 05:00:00.0", "A"),
      (1L, "2019-07-01 06:00:00.0", "0")))
  }

  test("random multi-user states: relational == typed, coverage holds") {
    val rnd = new scala.util.Random(4242)
    val base = ts("2019-07-01 00:00:00").getTime
    val rows = (1 to 40).flatMap { u =>
      var t = base
      val hours = (0 until 1 + rnd.nextInt(6)).map { _ =>
        t += (1 + rnd.nextInt(30)) * 3600000L
        new Timestamp(t)
      }
      hours.zipWithIndex.map { case (h, i) =>
        val pre = if (i == 0) None else Some(hours(i - 1).toString.stripSuffix(".0"))
        (u.toLong, h.toString.stripSuffix(".0"), s"R$u-$i",
          pre, pre.map(_ => s"R$u-${i - 1}"), i == hours.size - 1)
      }
    }
    val out = runBoth(rows)
    // every user's observed (hour, region) appears in the completed trajectory
    rows.foreach { case (u, h, r, _, _, _) => assert(out((u, h + ".0", r))) }
  }

  test("transitions == lag window over the completed trajectory") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(99)
    val base = ts("2019-07-01 00:00:00").getTime
    val rows = (1 to 30).flatMap { u =>
      var t = base
      val hours = (0 until 1 + rnd.nextInt(6)).map { _ =>
        t += (1 + rnd.nextInt(30)) * 3600000L
        new Timestamp(t)
      }
      hours.zipWithIndex.map { case (h, i) =>
        val pre = if (i == 0) None else Some(hours(i - 1).toString.stripSuffix(".0"))
        (u.toLong, h.toString.stripSuffix(".0"), s"R$u-$i",
          pre, pre.map(_ => s"R$u-${i - 1}"), i == hours.size - 1)
      }
    }
    val st = stateDf(rows)
    val direct = Trajectory.transitions(st)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getString(2), r.getString(3))).toSet
    val w = Window.partitionBy(col("user_id")).orderBy(col("hour"))
    val viaLag = Trajectory.gapFillRelational(st)
      .withColumn("src", lag(col("region"), 1).over(w))
      .where(col("src").isNotNull)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getString(3), r.getString(2))).toSet
    assert(direct == viaLag)
  }

  test("fraction matrix rows sum to ~1 and are NaN-free (nan_to_num contract)") {
    import org.apache.spark.sql.functions._
    val frac = SparkEntry.queries("g10_mobility_frac")(spark, "/root/testdata/sf0.001")
    val bad = frac.where(isnan(col("frac")) || col("frac").isNull ||
      col("frac") < 0 || col("frac") > 1).count()
    assert(bad == 0)
    val rowSums = frac.groupBy(col("hour"), col("src"))
      .agg(sum(col("frac")).as("s"))
      .where(abs(col("s") - 1.0) > 1e-9).count()
    assert(rowSums == 0)
  }

  test("completed trajectory has exactly one row per (user, hour)") {
    import org.apache.spark.sql.functions._
    val traj = Trajectory.complete(
      graft.engine.Tables.events(spark, "/root/testdata/sf0.001"))
    val dups = traj.groupBy(col("user_id"), col("hour")).count()
      .where(col("count") > 1).count()
    assert(dups == 0)
  }

  test("hourlyState keeps the last fix per user-hour with lag/lead wiring") {
    import org.apache.spark.sql.functions._
    val eventsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("user_id", LongType),
      StructField("ts", TimestampType)))
    val ev = spark.createDataFrame(spark.sparkContext.parallelize(Seq(
      Row(1L, 7L, ts("2019-07-01 05:10:00")),
      Row(2L, 7L, ts("2019-07-01 05:50:00")), // same hour: later wins
      Row(3L, 7L, ts("2019-07-01 09:20:00")))), eventsSchema)
    val st = Trajectory.hourlyState(ev).orderBy(col("hour")).collect()
    assert(st.length == 2)
    assert(st(0).getAs[Timestamp]("hour") == ts("2019-07-01 05:00:00"))
    assert(st(0).getAs[Any]("pre_hour") == null)
    assert(!st(0).getAs[Boolean]("is_last"))
    assert(st(1).getAs[Timestamp]("hour") == ts("2019-07-01 09:00:00"))
    assert(st(1).getAs[Long]("diff") == 4L)
    assert(st(1).getAs[Boolean]("is_last"))
  }
}
