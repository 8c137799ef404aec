package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.queries.Portable

/** Semantics checks for the late-round-4 operators (morton z-order,
  * KMV bottom-k, sessionization), cross-validated against driver-side
  * brute force at sf0.001. */
class Round4bOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Reference bit-interleave: spread the low 16 bits of x apart. */
  private def spreadRef(x: Long): Long =
    (0 until 16).map(i => ((x >> i) & 1L) << (2 * i)).reduce(_ | _)

  test("mortonSpread column matches the naive bit-by-bit reference") {
    val s = spark
    import s.implicits._
    val vals = (0L until 1000L) ++ Seq(0x7FFFL, 0x5555L, 0xAAAAL, 0xFFFFL)
    val df = vals.toDF("x")
    val got = df.select(col("x"), Portable.mortonSpread(col("x")).as("z"))
      .collect().map { case Row(x: Long, z: Long) => x -> z }.toMap
    vals.foreach { x =>
      assert(got(x) == spreadRef(x), s"spread($x): got ${got(x)} expected ${spreadRef(x)}")
    }
  }

  test("g18: z-ordered files cover non-overlapping zkey ranges") {
    // the judged query writes repartitionByRange(zorderPartitions(n))
    // .sortWithinPartitions parquet — THE claim is spatial locality: each
    // file owns a compact, disjoint zkey range (what row-group min/max
    // pruning needs at scale)
    SparkEntry.queries("g18_zorder_locality")(spark, dir)
      .write.mode("overwrite").format("noop").save()
    val tmp = Portable.scratchPath("zorder_sink")
    val clustered = spark.read.parquet(tmp)
    // the judged fan-out derives from volume (one range partition per
    // 2^21 rows — Round7OpsSpec pins the function); sf0.001 sits far
    // below one target file, so the sink must be exactly one file
    val nFiles = clustered.select(input_file_name()).distinct().count()
    assert(nFiles ==
      graft.queries.GeoQueries.zorderPartitions(clustered.count()),
      s"clustered-write fan-out ($nFiles files) must equal the derived " +
        "partition count")
    // the disjointness claim needs MULTIPLE files — force the same
    // layout at a 4-way fan-out over the same zkey frame
    val tmp4 = Portable.scratchPath("zorder_sink_4way")
    clustered.repartitionByRange(4, col("zkey"))
      .sortWithinPartitions(col("zkey"))
      .write.mode("overwrite").parquet(tmp4)
    val ranges = spark.read.parquet(tmp4)
      .groupBy(input_file_name().as("f"))
      .agg(min(col("zkey")).as("lo"), max(col("zkey")).as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(ranges.length > 1, "expected multiple range-partitioned files")
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: hi $hi1 > next lo $lo2")
      case _ =>
    }
  }

  test("q04: KMV threshold and estimate equal brute force") {
    val k = 5
    val rows = graft.engine.Tables.events(spark, dir)
      .select(col("event_type"),
        Portable.portableHash(col("event_id").cast("string")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val expected = rows.groupBy(_._1).map { case (t, hs) =>
      val sorted = hs.map(_._2).sorted
      val hk = sorted(k - 1)
      val est = math.round((k - 1) * 1152921504606846976.0 / hk.toDouble)
      t -> (hs.length.toLong, hk, est)
    }
    val got = SparkEntry.queries("q04_bottomk_sample")(spark, dir)
      .collect().map { case Row(t: String, n: Long, hk: Long, est: Long) =>
        t -> (n, hk, est)
      }.toMap
    assert(got == expected)
  }

  test("w07: sessions conserve events and split only on >30min gaps") {
    val byUser = graft.engine.Tables.events(spark, dir)
      .select(col("user_id"), col("ts")).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 1000))
      .groupBy(_._1)
    val expected = byUser.map { case (u, rs) =>
      val ts = rs.map(_._2).sorted
      val splits = ts.zip(ts.drop(1)).count { case (a, b) => b - a > 1800 }
      u -> (splits + 1L, ts.length.toLong)
    }
    val got = SparkEntry.queries("w07_sessionize")(spark, dir)
      .collect().map { r =>
        r.getAs[Long]("user_id") ->
          (r.getAs[Long]("n_sessions"), r.getAs[Long]("n_events"))
      }.toMap
    assert(got == expected)
  }
}
