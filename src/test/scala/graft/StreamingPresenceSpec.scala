package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamingPresence
import graft.streaming.StreamingPresence.Fix

/** Drives the streaming operators with MemoryStream micro-batches. */
class StreamingPresenceSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("hourlyPresence aggregates tumbling event-time windows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val df = in.toDF().toDF("user_id", "event_type", "ts")
    val q = StreamingPresence.hourlyPresence(df)
      .writeStream.format("memory").queryName("presence")
      .outputMode("update").start()
    try {
      in.addData(
        (1L, "click", ts("2019-07-01 05:10:00")),
        (2L, "click", ts("2019-07-01 05:20:00")),
        (1L, "click", ts("2019-07-01 05:40:00")), // same user, same hour
        (1L, "view", ts("2019-07-01 06:05:00")))
      q.processAllAvailable()
      val rows = s.sql(
        """SELECT date_format(hour, 'HH') AS h, event_type, n_users
          |FROM presence ORDER BY h, event_type""".stripMargin)
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      assert(rows.contains(("05", "click", 2L)))
      assert(rows.contains(("06", "view", 1L)))
    } finally q.stop()
  }

  test("sessionize merges fixes within the gap and splits across it") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("user_id", "ts")
    val q = StreamingPresence.sessionize(df, "30 minutes")
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start() // session windows emit on watermark close
    try {
      in.addData(
        (7L, ts("2019-07-01 05:00:00")),
        (7L, ts("2019-07-01 05:20:00")), // same session (gap 20m)
        (7L, ts("2019-07-01 07:00:00"))) // new session (gap 100m)
      q.processAllAvailable()
      // advance the watermark past both session ends so append emits them
      in.addData((99L, ts("2019-07-02 10:00:00")))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, session_start, n_events FROM sessions")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2)))
      assert(rows.count(_._1 == 7L) == 2)
      assert(rows.contains((7L, ts("2019-07-01 05:00:00"), 2L)))
      assert(rows.contains((7L, ts("2019-07-01 07:00:00"), 1L)))
    } finally q.stop()
  }

  test("trackRegions emits transitions with sentinel entry") {
    val s = spark
    import s.implicits._
    implicit val sess = s
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[Fix]
    val q = StreamingPresence.trackRegions(in.toDS())
      .writeStream.format("memory").queryName("transitions")
      .outputMode("append").start()
    try {
      in.addData(
        Fix(1L, ts("2019-07-01 05:00:00"), "wtw3s"),
        Fix(1L, ts("2019-07-01 05:30:00"), "wtw3s"), // no move: no row
        Fix(1L, ts("2019-07-01 06:00:00"), "wtw3t"))
      q.processAllAvailable()
      val rows = s.sql(
        "SELECT user_id, from_region, to_region FROM transitions")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(rows.toSet == Set((1L, "0", "wtw3s"), (1L, "wtw3s", "wtw3t")))
      // advance the watermark past user 1's last fix + timeout: the
      // sentinel-'0' exit fires on event time, not wall clock
      in.addData(Fix(99L, ts("2019-07-01 09:00:00"), "x"))
      q.processAllAvailable()
      in.addData(Fix(99L, ts("2019-07-01 12:00:00"), "x"))
      q.processAllAvailable()
      val exits = s.sql(
        """SELECT user_id, ts, from_region FROM transitions
          |WHERE to_region = '0' AND user_id = 1""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getString(2)))
      assert(exits.toSeq == Seq((1L, ts("2019-07-01 07:00:00"), "wtw3t")))
    } finally q.stop()
  }

  test("watermarked dedup suppresses duplicates and drops late arrivals") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val in = MemoryStream[(Long, Timestamp)]
    val df = in.toDF().toDF("user_id", "hour")
      .withWatermark("hour", "2 hours")
      .dropDuplicates("user_id", "hour") // the st03 transform
    val q = df.writeStream.format("memory").queryName("dedup_mem")
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("2019-07-01 05:00:00")),
        (1L, ts("2019-07-01 05:00:00")), // in-batch duplicate: suppressed
        (2L, ts("2019-07-01 05:00:00")))
      q.processAllAvailable()
      in.addData((9L, ts("2019-07-01 23:00:00"))) // watermark → 21:00
      q.processAllAvailable()
      in.addData(
        (1L, ts("2019-07-01 05:00:00")), // late beyond watermark: DROPPED,
                                         // its state already evicted
        (1L, ts("2019-07-01 23:00:00"))) // fresh key: emitted
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, hour FROM dedup_mem")
        .collect().map(r => (r.getLong(0), r.getTimestamp(1)))
      assert(rows.count(_ == (1L, ts("2019-07-01 05:00:00"))) == 1)
      assert(rows.toSet == Set(
        (1L, ts("2019-07-01 05:00:00")),
        (2L, ts("2019-07-01 05:00:00")),
        (9L, ts("2019-07-01 23:00:00")),
        (1L, ts("2019-07-01 23:00:00"))))
    } finally q.stop()
  }

  test("stream-static join enriches each microbatch against the dimension") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val dim = Seq((1L, "GOLD"), (2L, "SILVER")).toDF("custkey", "segment")
    val in = MemoryStream[(Long, Timestamp)]
    val joined = in.toDF().toDF("user_id", "ts") // the st05 transform
      .join(broadcast(dim), col("user_id") === col("custkey"))
      .select(col("user_id"), col("ts"), col("segment"))
    val q = joined.writeStream.format("memory").queryName("ssj_dim")
      .outputMode("append").start()
    try {
      in.addData((1L, ts("2019-07-01 05:00:00")),
        (3L, ts("2019-07-01 05:10:00"))) // no dim row: inner join drops it
      q.processAllAvailable()
      // a later microbatch joins the SAME static snapshot — enrichment
      // is per-batch, no state store involved
      in.addData((2L, ts("2019-07-01 06:00:00")))
      q.processAllAvailable()
      val rows = s.sql("SELECT user_id, segment FROM ssj_dim")
        .collect().map(r => (r.getLong(0), r.getString(1)))
      assert(rows.toSet == Set((1L, "GOLD"), (2L, "SILVER")), rows.mkString(";"))
    } finally q.stop()
  }

  test("stream-stream interval join pairs in-window and evicts old state") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val p = MemoryStream[(Long, Timestamp)]
    val c = MemoryStream[(Long, Timestamp)]
    val purchases = p.toDF().toDF("p_user", "p_ts").withWatermark("p_ts", "1 hour")
    val clicks = c.toDF().toDF("c_user", "c_ts").withWatermark("c_ts", "1 hour")
    val joined = purchases.join(clicks, // the st04 transform
      col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
    val q = joined.writeStream.format("memory").queryName("ssj_mem")
      .outputMode("append").start()
    try {
      // click 30 min before the purchase → inside the interval → pair
      c.addData((1L, ts("2019-07-01 05:30:00")))
      p.addData((1L, ts("2019-07-01 06:00:00")))
      q.processAllAvailable()
      // purchase 90 min after that click → outside the interval → no pair
      p.addData((1L, ts("2019-07-01 07:00:00")))
      q.processAllAvailable()
      // next day advances the global watermark a day past the old click,
      // evicting its join state (and pairing with itself in-window)
      c.addData((99L, ts("2019-07-02 12:00:00")))
      p.addData((99L, ts("2019-07-02 12:30:00")))
      q.processAllAvailable()
      // a late purchase that WOULD have matched the evicted click: the
      // watermark drops it, nothing is emitted
      p.addData((1L, ts("2019-07-01 06:10:00")))
      q.processAllAvailable()
      val rows = s.sql("SELECT p_user, p_ts, c_user, c_ts FROM ssj_mem")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getTimestamp(3)))
      assert(rows.toSet == Set(
        (1L, ts("2019-07-01 06:00:00"), 1L, ts("2019-07-01 05:30:00")),
        (99L, ts("2019-07-02 12:30:00"), 99L, ts("2019-07-02 12:00:00"))), rows.mkString(";"))
    } finally q.stop()
  }
}
