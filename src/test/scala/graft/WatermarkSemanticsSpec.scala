package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the MICROBATCH WATERMARK LAG the st10/st11 oracles encode
  * (probed on Spark 4.1, SPARK-40925 era): at batch N the state-store
  * EVICTION/emission watermark is max-event-time-through-batch-(N−1)
  * minus the delay, while the LATE-INPUT FILTER still uses the previous
  * batch's value — one batch behind eviction. A Spark upgrade that
  * unifies the two (or shifts either) would silently flip st10's judged
  * hash; this test fails by name instead.
  *
  * No-data microbatches are disabled for the probe: they run an extra
  * eviction between `addData` calls, which would advance both values
  * and hide the lag being asserted. */
class WatermarkSemanticsSpec extends SparkSpec {

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("late-input filter lags the eviction watermark by exactly one batch") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = s.sqlContext
    val key = "spark.sql.streaming.noDataMicroBatches.enabled"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    val in = MemoryStream[(Long, Timestamp)]
    val counts = in.toDF().toDF("user_id", "ts")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "60 minutes").as("w"))
      .count()
      .select(col("w.start").as("ws"), col("count"))
    val q = counts.writeStream.format("memory").queryName("wm_probe")
      .outputMode("append").start()
    try {
      // b0: seeds the [10:00, 11:00) window; max event time 10:00
      in.addData((1L, ts("2019-07-01 10:00:00"))); q.processAllAvailable()
      // b1: advances max event time to 12:00. Eviction wm THIS batch is
      // still 09:50 (b0's max − delay), so nothing emits yet.
      in.addData((1L, ts("2019-07-01 12:00:00"))); q.processAllAvailable()
      // b2: eviction wm is now 11:50 — [10:00, 11:00) closes this batch.
      // The 10:05 row is BELOW that (late for eviction) but the filter
      // still uses b1's 09:50, so the row is ACCEPTED and counted into
      // the window as it closes. A filter running at 11:50 would drop it.
      in.addData((1L, ts("2019-07-01 10:05:00"))); q.processAllAvailable()
      // b3: the filter has caught up to 11:50 — the same-shaped row is
      // now dropped on input, and the counter proves it.
      in.addData((1L, ts("2019-07-01 10:06:00"))); q.processAllAvailable()

      val rows = s.sql("SELECT ws, count FROM wm_probe")
        .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSeq
      assert(rows.contains((ts("2019-07-01 10:00:00"), 2L)),
        s"b2's late row must be filtered IN (one-batch lag) and emitted " +
          s"with the closing window: $rows")
      assert(!rows.exists(r => r._1 == ts("2019-07-01 10:00:00") && r._2 != 2L), rows)

      val drops = q.recentProgress.toSeq.flatMap(p =>
        Option(p.stateOperators).toSeq.flatMap(_.toSeq.map(_.numRowsDroppedByWatermark)))
      assert(drops.sum == 1,
        s"exactly b3's row must be dropped by the (caught-up) filter; " +
          s"per-batch drops: $drops")
    } finally {
      q.stop()
      prev match {
        case Some(v) => s.conf.set(key, v)
        case None => s.conf.unset(key)
      }
    }
  }
}
