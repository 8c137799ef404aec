package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming re-expression of the reference's time-windowed
  * aggregations (SURVEY.md §2.9).
  *
  * The reference simulates streams in batch: a driver loop re-filters one
  * DataFrame per hour window (`cal_user_trace.py:30-38`, 744 sequential
  * jobs) and forward-fills user state across hours with an RDD flatMap
  * (`cal_mobility_matrix.py:105-127`). Here the same semantics are
  * declared once over an unbounded source:
  *
  *  - [[hourlyPresence]]: tumbling 1-hour event-time windows with a
  *    watermark — the streaming twin of the `date_trunc('hour') +
  *    countDistinct` core (approx_count_distinct: mergeable sketch state,
  *    the only form that scales to unbounded keys);
  *  - [[sessionize]]: event-time session windows (gap-close analogue of
  *    the reference's night-window presence runs);
  *  - [[trackRegions]]: `flatMapGroupsWithState` — per-user region
  *    transitions with the reference's sentinel-'0' exit semantics,
  *    emitted incrementally as state expires (the streaming counterpart
  *    of the batch gap-filler in [[graft.engine.Trajectory]]).
  *
  * All three run on any streaming DataFrame with (user_id, region/
  * event_type, ts) columns; specs drive them with MemoryStream.
  */
object StreamingPresence {

  /** Tumbling 1-hour presence counts with a 1-hour watermark. Late rows
    * beyond the watermark are dropped — matches the batch query exactly
    * for in-order replays. */
  def hourlyPresence(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(approx_count_distinct("user_id").as("n_users"))
      .select(col("w.start").as("hour"), col("event_type"), col("n_users"))

  /** Event-time session windows with a configurable inactivity gap. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("s"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))

  case class Fix(user_id: Long, ts: Timestamp, region: String)
  case class RegionState(region: String, since: Timestamp)
  case class Transition(user_id: Long, ts: Timestamp,
                        from_region: String, to_region: String)

  /** Per-user region tracking with sentinel exits: emits a transition row
    * whenever a user's fix lands in a new region, and a `-> "0"` exit one
    * timeout after the last fix when the user goes silent (the
    * reference's "outside all regions" sentinel,
    * `cal_mobility_matrix.py:110`). Event-time timeout: exits fire as the
    * watermark passes `last fix + timeout`, so replays are deterministic
    * and no wall-clock enters the semantics. */
  def trackRegions(fixes: Dataset[Fix], timeoutMs: Long = 3600 * 1000L)
                  (implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    fixes
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Fix], state: GroupState[RegionState]) =>
          if (state.hasTimedOut) {
            val prev = state.get
            state.remove()
            Iterator.single(Transition(userId,
              new Timestamp(prev.since.getTime + timeoutMs), prev.region, "0"))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            val out = Seq.newBuilder[Transition]
            var cur = state.getOption
            sorted.foreach { f =>
              cur match {
                case Some(RegionState(r, _)) if r != f.region =>
                  out += Transition(userId, f.ts, r, f.region)
                case None =>
                  out += Transition(userId, f.ts, "0", f.region)
                case _ => ()
              }
              cur = Some(RegionState(f.region, f.ts))
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.since.getTime + timeoutMs)
            }
            out.result().iterator
          }
      }
  }
}
