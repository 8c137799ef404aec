package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Event-time session timeout on `transformWithState` timers — the state
  * machine behind judged `st14` and the closure of the engine's last
  * spec-only streaming behavior (state expiry; `StreamingPresence`
  * carries the classic `GroupStateTimeout` form, this is the Spark-4
  * timer-API form).
  *
  * State per user is (last event ts in micros, events this session). Every
  * input batch reschedules the user's ONE event-time timer to
  * `last_ts + timeout`: the previous timer is deleted first, so at most
  * one timer per key exists and a timer can only fire while its user is
  * silent. When the watermark crosses the timer (Spark fires expired
  * timers AFTER the batch's input rows — an arrival in the same batch
  * reschedules first and the old timer never fires), the session is
  * emitted as (user_id, last_ts, n_events) and the state cleared — the
  * next arrival starts a fresh session. Timers live in the state store
  * alongside the value state (O(1) per key, sharded by the grouping
  * hash), so at 100 TB this is exactly the keys × ~48 bytes posture of
  * the other stateful closures, and expiry is what keeps the store from
  * growing with stream length. Deterministic under the mtime-staged
  * AvailableNow recipe: timers fire on event-time watermark advance
  * only — no wall clock enters the semantics. */
class SessionTimeoutProcessor(timeoutMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long)]("session",
      Encoders.product[(Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long)] = {
    val prev = if (st.exists()) Some(st.get()) else None
    var (last, n) = prev.getOrElse((Long.MinValue, 0L))
    rows.foreach { case (_, ts) =>
      if (ts > last) last = ts
      n += 1
    }
    // one timer per key: reschedule = delete the old expiry, register the
    // new one (timers are keyed by expiry ms, not replaced implicitly)
    prev.foreach { case (pl, _) => getHandle.deleteTimer(pl / 1000 + timeoutMs) }
    getHandle.registerTimer(last / 1000 + timeoutMs)
    st.update((last, n))
    Iterator.empty
  }

  override def handleExpiredTimer(key: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long)] = {
    // a fired timer always has live state: reschedules delete the old
    // timer and emission clears state and timer together — but guard
    // anyway so a semantics drift surfaces as a wrong row, not an NPE
    if (!st.exists()) Iterator.empty
    else {
      val (last, n) = st.get()
      st.clear()
      Iterator.single((key, last, n))
    }
  }
}
