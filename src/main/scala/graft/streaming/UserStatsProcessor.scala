package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig,
  TimeMode, TimerValues, ValueState}

/** Monotone per-user accumulator on Spark 4's `transformWithState` API —
  * the successor of `mapGroupsWithState` (typed ValueState/ListState/
  * MapState handles, per-state TTL, timers) and the engine's third
  * arbitrary-state surface (judged `st07`; `st06` covers the classic
  * API, `StreamingPresence` the flatMap form).
  *
  * State per key is one (count, min ts, max ts) tuple; every field is
  * monotone, so folding the emitted updates with max/min reproduces the
  * final state regardless of how the input was sliced into microbatches
  * — which is what lets a batch oracle judge the streaming run. State is
  * O(1) per key, sharded by the grouping hash; no timers, no TTL. */
class UserStatsProcessor
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[(Long, Long, Long)]("agg",
      Encoders.product[(Long, Long, Long)], TTLConfig.NONE)

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, mn, mx) =
      if (st.exists()) st.get() else (0L, Long.MaxValue, Long.MinValue)
    rows.foreach { case (_, es) =>
      n += 1
      if (es < mn) mn = es
      if (es > mx) mx = es
    }
    st.update((n, mn, mx))
    Iterator.single((key, n, mn, mx))
  }
}
