package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode,
  StatefulProcessor, StatefulProcessorWithInitialState, TTLConfig, TimeMode,
  TimerValues}

/** The shared per-batch fold of [[RecentEventsProcessor]] and its
  * initial-state twin [[BootstrapRecentEventsProcessor]] (st19 / st21):
  * count each row's type into the MapState, append its event time to the
  * ListState, then prune the list ONCE to the `k` largest — one list
  * rewrite per (key, batch), not per row — and emit the monotone
  * (key, #types, #events, topk sum, topk size) summary. */
private[streaming] object RecentEventsFold {
  def apply(k: Int, topk: ListState[Long], counts: MapState[String, Long],
      key: Long, rows: Iterator[(Long, String, Long)])
      : Iterator[(Long, Long, Long, Long, Long)] = {
    rows.foreach { case (_, tpe, es) =>
      val cur = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
      counts.updateValue(tpe, cur + 1L)
      topk.appendValue(es)
    }
    val kept = topk.get().toArray.sorted(Ordering[Long].reverse).take(k)
    topk.put(kept)
    var nTypes = 0L
    var total = 0L
    counts.iterator().foreach { case (_, c) => nTypes += 1; total += c }
    Iterator.single((key, nTypes, total, kept.sum, kept.length.toLong))
  }
}

/** st19's processor — the remaining state-variable kinds of Spark 4's
  * `transformWithState` API (st07 covers ValueState, st13/st14 add
  * event-time timers): a per-user BOUNDED recent-event list
  * ([[ListState]], pruned to the `k` largest event times after every
  * batch — the "recent items per key" state shape of feeds and
  * sessionizers) and a per-user per-event-type counter ([[MapState]] —
  * keyed sub-state without folding the key into the grouping key, so
  * one user's types share a shard and a state scan).
  *
  * Emitted per batch: (user, #types, #events, sum of the kept list,
  * kept-list size). Every field is MONOTONE under more input (the sum
  * of the k largest can only grow as elements displace smaller ones),
  * so folding the update stream with max reproduces the final state
  * regardless of microbatch slicing — the same property that lets a
  * batch oracle judge st07. The closed-form oracle ranks each user's
  * events by time and sums the top k (row_number ≤ k — ties at the
  * boundary carry equal values, so the multiset sum is slicing- and
  * tie-break-independent).
  *
  * States use TTLConfig.NONE: TTL expiry is PROCESSING-time based and
  * therefore not hash-judgeable; real TTL eviction is pinned by name in
  * `TransformWithStateSpec` ("TTL evicts value state...") via
  * [[TtlProbeProcessor]]. */
class RecentEventsProcessor(k: Int)
    extends StatefulProcessor[Long, (Long, String, Long), (Long, Long, Long, Long, Long)] {

  @transient private var topk: ListState[Long] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    topk = getHandle.getListState[Long]("topk", Encoders.scalaLong, TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("type_counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] =
    RecentEventsFold(k, topk, counts, key, rows)
}

/** st21's processor — [[RecentEventsProcessor]] with a BOOTSTRAPPED
  * state: `handleInitialState` seeds each user's ListState/MapState from
  * a batch-aggregated frame BEFORE the first microbatch (the
  * backfill-then-stream migration every production stateful pipeline
  * starts with: state comes from an offline aggregate, not a replay of
  * history). Initial state per user: (top-k event times of the batch
  * prefix, per-type counts of the batch prefix) — exactly the state the
  * streaming fold would have built from the same rows, so the judged
  * closed form is st19's oracle over prefix ∪ stream. Emits nothing at
  * bootstrap (Update mode emits on input), so the judged output is
  * restricted to stream-active users — mirrored in the oracle. */
class BootstrapRecentEventsProcessor(k: Int)
    extends StatefulProcessorWithInitialState[Long, (Long, String, Long),
      (Long, Long, Long, Long, Long), (Seq[Long], Seq[(String, Long)])] {

  @transient private var topk: ListState[Long] = _
  @transient private var counts: MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    topk = getHandle.getListState[Long]("topk", Encoders.scalaLong, TTLConfig.NONE)
    counts = getHandle.getMapState[String, Long]("type_counts",
      Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInitialState(key: Long,
      initialState: (Seq[Long], Seq[(String, Long)]),
      timerValues: TimerValues): Unit = {
    topk.put(initialState._1.toArray)
    initialState._2.foreach { case (tpe, n) => counts.updateValue(tpe, n) }
  }

  override def handleInputRows(key: Long, rows: Iterator[(Long, String, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] =
    RecentEventsFold(k, topk, counts, key, rows)
}

/** Spec-only probe for per-state TTL: a ValueState whose TTL is wall-
  * clock (`TTLConfig` + TimeMode.ProcessingTime); emits the PREVIOUS
  * state value (or -1 when absent/expired) before updating, so a test
  * can observe "state survived" vs "TTL evicted" across a real sleep.
  * Not judged — processing-time expiry is inherently wall-clock
  * dependent. */
class TtlProbeProcessor(ttlMs: Long)
    extends StatefulProcessor[Long, (Long, Long), (Long, Long)] {

  @transient private var st: org.apache.spark.sql.streaming.ValueState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState[Long]("v", Encoders.scalaLong,
      if (ttlMs <= 0) TTLConfig.NONE
      else TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val prev = if (st.exists()) st.get() else -1L
    var mx = Long.MinValue
    rows.foreach { case (_, v) => if (v > mx) mx = v }
    st.update(mx)
    Iterator.single((key, prev))
  }
}
