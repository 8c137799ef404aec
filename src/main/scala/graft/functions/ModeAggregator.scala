package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregator: deterministic mode (most frequent value,
  * ties broken by the smaller value) — the engine's one UDAF, completing
  * the extension-point surface next to UDFs, native expressions, typed
  * flatMap/mapPartitions and SparkSessionExtensions.
  *
  * Reference behavior: the home-region mode is computed driver-side over
  * collected night columns (`cal_user_trace.py:63-84`). The relational
  * form (count + window top-1) is judged as `a06_mode`/`g06_home_region`;
  * this Aggregator expresses the same semantics as mergeable partial
  * state (a per-group count map), the shape a custom aggregate needs to
  * scale: partials combine map-side, no row explosion, no window sort. */
class ModeAggregator extends Aggregator[String, Map[String, Long], String] {
  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], v: String): Map[String, Long] =
    if (v == null) b else b.updated(v, b.getOrElse(v, 0L) + 1L)

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    if (a.size < b.size) merge(b, a)
    else b.foldLeft(a) { case (m, (k, n)) => m.updated(k, m.getOrElse(k, 0L) + n) }

  override def finish(m: Map[String, Long]): String =
    if (m.isEmpty) null
    else m.minBy { case (v, n) => (-n, v) }._1 // count desc, value asc

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
