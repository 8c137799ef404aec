package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (value, key) candidate for the top-k buffer. */
case class TopKIn(price: Double, key: Long)

/** Typed per-group TOP-K as a mergeable aggregate — the scale-correct
  * alternative to the `row_number` window for top-k-per-group: a window
  * must shuffle and SORT every raw row, while this aggregator keeps a
  * bounded k-element buffer per group that combines map-side, so the
  * exchange carries k·n_groups rows instead of n_rows. Ordering is
  * (price DESC, key ASC) — the window form's exact tie-break — and the
  * buffer stays a sorted vector (k is small; insertion beats a heap's
  * constant factor and keeps merges a linear zip).
  *
  * Judged as `o03_topk_aggregator` against the same oracle as the
  * window form (`o01`); the plan swap (ObjectHashAggregate with a
  * partial, no Window/Sort before the exchange) is pinned by
  * PlanQualitySpec. */
class TopKAggregator(k: Int) extends Aggregator[TopKIn, Seq[TopKIn], Seq[TopKIn]] {

  private def better(a: TopKIn, b: TopKIn): Boolean =
    a.price > b.price || (a.price == b.price && a.key < b.key)

  override def zero: Seq[TopKIn] = Vector.empty

  override def reduce(b: Seq[TopKIn], v: TopKIn): Seq[TopKIn] = {
    if (b.length == k && !better(v, b.last)) b
    else {
      val i = b.indexWhere(better(v, _))
      val pos = if (i < 0) b.length else i
      (b.take(pos) :+ v) ++ b.drop(pos).take(k - pos - 1)
    }
  }

  override def merge(a: Seq[TopKIn], b: Seq[TopKIn]): Seq[TopKIn] = {
    val out = Vector.newBuilder[TopKIn]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < a.length || j < b.length)) {
      if (j >= b.length || (i < a.length && better(a(i), b(j)))) {
        out += a(i); i += 1
      } else { out += b(j); j += 1 }
      n += 1
    }
    out.result()
  }

  override def finish(b: Seq[TopKIn]): Seq[TopKIn] = b

  override def bufferEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKIn]] = ExpressionEncoder()
}
