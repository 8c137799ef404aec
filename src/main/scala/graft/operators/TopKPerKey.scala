package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension (SURVEY §2 preference tier (c)):
  * per-key top-k as a first-class plan node instead of a window.
  *
  * Why an operator and not `row_number().over(...)`: the window form
  * sorts every partition end-to-end (O(n log n) per partition, and the
  * whole row set flows through the sort buffers) before discarding all
  * but k rows per key. This node keeps a bounded heap per key —
  * O(n log k) with no sort buffer — and does it TWICE: a partial pass
  * before the exchange caps each map task's output at k rows per local
  * key (the same contract as `WindowGroupLimit`, but heap-based and
  * rank-emitting), so the shuffle carries at most k·keys-per-map rows;
  * the final pass merges and emits ranks 1..k. Memory per task is
  * bounded by k · distinct-keys-in-partition rows — the operator's
  * documented contract, same as any hash aggregate.
  *
  * Judged as `o04_native_topk` against the SAME oracle as o01 (window
  * form) and o03 (mergeable UDAF form): three physical engines, one
  * answer. */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: AttributeReference,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, rn, child) =>
      TopKPerKeyFinalExec(keys, order, k, rn,
        TopKPerKeyPartialExec(keys, order, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Public API: top `k` rows per `keyCols` group under `orderCols`
    * ((name, ascending) pairs — supply a full tie-broken order for
    * deterministic output), with a `rn` LONG rank column appended.
    * Built from the analyzed child plan, so all expressions are
    * resolved here and no analyzer extension is needed. */
  def apply(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(
        s"no column $n in ${lp.output.map(_.name).mkString(", ")}"))
    val order = orderCols.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    org.apache.spark.sql.graftbridge.SqlBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyCols.map(attr), order, k,
        AttributeReference("rn", LongType, nullable = false)(), lp))
  }

  /** One bounded-heap pass over a partition: per distinct key, the k
    * best rows under `order`, returned best-first. Shared by both the
    * partial and final exec. */
  private[operators] def boundedTopK(
      iter: Iterator[InternalRow],
      keyExprs: Seq[Expression],
      order: Seq[SortOrder],
      input: Seq[Attribute],
      k: Int): Iterator[(UnsafeRow, Array[InternalRow])] = {
    val keyProj = UnsafeProjection.create(keyExprs, input)
    val ord = RowOrdering.create(order, input)
    // worst-kept row at the heap head so one compare decides admission
    val state = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var q = state.get(key)
      if (q == null) {
        q = new java.util.PriorityQueue[InternalRow](k + 1, ord.reverse)
        state.put(key.copy(), q)
      }
      if (q.size() < k) q.add(row.copy())
      else if (ord.compare(row, q.peek()) < 0) { q.poll(); q.add(row.copy()) }
    }
    import scala.jdk.CollectionConverters._
    state.entrySet().iterator().asScala.map { e =>
      val arr = e.getValue.toArray(new Array[InternalRow](e.getValue.size()))
      java.util.Arrays.sort(arr, ord)
      (e.getKey, arr)
    }
  }
}

/** Map-side pass: caps every map task's output at k rows per local key
  * BEFORE the shuffle (no distribution requirement), so the exchange
  * moves k·local-keys rows instead of the raw input. */
case class TopKPerKeyPartialExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, out, kk) = (keys, order, child.output, k)
    child.execute().mapPartitions(
      iter => TopKPerKey.boundedTopK(iter, ks, os, out, kk)
        .flatMap(_._2.iterator),
      preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyPartialExec =
    copy(child = newChild)
}

/** Reduce-side pass: requires the key clustering (EnsureRequirements
  * inserts the hash exchange — or elides it when the child is already
  * co-partitioned, e.g. off a bucketed scan), merges the partial
  * survivors, and emits each key's k best with ranks 1..k. */
case class TopKPerKeyFinalExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rnAttr: AttributeReference,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr)
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (ks, os, cout, kk, outAttrs) = (keys, order, child.output, k, output)
    child.execute().mapPartitions({ iter =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val rankRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      TopKPerKey.boundedTopK(iter, ks, os, cout, kk).flatMap { case (_, arr) =>
        arr.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, (i + 1).toLong)
          proj(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyFinalExec =
    copy(child = newChild)
}
