package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec

/** Semantics checks for the round-13 additions. */
class Round13OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  /** Collect BatchScanExec nodes across AQE query-stage boundaries
    * (plain `collect` stops at QueryStageExec wrappers). */
  private def ledgerScans(p: SparkPlan): Seq[BatchScanExec] = {
    val here = p match {
      case b: BatchScanExec if b.scan.description().contains("graft-ledger") => Seq(b)
      case _ => Nil
    }
    val nested = p match {
      case q: QueryStageExec => Seq(q.plan)
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case _ => Nil
    }
    here ++ (p.children ++ nested).flatMap(ledgerScans)
  }

  test("s20: runtime join filters prune ledger files in the PLANNED query") {
    val df = SparkEntry.queries("s20_ledger_runtime_skip")(spark, dir)
    // the dim's min-per-lang keys all exist in the fact — inner join keeps
    // one row per dim key
    assert(df.collect().length == 5)
    val scans = ledgerScans(df.queryExecution.executedPlan)
    assert(scans.nonEmpty, df.queryExecution.executedPlan.toString)
    val scan = scans.head
    // the planner injected the DPP subquery on the V2 scan (not just the
    // unit-driven contract of LedgerSourceSpec)
    assert(scan.runtimeFilters.nonEmpty, scan.toString)
    // and it BOUND: the fact was written as 8 disjoint doc_id range files,
    // the dim's keys are min-ids clustered in the low ranges — the executed
    // scan must have planned strictly fewer partitions than files exist
    assert(scan.inputRDD.getNumPartitions < 8,
      s"no file was pruned: ${scan.inputRDD.getNumPartitions} partitions planned")
  }

  test("g40: assigned regions flow through the whole pipeline (sentinel stays distinct)") {
    val out = SparkEntry.queries("g40_pipeline")(spark, dir)
      .select(col("src"), col("dst"), col("frac")).collect()
    assert(out.nonEmpty)
    val regions = out.flatMap(r => Seq(r.getString(0), r.getString(1))).toSet
    // regions are assigned agent ids (nation+1 → "1".."25") plus the
    // shared sentinel "0"; a raw geohash cell leaking through the cascade
    // would show up as a non-numeric region
    assert(regions.contains("0"), "sentinel region absent — gap-fill exits lost")
    assert(regions.forall(r => r.forall(_.isDigit)), s"non-assigned region in $regions")
    assert((regions - "0").nonEmpty, "no fix matched the dictionary at any precision")
    // fractions are presence-normalized: never negative, and a row with a
    // positive count against a zero/absent population pins to 0
    assert(out.forall(_.getDouble(2) >= 0.0))
  }
}
