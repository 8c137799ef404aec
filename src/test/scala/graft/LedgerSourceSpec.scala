package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

import graft.sources.LedgerSource

/** Connector-contract pins for the graft-ledger DataSource V2
  * ([[graft.sources.LedgerSource]]): roundtrip fidelity incl. nulls,
  * overwrite-as-truncate, stats-header FILE SKIPPING under pushed
  * doc_id predicates (the partition count IS the observable), pruned
  * decode, and plan-visible pushdown. The judged end-to-end path is
  * `s16_ledger_roundtrip`. */
class LedgerSourceSpec extends SparkSpec {

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"ledger_$tag").toString

  private def sample: DataFrame = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "en", 10L), (2L, "fr", 20L), (3L, null.asInstanceOf[String], 30L),
      (4L, "de", 40L), (5L, "en", 50L), (6L, "zh", 60L))
      .toDF("doc_id", "lang", "n_chars")
      .withColumn("n_chars", when($"doc_id" === 4L, lit(null)).otherwise($"n_chars"))
  }

  test("roundtrip preserves rows, including null lang and null n_chars") {
    val dir = tmpDir("rt")
    sample.write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    val back = spark.read.format("graft-ledger").load(dir)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getString(1),
        if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))).toSet
    val expect = sample.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getString(1),
      if (r.isNullAt(2)) null else java.lang.Long.valueOf(r.getLong(2)))).toSet
    assert(back == expect)
  }

  test("overwrite truncates: a second write replaces the first") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("ow")
    sample.write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    sample.where($"doc_id" <= 2L)
      .write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    assert(spark.read.format("graft-ledger").load(dir).count() == 2L)
  }

  test("pushed doc_id bounds skip whole files via the stats header") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("skip")
    // 4 range-partitioned files with disjoint doc_id intervals
    val docs = spark.range(0, 400).select($"id".as("doc_id"),
      concat(lit("l"), ($"id" % 7).cast("string")).as("lang"),
      ($"id" * 3).as("n_chars"))
    docs.repartitionByRange(4, $"doc_id")
      .write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    assert(LedgerSource.ledgerFiles(dir).length == 4)
    val all = spark.read.format("graft-ledger").load(dir)
    assert(all.rdd.getNumPartitions == 4)
    // a tight interval lands in ONE file's [min,max]
    val one = all.where($"doc_id" >= 120L && $"doc_id" < 140L)
    assert(one.rdd.getNumPartitions == 1,
      s"expected 1 surviving partition, got ${one.rdd.getNumPartitions}")
    assert(one.count() == 20L)
    // an impossible interval skips everything
    val none = all.where($"doc_id" > 1000L)
    assert(none.rdd.getNumPartitions == 0 && none.count() == 0L)
  }

  test("the scan plan advertises pushdown and the pruned read schema") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("plan")
    sample.write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    val q = spark.read.format("graft-ledger").load(dir)
      .where($"doc_id" >= 3L).select($"doc_id", $"n_chars")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(doc_id,3)"), plan)
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint>"), plan)
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == Seq(3L, 4L, 5L, 6L))
  }

  test("a filter Spark keeps (non-key column) still evaluates correctly") {
    val s = spark
    import s.implicits._
    val dir = tmpDir("resid")
    sample.write.format("graft-ledger").mode(SaveMode.Overwrite).save(dir)
    val got = spark.read.format("graft-ledger").load(dir)
      .where($"lang" === "en" && $"doc_id" > 1L)
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(5L))
  }
}
