package graft

import org.apache.spark.sql.functions._

/** Semantics checks for the round-5 pipeline-widening operators
  * (q07 mixture sampler, t18 span dedup, v15 semantic dedup). */
class Round5bOpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q07: the sampled mixture is balanced across languages") {
    val docs = graft.engine.Tables(spark, dir, "documents")
    val minLang = docs.groupBy(col("lang")).count()
      .agg(min(col("count"))).collect()(0).getLong(0)
    val sampled = SparkEntry.queries("q07_mixture_sample")(spark, dir)
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sampled.size == 5, s"expected all 5 languages represented: $sampled")
    val (lo, hi) = (sampled.values.min, sampled.values.max)
    // each stratum targets minLang docs in expectation; the hash sampler's
    // per-stratum deviation is binomial — generous ±25% bounds hold at
    // every SF while still failing on any systematic skew
    assert(hi <= (minLang * 1.25).toLong + 1, s"over-sampled stratum: $sampled (min=$minLang)")
    assert(lo >= (minLang * 0.75).toLong - 1, s"under-sampled stratum: $sampled (min=$minLang)")
  }
}
