package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.queries.TextQueries

/** Pins that t13b's two-pass range-partition cumsum (32-way parallel)
  * computes EXACTLY the global running-sum packing that the naive
  * unpartitioned window computes in a single task — the two-pass trick
  * must be a pure execution-shape change, never a semantics change,
  * for any partition boundary placement. */
class PackingSpec extends SparkSpec {

  test("t13b two-pass global cumsum equals the single-window form") {
    val dir = "/root/testdata/sf0.001"
    val twoPass = TextQueries.queries("t13b_pack_global")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val naive = graft.engine.Tables(spark, dir, "documents")
      .select(col("doc_id"),
        size(regexp_extract_all(col("text"),
          lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).cast("long").as("n_tok"))
      .withColumn("cum", sum(col("n_tok")).over(Window.orderBy(col("doc_id"))))
      .select(col("doc_id"), col("n_tok"),
        floor((col("cum") - col("n_tok")) / lit(512.0)).cast("long").as("bin"))
      .orderBy(col("doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    assert(twoPass.length === naive.length)
    assert(twoPass.toSeq === naive.toSeq)
  }
}
