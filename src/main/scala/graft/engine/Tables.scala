package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Testdata table loaders (see /root/repo/TESTDATA.md, FIXTURES.md §A).
  *
  * All queries take an `sfDir` like `/root/testdata/sf0.01` and read the
  * single-parquet tables from it. Reads are plain `spark.read.parquet` so
  * Catalyst column pruning / predicate pushdown reach the scan
  * (reference defeats this with UDF-derived columns — SURVEY.md §4.2).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects. Read it as a raw long (legacy conf) and convert to a
    * microsecond timestamp with exact integer division (`DIV`, no double
    * rounding). DuckDB keeps nanos; all judged outputs truncate to whole
    * seconds so the two precisions agree.
    *
    * SESSION-WIDE CONTRACT: `spark.sql.legacy.parquet.nanosAsLong` stays
    * set for the session's lifetime — Spark consults it again when the
    * scan executes, so a set/restore scoped to this call would make the
    * read fail lazily. Any graft session therefore reads EVERY
    * nanos-timestamp parquet column as a raw long; convert such columns
    * explicitly (as here) rather than expecting automatic timestamps.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
  }

  /** Register all tables as temp views (S11 surface) so `spark.sql` text
    * queries resolve the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => apply(spark, sfDir, n).createOrReplaceTempView(n) }
}
