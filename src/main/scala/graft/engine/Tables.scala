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

  /** The `events.ts` fixture encoding has drifted once already (rounds
    * ≤6 shipped parquet TIMESTAMP(NANOS); round 7 regenerated the files
    * as TIMESTAMP(MICROS, isAdjustedToUTC=false)), so the ingest
    * dispatches on the SCANNED type instead of hard-coding either:
    *
    *  - `LongType` — a nanos fixture read under the session-wide
    *    `spark.sql.legacy.parquet.nanosAsLong` conf ([[rawEvents]] sets
    *    it only after a plain scan rejects the NANOS logical type).
    *    Convert with exact integer division (`DIV`, no double rounding);
    *    DuckDB keeps nanos, and all judged outputs truncate to whole
    *    seconds so the two precisions agree.
    *  - `TimestampNTZType` — a micros fixture. Reinterpret in the
    *    session time zone; every graft entrypoint (Verify, Bench,
    *    SparkSpec) pins `spark.sql.session.timeZone=UTC`, so the cast is
    *    value-preserving and matches DuckDB's TZ-less reading.
    *  - `TimestampType` — already the shape downstream expects.
    *
    * Anything else fails loudly, naming the drifted type —
    * `FixtureSchemaSpec` is the earlier, whole-catalog tripwire for the
    * same class of drift.
    */
  def normalizeTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // Magnitude guard: this arm assumes the raw int64 is NANOS. A future
        // regeneration shipping unannotated INT64 micros (or millis) would
        // otherwise misscale 1000× silently — FixtureSchemaSpec can't catch
        // it because `bigint` is an accepted ts encoding. Nanos for the
        // documented fixture era sit near 1.7e18; micros near 1.7e15. The
        // guard is a codegen'd per-row branch (no extra scan job) that fails
        // with the same "fixtures changed" message the other arms use.
        val nanosLo = 1000000000000000000L // 2001-09 as nanos
        val nanosHi = 4000000000000000000L // 2096-10 as nanos
        df.withColumn("ts",
          when(col("ts").isNull, lit(null).cast("timestamp"))
            .when(col("ts").between(nanosLo, nanosHi),
              timestamp_micros(expr("ts DIV 1000")))
            .otherwise(raise_error(concat(
              lit("fixtures changed: events.ts int64 value "),
              col("ts").cast("string"),
              lit(" is outside the nanos-era range (micros/millis regeneration?)")))))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"fixtures changed: events.ts is now ${other.simpleString} " +
          "(expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP)")
    }

  /** Scan `events.parquet` WITHOUT normalizing `ts` — streaming queries
    * need the raw scan schema for `readStream.schema(...)` so the staged
    * copies parse identically. A NANOS fixture makes the plain scan
    * throw at footer-schema conversion; only then is the legacy
    * `nanosAsLong` conf engaged — and it must stay set for the scan's
    * lifetime, since Spark consults it again at execution time (a
    * set/restore scoped to this call would make the read fail lazily). */
  def rawEvents(spark: SparkSession, sfDir: String): DataFrame = {
    val path = s"$sfDir/events.parquet"
    try {
      val df = spark.read.parquet(path)
      df.schema // force footer schema conversion while still in the try
      df
    } catch {
      case e: Exception if isNanosTypeError(e) =>
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.read.parquet(path)
    }
  }

  /** Whether a scan failure is the NANOS-logical-type rejection. Matching
    * only on the message containing "NANOS" is brittle across Spark
    * versions, so also accept the error condition / the stable "Illegal
    * Parquet type" phrasing — a wrong engage is harmless (the retried scan
    * fails with the original class of error anyway). */
  private def isNanosTypeError(e: Throwable): Boolean = {
    val msg = String.valueOf(e.getMessage)
    val cond = e match {
      case st: org.apache.spark.SparkThrowable => String.valueOf(st.getCondition)
      case _ => ""
    }
    msg.contains("NANOS") || cond.contains("PARQUET_TYPE_ILLEGAL") ||
      msg.contains("Illegal Parquet type")
  }

  def events(spark: SparkSession, sfDir: String): DataFrame =
    normalizeTs(rawEvents(spark, sfDir))

  /** Register all tables as temp views (S11 surface) so `spark.sql` text
    * queries resolve the same names the DuckDB oracle uses. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n => apply(spark, sfDir, n).createOrReplaceTempView(n) }
}
