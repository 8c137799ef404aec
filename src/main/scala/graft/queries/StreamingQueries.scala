package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.engine.Tables
import Portable._

/** Structured-Streaming surfaces that are ALSO oracle-judged: st01 runs
  * the real streaming engine (file source → windowed agg → memory sink,
  * `Trigger.AvailableNow`) and must converge to the batch answer DuckDB
  * computes; st02 proves `session_window` semantics against an
  * islands-and-gaps SQL oracle. The incremental/stateful behaviors that
  * a batch oracle cannot observe (watermark drops, state timeouts) are
  * covered by `StreamingPresenceSpec` instead. */
object StreamingQueries {
  type Q = (SparkSession, String) => DataFrame

  val catalog: Seq[(String, Q, String)] = Seq(

    // ── the hourly count query executed BY the streaming engine ──
    ("st01_stream_counts",
      (s: SparkSession, dir: String) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // the file stream source requires a DIRECTORY; stage the single
        // parquet file into one (at scale the source would already be a
        // date-partitioned directory tree — S6)
        val stage = java.nio.file.Paths.get(Portable.scratchPath("stream_events"))
        java.nio.file.Files.createDirectories(stage)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val src = s.readStream.schema(schema).parquet(stage.toString)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
        val counts = src
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
        val q = counts.writeStream.format("memory").queryName("st01_mem")
          .outputMode("complete").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st01_mem")
          .select(tsSec(col("w.start")).as("hour"), col("event_type"), col("n"))
          .orderBy(col("hour"), col("event_type"))
      },
      s"""SELECT ${tsSecSql("date_trunc('hour', ts)")} AS hour, event_type,
         |       CAST(count(*) AS BIGINT) AS n
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin),

    // ── session_window in batch, vs the islands-and-gaps formulation ──
    ("st02_session_window",
      (s: SparkSession, dir: String) => {
        Tables.events(s, dir)
          .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), tsSec(col("sw.start")).as("session_start"),
            col("n_events"))
          .orderBy(col("user_id"), col("session_start"))
      },
      s"""WITH marked AS (
         |  SELECT user_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR date_diff('microsecond', lag(ts) OVER w, ts) >= 1800000000
         |              THEN 1 ELSE 0 END AS new_session
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sessions AS (
         |  SELECT user_id, ts,
         |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |                                ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked)
         |SELECT user_id, ${tsSecSql("min(ts)")} AS session_start,
         |       CAST(count(*) AS BIGINT) AS n_events
         |FROM sessions GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin),

    // ── streaming dedup: watermarked `dropDuplicates` on the event
    //    stream — the streaming member of the dedup family (t05's exact
    //    dedup, continuous form). The watermark column is part of the
    //    dedup key, so state evicts as event time advances instead of
    //    growing with the stream; output is the distinct (user, hour)
    //    set, aggregated to hourly presence so the judged result is
    //    deterministic regardless of which duplicate row survived. ──
    ("st03_stream_dedup",
      (s: SparkSession, dir: String) => {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val stage = java.nio.file.Paths.get(Portable.scratchPath("stream_dedup_events"))
        java.nio.file.Files.createDirectories(stage)
        java.nio.file.Files.copy(
          java.nio.file.Paths.get(s"$dir/events.parquet"),
          stage.resolve("events.parquet"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        val schema = s.read.parquet(s"$dir/events.parquet").schema
        val deduped = s.readStream.schema(schema).parquet(stage.toString)
          .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
          .withColumn("hour", date_trunc("hour", col("ts")))
          .withWatermark("hour", "2 hours")
          .dropDuplicates("user_id", "hour")
          .select(col("user_id"), col("hour"))
        val q = deduped.writeStream.format("memory").queryName("st03_mem")
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table("st03_mem")
          .groupBy(col("hour"))
          .agg(count(lit(1)).as("n_users"))
          .select(tsSec(col("hour")).as("hour"), col("n_users"))
          .orderBy(col("hour"))
      },
      s"""SELECT ${tsSecSql("date_trunc('hour', ts)")} AS hour,
         |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)
  )

  def queries: Map[String, Q] = catalog.map { case (n, q, _) => n -> q }.toMap
  def oracle: Map[String, String] = catalog.map { case (n, _, o) => n -> o }.toMap
}
