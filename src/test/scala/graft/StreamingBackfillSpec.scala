package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.mutable.{ListBuffer, Map => MMap}

import org.apache.spark.sql.{Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Trigger.AvailableNow — the scheduled-backfill execution mode
  * (process everything that exists, in rate-limited microbatches, then
  * terminate): the way a production pipeline runs streaming logic as a
  * nightly batch while keeping exactly-once offsets. Pinned here:
  *
  *   1. the query DRAINS all input present at start and terminates on
  *      its own (awaitTermination returns true, no stop() call);
  *   2. maxFilesPerTrigger still bounds each microbatch — a 6-file
  *      backlog at 2 files/trigger is exactly 3 batches, so state and
  *      sink pressure stay bounded no matter how large the backlog;
  *   3. a SECOND AvailableNow run over the same checkpoint processes
  *      ONLY files staged since the first run — the incremental
  *      nightly-backfill contract (offsets resume, nothing re-read,
  *      nothing re-emitted) — and its updates land ON TOP of the
  *      first run's aggregate state.
  *
  * A Spark upgrade that re-reads committed files, stops batching under
  * AvailableNow, or keeps the query running fails HERE by name. */
class StreamingBackfillSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))

  /** Stage one single-parquet-file arrival holding rows [lo, hi). */
  private def stageFile(dir: String, name: String, lo: Long, hi: Long): Unit = {
    val s = spark
    import s.implicits._
    val tmp = graft.queries.Portable.scratchPath(s"backfill_stage_$name")
    (lo until hi).map(i => (i % 3, i)).toDF("k", "v")
      .coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    Files.createDirectories(Paths.get(dir))
    Files.copy(part.toPath, Paths.get(dir, s"$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("AvailableNow drains the backlog in rate-limited batches, then resumes incrementally") {
    val s = spark
    import s.implicits._
    val src = graft.queries.Portable.scratchPath("backfill_src")
    val ckpt = graft.queries.Portable.scratchPath("backfill_ckpt")
    (0 until 6).foreach(i => stageFile(src, f"f$i%02d", i * 10L, i * 10L + 10L))

    val batches = ListBuffer.empty[Long]   // batch ids, in order
    val state = MMap.empty[Long, Long]     // latest (k → sv) seen at the sink
    def run(): Boolean = {
      val q = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2")
        .parquet(src)
        .groupBy($"k").agg(sum($"v").as("sv"))
        .writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: Dataset[Row], id: Long) =>
          val rows = batch.collect().map(r => (r.getLong(0), r.getLong(1)))
          batches.synchronized {
            batches += id
            rows.foreach { case (k, sv) => state(k) = sv }
          }
          ()
        }
        .start()
      q.awaitTermination(180000)
    }

    // ── first run: 6 files at 2/trigger = exactly 3 batches, then EOF ──
    assert(run(), "AvailableNow query did not self-terminate")
    assert(batches.synchronized(batches.toList) == List(0L, 1L, 2L),
      s"6 files at maxFilesPerTrigger=2 must be batches 0,1,2: $batches")

    // ── incremental: 2 new files, same checkpoint → ONLY the delta ──
    stageFile(src, "f06", 60L, 70L)
    stageFile(src, "f07", 70L, 80L)
    batches.synchronized(batches.clear())
    assert(run(), "second AvailableNow run did not self-terminate")
    assert(batches.synchronized(batches.toList) == List(3L),
      s"resume must process the 2 new files as one batch 3, no re-reads: $batches")

    // every row counted exactly once across both runs, state carried:
    // the sink's final per-key sums equal a batch recompute of all files
    val truth = (0L until 80L).groupBy(_ % 3).view.mapValues(_.sum).toMap
    assert(state.synchronized(state.toMap) == truth,
      s"sink aggregate diverged from the batch truth: $state vs $truth")
  }
}
