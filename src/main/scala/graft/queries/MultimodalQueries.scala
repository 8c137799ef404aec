package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.Tables

/** Multimodal-column plumbing — images/audio/video as opaque `binary`
  * columns with typed metadata (north-star extension; the reference has
  * no binary payloads, and neither does the testdata, so `documents.text`
  * is cast to bytes as the stand-in payload).
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in this
  * container): [[StubDecoder.decode]] derives deterministic fake
  * width/height/frame metadata from the byte stream. Everything around
  * it — binary schema, batch-shaped `mapPartitions` (the Scala analogue
  * of `mapInPandas`: one iterator per partition, amortized per-batch
  * setup), partition-preserving plumbing — is real and oracle-checked,
  * because the stub is pure arithmetic DuckDB can mirror.
  */
object MultimodalQueries {
  type Q = (SparkSession, String) => DataFrame

  final case class MediaBlob(doc_id: Long, payload: Array[Byte])
  final case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long,
                             height: Long, n_frames: Long, first_byte: Long)

  object StubDecoder {
    /** STUB: a real implementation would parse the container format
      * (e.g. JPEG SOF / WAV fmt chunk) here. Deterministic fake keeps the
      * pipeline testable end-to-end. Per-partition call site amortizes
      * decoder init across a batch, mirroring `mapInPandas` batch shape. */
    def decode(b: MediaBlob): MediaMeta = {
      val n = b.payload.length.toLong
      MediaMeta(b.doc_id, n, n % 640, (n * 7) % 480, n % 16,
        if (n > 0) b.payload(0).toLong & 0xff else -1L)
    }
  }

  val catalog: Seq[(String, Q, String)] = Seq(

    // ── binary column + metadata projection (pure relational path) ──
    ("m01_binary_meta",
      (s: SparkSession, dir: String) => {
        Tables(s, dir, "documents")
          .withColumn("payload", col("text").cast("binary"))
          .select(col("doc_id"),
            length(col("payload")).cast("long").as("n_bytes"),
            ascii(substring(col("text"), 1, 1)).cast("long").as("first_byte"))
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ── batch decode via typed mapPartitions (the multimodal UDF shape) ──
    ("m02_decode_stub",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaBlob]
          .mapPartitions { it =>
            // per-partition (= per-batch) decoder init would go here
            it.map(StubDecoder.decode)
          }
          .toDF()
          .orderBy(col("doc_id"))
      },
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height,
        |  CAST(octet_length(encode(text)) % 16 AS BIGINT) AS n_frames,
        |  CAST(ascii(substring(text, 1, 1)) AS BIGINT) AS first_byte
        |FROM documents ORDER BY doc_id""".stripMargin),

    // ── frame sampling: explode the decoded frame range, keep every 4th
    //    frame (the video-pipeline pattern: metadata drives a generator,
    //    the heavy per-frame decode happens downstream per sampled row) ──
    ("m03_frame_sample",
      (s: SparkSession, dir: String) => {
        import s.implicits._
        Tables(s, dir, "documents")
          .select(col("doc_id"), col("text").cast("binary").as("payload"))
          .as[MediaBlob]
          .mapPartitions(_.map(StubDecoder.decode))
          .toDF()
          .where(col("n_frames") > 0)
          .select(col("doc_id"), col("n_frames"),
            explode(sequence(lit(0), col("n_frames") - 1)).as("frame_no"))
          .where(pmod(col("frame_no"), lit(4)) === 0)
          .select(col("doc_id"), col("frame_no").cast("long").as("frame_no"))
          .orderBy(col("doc_id"), col("frame_no"))
      },
      """SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no FROM (
        |  SELECT doc_id,
        |         unnest(generate_series(0, CAST(octet_length(encode(text)) % 16 AS BIGINT) - 1)) AS frame_no
        |  FROM documents WHERE octet_length(encode(text)) % 16 > 0)
        |WHERE frame_no % 4 = 0
        |ORDER BY doc_id, frame_no""".stripMargin)
  )

  def queries: Map[String, Q] = catalog.map { case (n, q, _) => n -> q }.toMap
  def oracle: Map[String, String] = catalog.map { case (n, _, o) => n -> o }.toMap
}
