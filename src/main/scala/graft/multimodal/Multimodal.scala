package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators for training-data pipelines: image/audio/video
  * travel as opaque `binary` payload columns with typed metadata, and every
  * transformation is either a pure expression (slicing, hashing, counting) or
  * a typed `mapPartitions` kernel over payload batches — the Scala analogue
  * of `mapInPandas` batch processing.
  *
  * Scale design:
  *  - payloads never shuffle unless an operator needs them co-located; the
  *    frame/metadata paths below are all map-side;
  *  - the decode kernel is per-partition batched (one iterator pass, no
  *    per-row driver involvement), so at 100 TB it parallelizes by input
  *    split exactly like any scan;
  *  - media libraries are NOT available in this environment, so
  *    [[DecodedMedia]] extraction is a STUB: a deterministic pseudo-decoder
  *    over the payload bytes. The schema, partitioning, kernel signature and
  *    batch shape are the real contract; swap [[decodeStub]]'s body for a
  *    real codec (JNI/ImageIO/ffmpeg) without touching anything else.
  */
object Multimodal {

  /** Canonical media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, media_type: String, payload: Array[Byte])

  /** STUB decode output — deterministic pseudo-metadata derived from the
    * payload so tests/oracles are exact. A real decoder fills the same
    * fields from the actual container headers.
    */
  case class DecodedMedia(doc_id: Long, media_type: String, n_bytes: Long,
                          width: Int, height: Int, checksum: String)

  /** Fixed-size frame slicing as pure expressions: (doc_id, frame_idx,
    * frame_bytes, frame_md5). Binary `substring` + `sequence`/`explode`
    * stay codegen-friendly and map-side.
    */
  def frames(media: DataFrame, frameBytes: Int): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("n_frames",
        ((col("n_bytes") + frameBytes - 1) / frameBytes).cast("long"))
      .withColumn("frame_idx",
        // guard: sequence(0, -1) would generate a DESCENDING range for an
        // empty payload; emit no frames instead
        explode(when(col("n_frames") > 0,
          sequence(lit(0L), col("n_frames") - 1))
          .otherwise(array().cast("array<long>"))))
      .withColumn("frame",
        expr(s"substring(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes)"))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).cast("long").as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))

  /** Deterministic frame sampling (first / middle / last) — the
    * frame-sample stage of a video pipeline, as pure expressions.
    */
  def frameSample(framesDf: DataFrame): DataFrame = {
    val perDoc = framesDf.groupBy("doc_id")
      .agg(max("frame_idx").as("last_idx"))
      .withColumn("mid_idx", (col("last_idx") / 2).cast("long"))
    framesDf.join(broadcast(perDoc), Seq("doc_id"))
      .where(col("frame_idx") === 0 || col("frame_idx") === col("mid_idx") ||
        col("frame_idx") === col("last_idx"))
      .select(col("doc_id"), col("frame_idx"), col("frame_bytes"), col("frame_md5"))
  }

  /** Batched per-partition decode. STUB: pseudo-dimensions derived from the
    * byte stream (a real decoder would parse container headers here); the
    * iterator shape — consume a partition of payloads, emit one decoded row
    * each, never materialize the partition — is the production contract.
    */
  def decodeStub(media: Dataset[MediaRow]): Dataset[DecodedMedia] =
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { m =>
        val n = m.payload.length.toLong
        // ---- STUB pseudo-decode (deterministic; replace with real codec) --
        val width = 64 + ((n * 131L + m.doc_id) % 193L).toInt
        val height = 64 + ((n * 37L + m.doc_id * 7L) % 157L).toInt
        // -------------------------------------------------------------------
        digest.reset()
        DecodedMedia(m.doc_id, m.media_type, n, width, height,
          digest.digest(m.payload).map("%02x".format(_)).mkString)
      }
    }(Encoders.product[DecodedMedia])

  /** Resize metadata stage (STUB decode downstream): target box scaling with
    * aspect preservation — pure arithmetic on the decoded metadata, the real
    * pixel resample would live in the same mapPartitions kernel as decode.
    */
  def resizePlan(decoded: Dataset[DecodedMedia], maxSide: Int): DataFrame =
    decoded.toDF()
      .withColumn("scale",
        when(greatest(col("width"), col("height")) <= maxSide, lit(1.0))
          .otherwise(lit(maxSide) / greatest(col("width"), col("height")).cast("double")))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))
}
