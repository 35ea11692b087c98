package graft.multimodal

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: images/audio/video ride through the engine
  * as opaque `binary` columns plus typed metadata, and per-batch decode /
  * feature-extraction runs inside `mapPartitions` over a typed Dataset —
  * the JVM analog of `mapInPandas` (partition = batch; the decoder is
  * instantiated once per partition, not per row).
  *
  * The actual codec is stubbed ([[FakeDecoder]]) because no image/audio
  * libraries ship in this environment; the Spark-side contract — schema,
  * encoder, batch shape, partitioning — is real and is what matters at
  * 100 TB: binary payloads never shuffle (feature extraction is map-only),
  * and downstream joins/agg use only the small extracted-feature columns.
  */
object Multimodal {

  /** A media blob with typed metadata, as stored in a lakehouse table. */
  case class MediaRow(doc_id: Long, media_type: String, content: Array[Byte])

  /** Extracted features — small, shuffle-friendly. */
  case class MediaFeatures(doc_id: Long, media_type: String, n_bytes: Int,
      sig: String, width: Int, height: Int, n_frames: Int)

  /** Decoder contract. A real deployment plugs in javax.imageio / ffmpeg
    * bindings; partitions see it through one instance per task.
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): MediaFeatures.Dims
  }
  object MediaFeatures {
    case class Dims(width: Int, height: Int, nFrames: Int)
  }

  /** Deterministic stand-in for the codec: dimensions derived from the
    * md5 of the payload. Replace with a real decoder in production —
    * everything around it (schema, batching, partition flow) is final.
    */
  object FakeDecoder extends MediaDecoder {
    def decode(mediaType: String, bytes: Array[Byte]): MediaFeatures.Dims = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      def u(i: Int): Int = d(i) & 0xff
      MediaFeatures.Dims(
        width = (u(0) << 8 | u(1)) % 1024,
        height = (u(2) << 8 | u(3)) % 1024,
        nFrames = bytes.length % 7)
    }
  }

  private def hex(bytes: Array[Byte]): String =
    bytes.map("%02x".format(_)).mkString

  /** Batch feature extraction: one decoder per partition, streaming
    * through the iterator — constant memory regardless of partition size.
    */
  def extractFeatures(media: Dataset[MediaRow],
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      val md = java.security.MessageDigest.getInstance("MD5")
      rows.map { r =>
        val dims = decoder.decode(r.media_type, r.content)
        md.reset()
        MediaFeatures(r.doc_id, r.media_type, r.content.length,
          hex(md.digest(r.content)), dims.width, dims.height, dims.nFrames)
      }
    }
  }

  /** Deterministic frame sampling plan for video-like media: every k-th
    * frame index up to n_frames — computed as a column, no decode needed.
    */
  def frameSamplePlan(features: DataFrame, everyK: Int): DataFrame =
    features.withColumn("sampled_frames",
      when(col("n_frames") > 0,
        sequence(lit(0), col("n_frames") - 1, lit(everyK)))
        .otherwise(array()))

  /** The harness has no binary table, so the query derives one from
    * `documents.text` (UTF-8 bytes as the payload) and runs the real
    * extraction path over it.
    */
  def m1MediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("doc_id"), col("media_type"), col("n_bytes"), col("sig"),
        col("width"), col("height"), col("n_frames"))
      .orderBy(col("doc_id"))
      .limit(2000)
  }

  /** Frame-sampling pipeline: features → every-2nd-frame plan → explode
    * to one row per sampled frame with a per-frame fingerprint. The
    * explode happens AFTER feature extraction, so only the small feature
    * columns fan out — the binary payload never multiplies. (A real
    * deployment decodes the sampled frames in a second mapPartitions
    * pass keyed by (doc_id, frame_idx); the plan shape is identical.)
    */
  def m2FrameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.functions.FastMd5.fastMd5
    val media = Tables.documents(spark, dir)
      .select(col("doc_id"), lit("text/plain").as("media_type"),
        col("text").cast("binary").as("content"))
      .as[MediaRow]
    frameSamplePlan(extractFeatures(media).toDF(), everyK = 2)
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("sig"),
        explode(col("sampled_frames")).as("frame_idx"))
      .select(col("doc_id"),
        col("frame_idx").cast("int").as("frame_idx"),
        fastMd5(concat(col("sig"), lit(":"), col("frame_idx").cast("string")))
          .as("frame_sig"))
      .orderBy(col("doc_id"), col("frame_idx"))
      .limit(2000)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m1_media_features" -> (m1MediaFeatures _),
    "m2_frame_sample" -> (m2FrameSample _),
  )
}
