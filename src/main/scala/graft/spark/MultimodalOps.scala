package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal span handling: image/audio payloads ride as opaque `binary`
  * columns with typed metadata. The decode step is REAL header parsing
  * (PNG IHDR chunk walk, WAV RIFF/fmt chunk walk, JPEG SOFn marker scan —
  * see MediaCodecs); payload "fetch" synthesizes structurally valid byte
  * streams deterministically (stand-in for a blob-storage read: this
  * container ships no media files), so the decode path is exercised on real
  * container layouts and checked against the driver's closed-form oracle.
  */
object MultimodalOps {

  /** Materialize media payloads for the media spans of a docs table: the
    * payload is a REAL encoded byte stream (PNG/WAV/JPEG) whose parameters
    * derive deterministically from the media_ref. Output schema is the
    * fetch contract: (doc_id, media_ref, payload binary). */
  def fetchMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(col("spans")).as("span"))
      .where(col("span.kind") === "media")
      .select(col("doc_id"), col("span.media_ref").as("media_ref"))
      .as[(String, String)]
      .mapPartitions { it =>
        it.map { case (docId, ref) =>
          val seed = ref.hashCode.toLong & 0xffffffffL
          (docId, ref, encodeFor(seed))
        }
      }
      .toDF("doc_id", "media_ref", "payload")
  }

  /** deterministic synthesis of a real byte stream from an integer seed
    * (the same parameter derivation the driver oracle replicates). */
  def encodeFor(seed: Long): Array[Byte] = (seed % 3) match {
    case 0 => MediaCodecs.encodePng(
      16 + (seed % 16).toInt * 4, 16 + ((seed * 7) % 16).toInt * 4, seed)
    case 1 => MediaCodecs.encodeWav(
      8000 * (1 + (seed % 6)).toInt, 1 + (seed % 2).toInt,
      64 + (seed % 64).toInt, seed)
    case _ => MediaCodecs.encodeJpegHeader(
      32 + (seed % 100).toInt, 32 + ((seed * 13) % 100).toInt)
  }

  /** Decode/feature-extract pass: mapPartitions over binary payloads in
    * executor-sized batches (the shape a mapInPandas decode takes). Header
    * fields come from real parsing; the feature vector is an L2-normalized
    * byte histogram of the payload. Unparseable payloads yield nulls. */
  def decodeAndFeaturize(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload")
      .as[(String, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (docId, ref, payload) =>
          val info = MediaCodecs.decode(payload)
          val feat = new Array[Float](featureDim)
          var i = 0
          while (i < payload.length) {
            feat((payload(i) & 0xff) % featureDim) += 1.0f
            i += 1
          }
          val norm = math.sqrt(feat.map(f => f.toDouble * f).sum).toFloat max 1e-6f
          (docId, ref,
            info.map(_.kind).orNull,
            info.map(_.width).getOrElse(0), info.map(_.height).getOrElse(0),
            info.map(_.sampleRate).getOrElse(0), info.map(_.channels).getOrElse(0),
            payload.length, feat.map(_ / norm))
        }
      }
      .toDF("doc_id", "media_ref", "media_kind", "width", "height",
        "sample_rate", "channels", "bytes", "feature")
  }

  /** Frame-sampling shape for video-like payloads: one row per sampled
    * frame index — explode with a deterministic stride, preserving
    * (doc, ref) lineage. */
  def sampleFrames(decoded: DataFrame, everyN: Int = 10, maxFrames: Int = 8): DataFrame =
    decoded.where(col("media_kind") === "image")
      .withColumn("n_frames", least(lit(maxFrames),
        greatest(lit(1), (col("bytes") / everyN).cast("int"))))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .drop("n_frames")
}
