package graft.spark

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal span handling: image/audio/video payloads ride as opaque
  * `binary` columns with typed metadata. The Spark-side plumbing — schema,
  * partition-preserving batch processing, deterministic batching shape —
  * is real and tested; the codec itself is STUBBED with a deterministic
  * fake (this container ships no image/audio libraries), clearly marked
  * below. Swapping in a real decoder is a one-function change.
  */
object MultimodalOps {

  final case class MediaMeta(media_ref: String, kind: String, bytes: Int,
                             width: Int, height: Int, sample_rate: Int)

  /** Materialize media payloads for the media spans of a docs table:
    * deterministic fake bytes derived from the media_ref (stands in for a
    * fetch from blob storage). Output schema is the real contract:
    * (doc_id, media_ref, payload binary, meta struct). */
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
          // ---- STUB: deterministic fake payload (no codec libs here) ----
          val seed = ref.hashCode.toLong & 0xffffffffL
          val rnd = new java.util.Random(seed)
          val n = 256 + rnd.nextInt(768)
          val payload = new Array[Byte](n)
          rnd.nextBytes(payload)
          val kind = if (seed % 3 == 0) "image" else if (seed % 3 == 1) "audio" else "video"
          (docId, ref, payload, kind)
        }
      }
      .toDF("doc_id", "media_ref", "payload", "media_kind")
  }

  /** Decode/feature-extract pass: mapPartitions over binary payloads in
    * executor-sized batches — the exact shape a Pandas-UDF/mapInPandas
    * decode would take, minus the real codec. Produces typed metadata plus
    * a fixed-length feature vector per payload. */
  def decodeAndFeaturize(media: DataFrame, featureDim: Int = 16): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media_ref", "payload", "media_kind")
      .as[(String, String, Array[Byte], String)]
      .mapPartitions { it =>
        it.map { case (docId, ref, payload, kind) =>
          // ---- STUB decode: parse "header" deterministically from bytes.
          // A real implementation would decode image dims / audio rate here.
          val width = 16 + (math.abs(payload(0).toInt) % 64) * 16
          val height = 16 + (math.abs(payload(1).toInt) % 64) * 16
          val rate = if (kind == "audio") 8000 + (math.abs(payload(2).toInt) % 5) * 8000 else 0
          // feature vector: byte-histogram projection (deterministic fake
          // for an embedding; the batch/shape plumbing is the real part)
          val feat = new Array[Float](featureDim)
          var i = 0
          while (i < payload.length) {
            feat(math.abs(payload(i).toInt) % featureDim) += 1.0f
            i += 1
          }
          val norm = math.sqrt(feat.map(f => f * f).sum).toFloat max 1e-6f
          (docId, ref, kind, payload.length, width, height, rate,
            feat.map(_ / norm))
        }
      }
      .toDF("doc_id", "media_ref", "media_kind", "bytes", "width", "height",
        "sample_rate", "feature")
  }

  /** Frame-sampling shape for video: one row per sampled frame index —
    * explode with a deterministic stride, preserving (doc, ref) lineage. */
  def sampleFrames(decoded: DataFrame, everyN: Int = 10, maxFrames: Int = 8): DataFrame =
    decoded.where(col("media_kind") === "video")
      .withColumn("n_frames", least(lit(maxFrames),
        greatest(lit(1), (col("bytes") / everyN).cast("int"))))
      .withColumn("frame_idx", explode(sequence(lit(0), col("n_frames") - 1)))
      .drop("n_frames")
}
