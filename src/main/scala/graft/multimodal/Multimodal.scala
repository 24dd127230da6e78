package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: media ride as opaque `binary` columns next
  * to typed metadata; decode / feature-extraction runs batched per
  * partition via `mapPartitions` on a typed Dataset (the Scala analogue
  * of a pandas-batch UDF: one fused stage, no per-row closure dispatch
  * into Python, no shuffle).
  *
  * The actual media decode is STUBBED (this container has no
  * image/audio codecs): `decodeStub` derives deterministic fake
  * dimensions from the payload bytes. The Spark-side plumbing — typed
  * schema, batch iterator shape, partition sizing — is real and tested;
  * swapping in a JNI/codec call changes only the stub body.
  */
object Multimodal {

  /** An asset: opaque payload + envelope metadata. */
  case class MediaAsset(asset_id: Long, kind: String, payload: Array[Byte])

  /** Extracted (stub) features. */
  case class MediaMeta(asset_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int)

  /** STUB decode: deterministic pseudo-metadata from payload length —
    * replace with a real codec behind the same signature. */
  def decodeStub(a: MediaAsset): MediaMeta = {
    val n = a.payload.length.toLong
    MediaMeta(a.asset_id, a.kind, n,
      width = (n % 640).toInt,
      height = (n * 7 % 480).toInt,
      n_frames = if (a.kind == "video") (n % 30).toInt + 1 else 1)
  }

  /** Batched decode over partitions. `batchHint` only documents the
    * shape a real decoder would use (reusing codec contexts per batch). */
  def extractMeta(assets: Dataset[MediaAsset], batchHint: Int = 64): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      // a real implementation allocates its codec context once here,
      // then streams batches of `batchHint` through it
      it.map(decodeStub)
    }
  }

  /** Build a fake asset table from the documents corpus (text bytes as
    * payload) — exercises the full plumbing without codecs. */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id").as("asset_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaAsset]
  }
}
