package graft.datapipe

import graft.core.IceDoc
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One media asset row: the opaque binary payload + typed metadata. */
final case class MediaAsset(doc_id: String, media_ref: String,
                            content: Array[Byte])
final case class MediaFeatures(doc_id: String, media_ref: String,
                               n_bytes: Long, width: Int, height: Int,
                               format: String)

/** Multimodal column plumbing: media spans become an asset table with an
  * opaque `binary` content column and typed metadata; feature extraction
  * runs batched over partitions (the batch shape a Pandas-UDF / native
  * decoder would see).
  *
  * STUB NOTE: real image/audio decoding libraries are not available in
  * this container, so [[decodeStub]] derives deterministic fake
  * dimensions from the payload. The Spark-side plumbing — schema, binary
  * column, partitioning, batched invocation — is real and tested; swap
  * `decodeStub` for a JNI/Pandas decoder to productionize.
  */
object Multimodal {

  /** Materialize media spans as an asset table. Payload bytes are a
    * deterministic function of the media_ref (stand-in for reading the
    * object store). */
  def assets(corpus: Dataset[IceDoc]): Dataset[MediaAsset] = {
    import corpus.sparkSession.implicits._
    corpus.flatMap { d =>
      d.spans.filter(_.kind == "media").map { sp =>
        MediaAsset(d.doc_id, sp.media_ref, payloadFor(sp.media_ref))
      }
    }
  }

  /** Deterministic fake payload: the ref bytes repeated 3x. */
  def payloadFor(mediaRef: String): Array[Byte] = {
    val b = mediaRef.getBytes("UTF-8")
    b ++ b ++ b
  }

  /** STUB decoder: dimensions derived deterministically from payload
    * length (real implementation would parse the image header). */
  def decodeStub(content: Array[Byte]): (Int, Int, String) = {
    val n = content.length
    (16 * (1 + n % 40), 16 * (1 + (n * 3) % 30), "img")
  }

  /** Batched feature extraction: mapPartitions with fixed-size batches —
    * the exact invocation shape of an arrow/pandas-batched decoder. */
  def extractFeatures(a: Dataset[MediaAsset],
                      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import a.sparkSession.implicits._
    a.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // one "vectorized" call per batch in a real decoder
        batch.map { m =>
          val (w, h, f) = decodeStub(m.content)
          MediaFeatures(m.doc_id, m.media_ref, m.content.length.toLong, w, h, f)
        }
      }
    }
  }
}
