package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.7).
  *
  * Media assets are opaque `binary` columns + a typed metadata struct
  * travelling beside them. The real decode (image/audio codecs) is STUBBED
  * — the container has no media libraries — behind [[MediaDecoder]]; the
  * Spark-side shape is real and tested: binary payloads, metadata structs,
  * batched per-partition decode (`mapPartitions`, the Scala analogue of
  * mapInPandas batching), decode output schema, and partition sizing.
  */
object Multimodal {

  /** One decoded frame/feature record. */
  case class DecodedMeta(
      doc_id: Long, n_bytes: Long, width: Int, height: Int, n_frames: Int)

  /** The decode seam: a real build would link an image/audio codec here.
    * The deterministic fake derives plausible dimensions from the payload
    * bytes so tests and oracles can assert the plumbing end-to-end. */
  trait MediaDecoder extends Serializable {
    def decode(id: Long, payload: Array[Byte]): DecodedMeta
  }

  /** Deterministic fake decoder (see MediaDecoder): dimensions are pure
    * arithmetic over payload length, frame count samples 1 frame per 256
    * bytes. A real decoder is intentionally unimplementable here (no
    * codecs in the container). */
  object FakeDecoder extends MediaDecoder {
    def decode(id: Long, payload: Array[Byte]): DecodedMeta = {
      val n = payload.length.toLong
      DecodedMeta(id, n, (64 + n % 577).toInt, (64 + n % 331).toInt,
        (1 + n / 256).toInt)
    }
  }

  /** Attach a binary payload column + metadata struct to documents —
    * the ingestion shape for media tables: (id, media BINARY,
    * media_meta STRUCT<mime, n_bytes>). */
  def asMediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      struct(
        lit("application/octet-stream").as("mime"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"))
        .as("media_meta"))

  /** Batched per-partition decode. Partition-parallel, streaming
    * iterator-to-iterator (no partition materialization), decoder
    * instantiated once per partition — the properties that matter when
    * each partition holds gigabytes of media. */
  def decodeMedia(media: DataFrame, decoder: MediaDecoder): Dataset[DecodedMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("doc_id"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it => it.map { case (id, bytes) => decoder.decode(id, bytes) } }
  }
}
