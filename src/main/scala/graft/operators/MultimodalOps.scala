package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables._

/** Multimodal (binary) column plumbing for a training-data pipeline:
  * image/audio/video payloads ride as opaque BINARY columns with a typed
  * metadata struct; decode / feature-extract / frame-sample run as
  * per-partition batch operations over `Dataset[MediaRow]`.
  *
  * The DECODE STEP IS A DETERMINISTIC STUB — the real image/audio codecs
  * are not in this container. `decodeHeaderStub` parses graft's synthetic
  * 12-byte header (magic "GRFT", u16 width, u16 height, u32 n_frames) so
  * the Spark-side plumbing (schema, partitioning, batch shape, binary
  * slicing) is real and tested; swap the stub for an actual codec UDF at
  * deployment.
  */
object MultimodalOps {

  final case class MediaRow(doc_id: Long, media: Array[Byte], kind: String)
  final case class MediaMeta(doc_id: Long, kind: String, width: Int, height: Int,
      n_frames: Int, n_bytes: Int)

  /** Synthesize a binary "media" payload per document (deterministic from
    * text) — stands in for reading real blobs at 100 TB.
    */
  def syntheticMedia(s: SparkSession, d: String): DataFrame = {
    documents(s, d).select(
      col("doc_id"),
      // GRFT header + payload: width/height/frames derived from n_chars
      expr("""concat(
        encode('GRFT', 'UTF-8'),
        substring(encode(text, 'UTF-8'), 1, 8),
        encode(text, 'UTF-8'))""").as("media"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"))
  }

  /** STUB decode: parse the synthetic header per partition. Real pipelines
    * replace the body of this map with a codec call; the batching, schema
    * and distribution stay identical.
    */
  def decodeHeaderStub(media: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { r =>
        val b = r.media
        val ok = b.length >= 12 && b(0) == 'G' && b(1) == 'R' && b(2) == 'F' && b(3) == 'T'
        if (!ok) MediaMeta(r.doc_id, r.kind, -1, -1, -1, b.length)
        else {
          def u16(i: Int) = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
          MediaMeta(r.doc_id, r.kind, u16(4), u16(6),
            ((b(8) & 0xff) << 8) | (b(9) & 0xff), b.length)
        }
      }
    }
  }

  /** Frame sampling: slice the payload into `n` evenly spaced binary chunks
    * (pure column expressions — substr on BINARY is codegen'd).
    */
  def sampleFrames(df: DataFrame, n: Int, frameBytes: Int = 64): DataFrame = {
    val frames = (0 until n).map { i =>
      expr(s"substring(media, 13 + int((octet_length(media) - 12) * $i / $n), $frameBytes)")
        .as(s"frame_$i")
    }
    df.select(col("doc_id") +: frames: _*)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // binary plumbing end-to-end: synthesize payload → stub-decode header →
    // aggregate by kind. Oracle checks byte-lengths against the raw text.
    "q42_multimodal_stub" -> ((s, d) => {
      import s.implicits._
      val media = syntheticMedia(s, d).as[MediaRow]
      val meta = decodeHeaderStub(media)
      meta.groupBy("kind")
        .agg(
          count(lit(1)).as("n"),
          sum(col("n_bytes").cast("long")).as("total_bytes"),
          min(col("n_bytes").cast("long")).as("min_bytes"))
        .orderBy("kind")
    })
  )

  val oracle: Map[String, String] = Map(
    "q42_multimodal_stub" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                     WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
           count(*) AS n,
           CAST(sum(least(octet_length(encode(text)), 8) + octet_length(encode(text)) + 4) AS BIGINT) AS total_bytes,
           CAST(min(least(octet_length(encode(text)), 8) + octet_length(encode(text)) + 4) AS BIGINT) AS min_bytes
         FROM documents GROUP BY kind ORDER BY kind"""
  )
}
