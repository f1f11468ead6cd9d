package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star X7): media payloads ride as opaque
  * `binary` columns with typed metadata alongside; decode / feature-extract
  * run as typed `mapPartitions` stages (the Scala analog of `mapInPandas` —
  * batch-shaped, partition-local, no driver involvement).
  *
  * STUB NOTE: no image/audio codecs exist in this container, so
  * [[decodeMeta]]'s "decoder" is a clearly-marked deterministic fake that
  * derives metadata from the md5 of the payload bytes. The Spark-side
  * plumbing — schema, encoders, partition iteration, batch shape — is real
  * and tested; swapping in a real codec changes only the body of
  * `fakeDecode`.
  *
  * Scale: per-row narrow work; heavy decoders want
  * `spark.task.cpus`/partition-size tuning, not a different plan shape.
  */
object Multimodal {

  /** One media-carrying record: payload + mime riding next to the id. */
  final case class MediaDoc(doc_id: Long, content: Array[Byte], mime: String)

  /** Decoded (faked) media metadata. */
  final case class MediaMeta(doc_id: Long, media_len: Int, width: Int, height: Int, n_frames: Int)

  /** Wrap a text corpus as fake media: payload = UTF-8 bytes of `text`. */
  def attachFakeMedia(docs: DataFrame): Dataset[MediaDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text").cast("binary").as("content"),
      lit("image/fake").as("mime")).as[MediaDoc]
  }

  /** Deterministic fake decode: metadata from the payload's md5 hex. This is
    * the stub standing in for a real codec (`???` in spirit); everything
    * around it is production-shaped. */
  private def fakeDecode(m: MediaDoc, md: java.security.MessageDigest): MediaMeta = {
    md.reset()
    val hex = md.digest(m.content).map("%02x".format(_)).mkString
    def nib(i: Int): Int = Character.digit(hex.charAt(i), 16)
    MediaMeta(
      doc_id = m.doc_id,
      media_len = m.content.length,
      width = 64 + (nib(0) * 16 + nib(1)) % 448,
      height = 64 + (nib(2) * 16 + nib(3)) % 448,
      n_frames = 1 + nib(0) % 30)
  }

  /** Partition-local decode: one MessageDigest per partition (codecs are
    * exactly the kind of per-batch-expensive resource this shape is for). */
  def decodeMeta(ds: Dataset[MediaDoc]): Dataset[MediaMeta] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map(m => fakeDecode(m, md))
    }
  }
}
