package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (builder-prompt north star): media
  * payloads travel as opaque `binary` columns with typed metadata;
  * decode/feature steps are partition-local transforms.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked DETERMINISTIC STUB — but everything Spark-side is
  * real and tested: the schema contract, the binary column handling,
  * the mapPartitions batch shape (the Scala analogue of mapInPandas:
  * one iterator per partition, vectorizable kernel inside), and the
  * row-multiplying frame extraction.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, media: Array[Byte])
  case class Frame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Wrap any (id, text) table into a media table: the text bytes stand
    * in for an encoded image/audio payload. */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("media_id"),
      (col(idCol) % 3).cast("int").cast("string").as("kind"),
      encode(col(payloadCol), "UTF-8").as("media"))

  /** Pure-expression metadata extraction over the binary column —
    * byte length, head bytes (hex), and a cheap content checksum. All
    * codegen'd; this is the "cheap scan pass" of a media pipeline. */
  def mediaMetadata(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      length(col("media")).as("n_bytes"),
      hex(substring(col("media"), 1, 8)).as("head_hex"),
      crc32(col("media")).as("checksum"))

  /** DECODE STUB — where a real pipeline would decode the image/audio
    * (e.g. via a JNI codec or by shipping to a Python worker with
    * mapInPandas). Here: a deterministic fake "feature vector" derived
    * from the bytes, so the distributed plumbing (partition-local
    * batch iteration, fixed-width output schema) is fully exercised.
    * The fake per-lane hash is a strided polynomial mod 1e9+7 (lane i
    * folds bytes i, i+dim, i+2*dim, ... with acc = (31*acc + b) mod p,
    * seeded acc = i+1) — bounded modular arithmetic, so an external
    * engine can replicate it exactly for differential checking. Swap
    * the body for a real codec to productionize. */
  def decodeFeaturesStub(spark: SparkSession, media: DataFrame, dim: Int = 8): DataFrame = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          // ??? real decode goes here; deterministic fake features:
          val bytes = r.media
          val feats = Array.tabulate(dim) { i =>
            var h = (i + 1).toLong
            var j = i
            while (j < bytes.length) {
              h = (31L * h + (bytes(j) & 0xffL)) % 1000000007L
              j += dim
            }
            (h % 1000L).toDouble / 1000.0
          }
          (r.media_id, r.kind, bytes.length, feats)
        }
      }
      .toDF("media_id", "kind", "n_bytes", "features")
  }

  /** Row-multiplying frame sampler (video → frames shape): splits the
    * payload into `nFrames` byte slices. The real version would seek
    * keyframes; the batch shape (explode inside mapPartitions, bounded
    * memory per partition) is the part that matters at scale. */
  def sampleFramesStub(spark: SparkSession, media: DataFrame, nFrames: Int = 4): Dataset[Frame] = {
    import spark.implicits._
    media.select(col("media_id"), col("kind"), col("media"))
      .as[MediaRow]
      .flatMap { r =>
        val n = math.min(nFrames, math.max(1, r.media.length))
        val step = math.max(1, r.media.length / n)
        (0 until n).iterator.map { i =>
          val from = i * step
          val until = math.min(r.media.length, from + step)
          Frame(r.media_id, i, r.media.slice(from, until))
        }
      }
  }
}
