package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 C12).
  *
  * Media ride as opaque `binary` columns next to typed metadata — the
  * same pattern a 100 TB image/audio pipeline uses (bytes in parquet or
  * pointer columns, decode on executors). The Spark-side plumbing —
  * schema, per-partition batch shape, feature columns — is real; the
  * actual codec call is stubbed behind [[MediaCodec.decode]] with a
  * deterministic fake (media libraries are not present in this
  * environment, and at scale that call is the only thing that changes).
  */
object Multimodal {

  final case class MediaMeta(media_type: String, n_bytes: Long, checksum: Long)
  final case class MediaFeatures(doc_id: Long, media_type: String,
      n_bytes: Long, checksum: Long, width: Int, height: Int, n_frames: Int)

  /** STUB decoder boundary. In production this calls the image/audio/video
    * codec (e.g. libjpeg / ffmpeg) on each byte payload. Here it derives
    * deterministic fake dimensions from the bytes so the distributed
    * plumbing (batching, schema, partitioning) is fully exercisable. */
  object MediaCodec {
    def decode(mediaType: String, bytes: Array[Byte]): (Int, Int, Int) = {
      // ??? <- real codec goes here; deterministic fake below
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 10, 1024).toInt
      val frames = mediaType match {
        case "video" => 1 + math.floorMod(h >> 20, 240).toInt
        case "audio" => 1 + math.floorMod(h >> 20, 48000).toInt
        case _ => 1
      }
      (w, ht, frames)
    }
  }

  /** Attach an opaque binary media column + typed metadata to a table
    * (test harness: fabricates bytes from a text column). */
  def withFakeMedia(df: DataFrame, textCol: String = "text"): DataFrame =
    df.withColumn("media", encode(col(textCol), "UTF-8").cast("binary"))
      .withColumn("media_type",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (abs(xxhash64(col(textCol))) % 3 + 1).cast("int")))
      .withColumn("n_bytes", length(col("media")).cast("long"))
      .withColumn("checksum", xxhash64(col("media")))

  /** Decode/feature-extract over partition-local batches. Executors see
    * an iterator per partition — the batch shape a vectorized decoder
    * wants — and emit typed feature rows. */
  def extractFeatures(spark: SparkSession, df: DataFrame,
      idCol: String = "doc_id"): Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), col("media_type"), col("media"),
        col("n_bytes"), col("checksum"))
      .as[(Long, String, Array[Byte], Long, Long)]
      .mapPartitions { rows =>
        rows.map { case (id, mt, bytes, nBytes, checksum) =>
          val (w, h, f) = MediaCodec.decode(mt, bytes)
          MediaFeatures(id, mt, nBytes, checksum, w, h, f)
        }
      }
  }

  final case class ResizedMedia(doc_id: Long, media_type: String,
      target_w: Int, target_h: Int, resized: Array[Byte])

  /** Resize plumbing: decode → resample → re-encode per row, batched per
    * partition. The resample itself is the stubbed codec call — here a
    * deterministic byte-resample to `targetW*targetH/16` bytes — but the
    * distributed shape (binary in, binary out, no driver involvement,
    * no shuffle) is the production one. */
  def resize(spark: SparkSession, df: DataFrame, targetW: Int, targetH: Int,
      idCol: String = "doc_id"): Dataset[ResizedMedia] = {
    import spark.implicits._
    df.select(col(idCol).as("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val outLen = math.max(targetW * targetH / 16, 1)
        rows.map { case (id, mt, bytes) =>
          // ??? <- real decode+resample+encode; deterministic byte
          // resample below keeps the pipeline testable
          val out = new Array[Byte](outLen)
          var i = 0
          while (i < outLen) {
            out(i) = if (bytes.isEmpty) 0
              else bytes((i.toLong * bytes.length / outLen).toInt)
            i += 1
          }
          ResizedMedia(id, mt, targetW, targetH, out)
        }
      }
  }

  final case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Frame sampling: video rows fan out to `n` evenly-spaced frame rows
    * (explode-shaped; output partitioning inherits the input, so a
    * downstream per-frame model call is embarrassingly parallel). */
  def frameSample(spark: SparkSession, df: DataFrame, n: Int,
      idCol: String = "doc_id"): Dataset[Frame] = {
    import spark.implicits._
    df.filter(col("media_type") === "video")
      .select(col(idCol).as("doc_id"), col("media_type"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.flatMap { case (id, mt, bytes) =>
          val (_, _, nFrames) = MediaCodec.decode(mt, bytes)
          val take = math.min(n, nFrames)
          (0 until take).iterator.map { k =>
            val fi = (k.toLong * nFrames / math.max(take, 1)).toInt
            // ??? <- real frame decode; deterministic slice stands in
            val sliceLen = math.max(bytes.length / math.max(nFrames, 1), 1)
            val start = math.min(fi.toLong * sliceLen, math.max(bytes.length - 1, 0)).toInt
            val end = math.min(start + sliceLen, bytes.length)
            Frame(id, fi, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start)))
          }
        }
      }
  }
}
