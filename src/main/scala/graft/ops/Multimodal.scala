package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media blobs as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * fixed-size batches (the JVM analog of `mapInPandas` batch processing).
  *
  * The actual codecs (JPEG decode, audio resample, video frame extraction)
  * are NOT available in this environment — the decode kernels below are
  * clearly-marked DETERMINISTIC STUBS (`fakeDecode*`): they produce
  * hash-seeded, reproducible outputs with the right shapes so the
  * Spark-side contract — schema, partitioning, batch iteration, output
  * arity — is real and tested. Swapping in a real codec is a drop-in
  * replacement of the kernel function.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int,
                             durationMs: Long)
  final case class MediaRow(media_id: Long, kind: String,
                            bytes: Array[Byte], meta: MediaMeta)
  final case class Feature(media_id: Long, kind: String, dim: Int,
                           features: Array[Float])
  final case class Frame(media_id: Long, frame_idx: Int, ts_ms: Long,
                         frame_bytes: Array[Byte])

  /** Deterministic synthetic media table derived from the documents table
    * (no external data): bytes are seeded by sha256(doc text). */
  def syntheticMedia(spark: SparkSession, sfDir: String,
                     limit: Int = 64): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .where(col("doc_id") < limit)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        val kind = (id % 3) match {
          case 0 => "image"; case 1 => "audio"; case _ => "video"
        }
        val seed = java.security.MessageDigest.getInstance("SHA-256")
          .digest(text.getBytes("UTF-8"))
        // blob = repeated digest, sized by kind (deterministic)
        val size = kind match {
          case "image" => 4096; case "audio" => 8192; case _ => 16384
        }
        val bytes = Array.tabulate[Byte](size)(i => seed(i % seed.length))
        val meta = kind match {
          case "image" => MediaMeta(64, 64, 0, 0L)
          case "audio" => MediaMeta(0, 0, 16000, 2000L)
          case _ => MediaMeta(64, 64, 0, 4000L)
        }
        MediaRow(id, kind, bytes, meta)
      }
  }

  /** STUB KERNEL: "decode" a media blob to a feature vector. Real impl
    * would be a JPEG/PCM decoder + model forward pass; here: hash-seeded
    * floats (deterministic in the blob bytes). */
  private def fakeDecodeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish rolling over the blob
    var i = 0
    while (i < bytes.length) { h = h * 31 + bytes(i); i += 1 }
    var j = 0
    while (j < dim) {
      h ^= (h << 13); h ^= (h >>> 7); h ^= (h << 17) // xorshift
      out(j) = (h % 1000003L).toFloat / 1000003.0f
      j += 1
    }
    out
  }

  /** Feature extraction over binary columns: batched per partition (batch
    * arrays amortize per-row overhead exactly like Arrow batches would). */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32,
                      batchSize: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped kernel call (a real impl would hand the whole batch
        // to the native decoder at once)
        batch.iterator.map { m =>
          Feature(m.media_id, m.kind, dim, fakeDecodeFeatures(m.bytes, dim))
        }
      }
    }
  }

  /** STUB KERNEL: resize an image blob; real impl = image scaling. Output
    * is a deterministic byte slice with updated metadata. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { m =>
      val n = math.min(m.bytes.length, w * h) // STUB: crop bytes
      m.copy(bytes = java.util.Arrays.copyOf(m.bytes, n),
        meta = m.meta.copy(width = w, height = h))
    }
  }

  /** STUB KERNEL: sample frames from a video blob at a fixed interval;
    * real impl = container demux + keyframe decode. */
  def sampleFrames(media: Dataset[MediaRow],
                   everyMs: Long = 1000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1, (m.meta.durationMs / everyMs).toInt)
      val chunk = math.max(1, m.bytes.length / n)
      (0 until n).map { i =>
        val start = i * chunk
        val end = math.min(m.bytes.length, start + chunk)
        Frame(m.media_id, i, i * everyMs,
          java.util.Arrays.copyOfRange(m.bytes, start, end))
      }
    }
  }

  /** Kind/byte stats as a plain aggregate (useful as a pipeline smoke). */
  def mediaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF().groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(length(col("bytes"))).as("total_bytes"))
}
