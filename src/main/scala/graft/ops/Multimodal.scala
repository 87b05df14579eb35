package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media blobs as
  * opaque `binary` columns with typed metadata, processed per-partition in
  * fixed-size batches (the JVM analog of `mapInPandas` batch processing).
  *
  * Codec status (this container has no native image/audio/video libs, so
  * everything here is pure-JDK — and all three modalities are REAL codecs):
  *   - image: blobs are real PNGs; decode via `javax.imageio`
  *     (`ImageIO.read`), features are decoded-pixel statistics, resize is a
  *     real `Graphics2D` rescale + PNG re-encode.
  *   - audio: blobs are real RIFF/WAVE PCM16 files; the header is parsed
  *     and features (RMS/zero-crossings per window) are computed from
  *     decoded samples.
  *   - video: blobs are real YUV4MPEG2 (Y4M) streams — a plain-text
  *     header + raw C420 frames, the uncompressed interchange format of
  *     the ffmpeg/mjpegtools toolchain. [[parseY4m]] is a real demuxer
  *     (header params, FRAME markers, plane extraction); features are
  *     per-frame mean luminance from the decoded Y planes and
  *     [[sampleFrames]] returns actual demuxed frames at the requested
  *     interval.
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

  @inline private def xorshift(h0: Long): Long = {
    var h = h0
    h ^= (h << 13); h ^= (h >>> 7); h ^= (h << 17)
    h
  }

  private def seedOf(text: String): Long = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
      .digest(text.getBytes("UTF-8"))
    java.nio.ByteBuffer.wrap(d).getLong(0)
  }

  /** Render a deterministic WxH RGB image and encode it as a real PNG. */
  private[graft] def synthPng(seed0: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var s = seed0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        s = xorshift(s)
        img.setRGB(x, y, (s & 0xFFFFFF).toInt)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Synthesize a real RIFF/WAVE file: PCM16 mono, deterministic samples. */
  private[graft] def synthWav(seed0: Long, sampleRate: Int,
                            durationMs: Long): Array[Byte] = {
    val n = (sampleRate.toLong * durationMs / 1000L).toInt
    val dataLen = n * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1.toShort) // PCM
      .putShort(1.toShort) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2.toShort) // block align
      .putShort(16.toShort) // bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var s = seed0
    var i = 0
    while (i < n) {
      s = xorshift(s)
      bb.putShort((s & 0xFFFF).toShort)
      i += 1
    }
    bb.array()
  }

  /** Synthesize a real YUV4MPEG2 stream: the standard plain-text header,
    * then `frames` raw C420 frames (Y w*h + U,V quarter planes), bytes
    * from the deterministic xorshift stream. */
  private[graft] def synthY4m(seed0: Long, w: Int, h: Int, frames: Int,
                              fps: Int): Array[Byte] = {
    val header = s"YUV4MPEG2 W$w H$h F$fps:1 Ip A1:1 C420jpeg\n"
      .getBytes("US-ASCII")
    val frameHdr = "FRAME\n".getBytes("US-ASCII")
    val planeLen = w * h + 2 * ((w / 2) * (h / 2))
    val out = java.nio.ByteBuffer.allocate(
      header.length + frames * (frameHdr.length + planeLen))
    out.put(header)
    var s = seed0
    var f = 0
    while (f < frames) {
      out.put(frameHdr)
      var i = 0
      while (i < planeLen) { s = xorshift(s); out.put((s & 0xFF).toByte); i += 1 }
      f += 1
    }
    out.array()
  }

  /** REAL Y4M demuxer: parse the header (W/H/F params), walk the FRAME
    * markers, slice out each frame's raw C420 planes.
    * Returns (width, height, fpsNum, fpsDen, frames). */
  private[graft] def parseY4m(bytes: Array[Byte])
      : (Int, Int, Int, Int, IndexedSeq[Array[Byte]]) = {
    var nl = 0
    while (nl < bytes.length && bytes(nl) != '\n') nl += 1
    require(nl > 9 && nl < bytes.length, "not a Y4M stream")
    val parts = new String(bytes, 0, nl, "US-ASCII").split(" ")
    require(parts(0) == "YUV4MPEG2", "not a Y4M stream")
    var w = 0; var h = 0; var fn = 25; var fd = 1
    parts.iterator.drop(1).filter(_.nonEmpty).foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.drop(1).toInt
        case 'H' => h = p.drop(1).toInt
        case 'F' =>
          val a = p.drop(1).split(":"); fn = a(0).toInt; fd = a(1).toInt
        case _ => // interlacing / aspect / colorspace params: not needed
      }
    }
    require(w > 0 && h > 0, "Y4M header missing dimensions")
    val planeLen = w * h + 2 * ((w / 2) * (h / 2))
    val frames = scala.collection.immutable.IndexedSeq.newBuilder[Array[Byte]]
    var pos = nl + 1
    while (pos < bytes.length) {
      var e = pos
      while (e < bytes.length && bytes(e) != '\n') e += 1
      require(e + 1 + planeLen <= bytes.length + 0 &&
        new String(bytes, pos, math.min(5, e - pos), "US-ASCII") == "FRAME",
        "bad FRAME marker")
      pos = e + 1
      require(pos + planeLen <= bytes.length, "truncated Y4M frame")
      frames += java.util.Arrays.copyOfRange(bytes, pos, pos + planeLen)
      pos += planeLen
    }
    (w, h, fn, fd, frames.result())
  }

  /** Deterministic synthetic media table derived from the documents table
    * (no external data): image blobs are real PNGs, audio blobs are real
    * WAV files, video blobs are real Y4M streams (6 frames of 32x32 C420
    * at 25 fps), all seeded by sha256(doc text). */
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
        val seed0 = seedOf(text)
        kind match {
          case "image" =>
            MediaRow(id, kind, synthPng(seed0, 64, 64), MediaMeta(64, 64, 0, 0L))
          case "audio" =>
            MediaRow(id, kind, synthWav(seed0, 16000, 250L),
              MediaMeta(0, 0, 16000, 250L))
          case _ =>
            // 6 frames at 25 fps = 240 ms
            MediaRow(id, kind, synthY4m(seed0, 32, 32, 6, 25),
              MediaMeta(32, 32, 0, 240L))
        }
      }
  }

  /** REAL image kernel: ImageIO decode -> per-cell mean luminance grid
    * (gridDim x gridDim) + width/height, padded/truncated to `dim`. */
  private[graft] def decodeImageFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "not a decodable image")
    val grid = math.max(1, math.sqrt(math.max(0, dim - 2).toDouble).toInt)
    val out = new Array[Float](dim)
    if (dim > 0) out(0) = img.getWidth.toFloat
    if (dim > 1) out(1) = img.getHeight.toFloat
    val cw = math.max(1, img.getWidth / grid)
    val ch = math.max(1, img.getHeight / grid)
    var gy = 0
    while (gy < grid) {
      var gx = 0
      while (gx < grid) {
        // integer accumulation (sum of milli-luminance) so the value is
        // EXACT — one double division at the end makes the feature
        // bit-identical to the DuckDB oracle's computation
        var sum1000 = 0L
        var cnt = 0
        var y = gy * ch
        while (y < math.min((gy + 1) * ch, img.getHeight)) {
          var x = gx * cw
          while (x < math.min((gx + 1) * cw, img.getWidth)) {
            val rgb = img.getRGB(x, y)
            sum1000 += ((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
              (rgb & 0xFF) * 114
            cnt += 1
            x += 1
          }
          y += 1
        }
        val idx = 2 + gy * grid + gx
        if (idx < dim)
          out(idx) =
            (if (cnt == 0) 0.0 else sum1000.toDouble / (1000.0 * cnt)).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** REAL audio kernel: parse the RIFF/WAVE header, decode PCM16 samples,
    * compute sampleRate, nSamples, global RMS, and per-window RMS +
    * zero-crossing rate. */
  private[graft] def decodeWavFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 &&
      new String(bytes, 0, 4, "US-ASCII") == "RIFF" &&
      new String(bytes, 8, 4, "US-ASCII") == "WAVE", "not a WAV file")
    val sampleRate = bb.getInt(24)
    val dataLen = bb.getInt(40)
    val n = dataLen / 2
    val out = new Array[Float](dim)
    if (dim > 0) out(0) = sampleRate.toFloat
    if (dim > 1) out(1) = n.toFloat
    // global RMS — integer sum of squares (exact, order-independent), one
    // sqrt/divide at the end: bit-identical to the DuckDB oracle
    var sumSq = 0L
    var i = 0
    while (i < n) {
      val s = bb.getShort(44 + 2 * i).toLong; sumSq += s * s; i += 1
    }
    if (dim > 2) out(2) =
      (if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n) / 32768.0).toFloat
    // per-window RMS + zero crossings over the remaining dims
    val nWin = math.max(1, (dim - 3) / 2)
    val win = math.max(1, n / nWin)
    var w = 0
    while (w < nWin) {
      var sq = 0L
      var zc = 0
      var prev = 0
      var j = w * win
      val end = math.min(n, (w + 1) * win)
      while (j < end) {
        val s = bb.getShort(44 + 2 * j).toInt
        sq += s.toLong * s
        if ((s < 0 && prev >= 0) || (s >= 0 && prev < 0)) zc += 1
        prev = s
        j += 1
      }
      val cnt = math.max(1, end - w * win)
      if (3 + 2 * w < dim)
        out(3 + 2 * w) = (math.sqrt(sq.toDouble / cnt) / 32768.0).toFloat
      if (4 + 2 * w < dim) out(4 + 2 * w) = zc.toFloat / cnt
      w += 1
    }
    out
  }

  /** REAL video kernel: demux the Y4M stream, compute width/height/frame
    * count and per-frame mean luminance from the decoded Y planes —
    * integer accumulation (exact) with one double division per frame, so
    * the feature is bit-identical to the DuckDB oracle's computation. */
  private[graft] def decodeY4mFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val (w, h, _, _, frames) = parseY4m(bytes)
    val out = new Array[Float](dim)
    if (dim > 0) out(0) = w.toFloat
    if (dim > 1) out(1) = h.toFloat
    if (dim > 2) out(2) = frames.length.toFloat
    val ySize = w * h
    var f = 0
    while (f < frames.length && 3 + f < dim) {
      val fb = frames(f)
      var sum = 0L
      var i = 0
      while (i < ySize) { sum += (fb(i) & 0xFF); i += 1 }
      out(3 + f) = (sum.toDouble / ySize).toFloat
      f += 1
    }
    out
  }

  /** Feature extraction over binary columns: batched per partition (batch
    * arrays amortize per-row overhead exactly like Arrow batches would).
    * All three kernels are REAL decoders. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 32,
                      batchSize: Int = 16): Dataset[Feature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped kernel call (a real impl would hand the whole batch
        // to the native decoder at once)
        batch.iterator.map { m =>
          val f = m.kind match {
            case "image" => decodeImageFeatures(m.bytes, dim)
            case "audio" => decodeWavFeatures(m.bytes, dim)
            case _ => decodeY4mFeatures(m.bytes, dim)
          }
          Feature(m.media_id, m.kind, dim, f)
        }
      }
    }
  }

  /** REAL image resize: decode -> Graphics2D bilinear rescale -> PNG
    * re-encode, with updated metadata. */
  def resizeImages(media: Dataset[MediaRow], w: Int, h: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").map { m =>
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.bytes))
      require(src != null, "not a decodable image")
      val dst = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = dst.createGraphics()
      g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(src, 0, 0, w, h, null)
      g.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      m.copy(bytes = out.toByteArray, meta = m.meta.copy(width = w, height = h))
    }
  }

  /** REAL frame sampling: demux the Y4M stream and keep every frame
    * nearest the requested interval (frame timestamps from the container's
    * own F num:den rate). Always yields at least frame 0. */
  def sampleFrames(media: Dataset[MediaRow],
                   everyMs: Long = 1000L): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val (_, _, fn, fd, frames) = parseY4m(m.bytes)
      val periodMs = 1000.0 * fd / fn
      val step = math.max(1, math.round(everyMs / periodMs).toInt)
      frames.indices.by(step).map { i =>
        Frame(m.media_id, i, math.round(i * periodMs), frames(i))
      }
    }
  }

  /** Kind/byte stats as a plain aggregate (useful as a pipeline smoke). */
  def mediaStats(media: Dataset[MediaRow]): DataFrame =
    media.toDF().groupBy("kind")
      .agg(count(lit(1)).as("n"),
        sum(length(col("bytes"))).as("total_bytes"))
}
