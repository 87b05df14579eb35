package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing: schema, determinism, batch shapes. All three
  * kernels are REAL codecs — image (PNG via javax.imageio), audio
  * (RIFF/WAVE PCM16), video (YUV4MPEG2 demux). */
class MultimodalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private lazy val media =
    Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001", 30).cache()

  test("synthetic media table: kinds, sizes, deterministic bytes") {
    val rows = media.collect()
    assert(rows.length === 30)
    assert(rows.map(_.kind).toSet === Set("image", "audio", "video"))
    val again = Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001", 30)
      .collect()
    assert(rows.sortBy(_.media_id).map(_.bytes.toSeq).toSeq ===
      again.sortBy(_.media_id).map(_.bytes.toSeq).toSeq)
  }

  test("feature extraction: shape and determinism") {
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(f.length === 30)
    assert(f.forall(_.features.length === 32))
    val f2 = Multimodal.extractFeatures(media, dim = 32).collect()
    assert(f.sortBy(_.media_id).map(_.features.toSeq).toSeq ===
      f2.sortBy(_.media_id).map(_.features.toSeq).toSeq)
  }

  test("image resize updates metadata, video frame sampling demuxes " +
       "real Y4M frames at the container's frame rate") {
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.meta.width == 32 && m.meta.height == 32))
    // 25 fps = 40 ms per frame; sampling at 40 ms returns every frame
    val all = Multimodal.sampleFrames(media, 40L).collect()
    assert(all.nonEmpty)
    all.groupBy(_.media_id).values.foreach { fs =>
      assert(fs.length === 6) // 6 synthesized frames
      assert(fs.map(_.ts_ms).sorted.toSeq === Seq(0L, 40L, 80L, 120L, 160L, 200L))
      // each frame is one whole C420 frame: Y 32x32 + U,V 16x16
      assert(fs.forall(_.frame_bytes.length === 32 * 32 + 2 * 16 * 16))
    }
    // sampling far above the clip duration still yields frame 0
    val sparse = Multimodal.sampleFrames(media, 1000L).collect()
    sparse.groupBy(_.media_id).values.foreach { fs =>
      assert(fs.map(_.frame_idx).toSeq === Seq(0))
    }
  }

  test("video blobs are real Y4M streams: demuxed header matches metadata") {
    val vids = media.collect().filter(_.kind == "video")
    assert(vids.nonEmpty)
    vids.foreach { m =>
      assert(new String(m.bytes, 0, 9, "US-ASCII") === "YUV4MPEG2")
      val (w, h, fn, fd, frames) = Multimodal.parseY4m(m.bytes)
      assert(w === m.meta.width && h === m.meta.height)
      assert(fn === 25 && fd === 1)
      assert(frames.length === 6)
    }
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
      .filter(_.kind == "video")
    // features carry demuxed width (dim 0), height (dim 1), frames (dim 2)
    assert(f.forall(x => x.features(0) == 32.0f && x.features(1) == 32.0f &&
      x.features(2) == 6.0f))
    // mean luminance of xorshift noise sits near 127.5
    assert(f.forall(x => x.features(3) > 100.0f && x.features(3) < 155.0f))
  }

  test("image blobs are real PNGs: decoded dims match metadata") {
    val imgs = media.collect().filter(_.kind == "image")
    assert(imgs.nonEmpty)
    imgs.foreach { m =>
      assert(m.bytes.take(8).toSeq ===
        Seq(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.bytes))
      assert(img.getWidth === m.meta.width)
      assert(img.getHeight === m.meta.height)
    }
    // image features carry decoded width/height in dims 0-1
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
      .filter(_.kind == "image")
    assert(f.forall(x => x.features(0) == 64.0f && x.features(1) == 64.0f))
    // resized blobs are decodable PNGs of the new dims
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    resized.foreach { m =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(m.bytes))
      assert(img.getWidth === 32 && img.getHeight === 32)
    }
  }

  test("audio blobs are real WAV files: parsed header matches metadata") {
    val wavs = media.collect().filter(_.kind == "audio")
    assert(wavs.nonEmpty)
    wavs.foreach { m =>
      assert(new String(m.bytes, 0, 4, "US-ASCII") === "RIFF")
      assert(new String(m.bytes, 8, 4, "US-ASCII") === "WAVE")
    }
    val f = Multimodal.extractFeatures(media, dim = 32).collect()
      .filter(_.kind == "audio")
    // features carry parsed sampleRate (dim 0), nSamples (dim 1), RMS > 0
    assert(f.forall(x => x.features(0) == 16000.0f))
    assert(f.forall(x => x.features(1) == 4000.0f)) // 16000 Hz * 250 ms
    assert(f.forall(x => x.features(2) > 0.0f))
  }

  test("decode kernels reproduce the synth formula exactly " +
       "(the invariant the DuckDB oracle relies on)") {
    // image: PNG encode/decode is lossless, so the luminance-grid features
    // must equal the values computed straight from the xorshift pixels
    def xs(h0: Long): Long = {
      var h = h0; h ^= h << 13; h ^= h >>> 7; h ^= h << 17; h
    }
    val seed = 0x1234567890abcdefL
    val png = Multimodal.synthPng(seed, 64, 64)
    val got = Multimodal.decodeImageFeatures(png, 32)
    val exp = new Array[Float](32)
    exp(0) = 64f; exp(1) = 64f
    val pix = new Array[Int](64 * 64)
    var s = seed
    for (i <- pix.indices) { s = xs(s); pix(i) = (s & 0xFFFFFF).toInt }
    for (gy <- 0 until 5; gx <- 0 until 5) {
      var sum1000 = 0L; var cnt = 0
      for (y <- gy * 12 until (gy + 1) * 12; x <- gx * 12 until (gx + 1) * 12) {
        val rgb = pix(y * 64 + x)
        sum1000 += ((rgb >> 16) & 0xFF) * 299 + ((rgb >> 8) & 0xFF) * 587 +
          (rgb & 0xFF) * 114
        cnt += 1
      }
      exp(2 + gy * 5 + gx) = (sum1000.toDouble / (1000.0 * cnt)).toFloat
    }
    assert(got.toSeq === exp.toSeq)

    // audio: WAV header + PCM16 roundtrip
    val wav = Multimodal.synthWav(seed, 16000, 250L)
    val gotA = Multimodal.decodeWavFeatures(wav, 32)
    var s2 = seed
    val samples = Array.fill(4000) {
      s2 = xs(s2); (s2 & 0xFFFF).toShort.toInt
    }
    assert(gotA(0) === 16000f && gotA(1) === 4000f)
    val sumSq = samples.map(v => v.toLong * v).sum
    assert(gotA(2) === (math.sqrt(sumSq.toDouble / 4000) / 32768.0).toFloat)

    // video: Y4M demux roundtrip — per-frame mean luma from the decoded
    // Y planes must equal the values computed straight from the xorshift
    // byte stream
    val y4m = Multimodal.synthY4m(seed, 32, 32, 6, 25)
    val gotV = Multimodal.decodeY4mFeatures(y4m, 32)
    assert(gotV(0) === 32f && gotV(1) === 32f && gotV(2) === 6f)
    var s3 = seed
    for (f <- 0 until 6) {
      var sum = 0L
      for (i <- 0 until 1536) {
        s3 = xs(s3)
        if (i < 1024) sum += (s3 & 0xFF)
      }
      assert(gotV(3 + f) === (sum.toDouble / 1024).toFloat, s"frame $f luma")
    }
    for (j <- 9 until 32) assert(gotV(j) === 0f)
  }

  test("media stats aggregate") {
    val st = Multimodal.mediaStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.values.sum === 30)
  }
}
