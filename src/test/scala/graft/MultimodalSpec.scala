package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing: schema, determinism, batch shapes. Image (PNG via
  * javax.imageio) and audio (RIFF/WAVE PCM16) kernels are REAL codecs;
  * video demux remains a documented stub — see Multimodal scaladoc. */
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

  test("image resize updates metadata, video frame sampling respects duration") {
    val resized = Multimodal.resizeImages(media, 32, 32).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(m => m.meta.width == 32 && m.meta.height == 32))
    val frames = Multimodal.sampleFrames(media, 1000L).collect()
    assert(frames.nonEmpty)
    val byId = frames.groupBy(_.media_id)
    byId.values.foreach { fs =>
      assert(fs.length === 4) // 4000 ms duration / 1000 ms
      assert(fs.map(_.ts_ms).sorted.toSeq === Seq(0L, 1000L, 2000L, 3000L))
    }
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

  test("media stats aggregate") {
    val st = Multimodal.mediaStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.values.sum === 30)
  }
}
