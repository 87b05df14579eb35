package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Multimodal

/** Multimodal plumbing: schema, determinism, batch shapes (decode kernels
  * are deterministic stubs — see Multimodal scaladoc). */
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

  test("media stats aggregate") {
    val st = Multimodal.mediaStats(media).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(st.values.sum === 30)
  }
}
