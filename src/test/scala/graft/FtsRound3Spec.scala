package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.{FtsDeltas, FtsIndexBuilder}
import graft.query.{FtsIndex, FtsQuery}

/** Round-3 fixes: tombstones must not occupy top-k slots (ADVICE r02 #1),
  * limit=0 snippet parity across all three query paths (#3), and parameter
  * validation on the cached path. */
class FtsRound3Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val cfg = FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)

  private def freshIndex(docs: Seq[Fixtures.Doc]): String = {
    val root = TestSpark.tempDir("r3")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(docs), root, cfg)
    root
  }

  test("tombstoned docs do not occupy unfiltered top-k slots") {
    // 6 alive docs matching "zulu" with modest scores...
    val alive = (1 to 6).map(i => Fixtures.Doc("test_repo", s"src/alive_$i.py",
      i.toString * 40, "python",
      s"def fn_$i(): return zulu_value_$i # zulu mention " + ("filler " * i),
      Nil))
    // ...plus one doc whose ORIGINAL version would score highest (tiny doc,
    // high tf) and is then replaced by content without the term
    val hot = Fixtures.Doc("test_repo", "src/hot.py", "9" * 40, "python",
      "zulu zulu zulu zulu zulu", Nil)
    val root = freshIndex(alive :+ hot)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/hot.py", "8" * 40, "python",
        "def replaced(): return nothing", Nil))), root, cfg)

    val idx = new FtsIndex(spark, root)
    val rs = idx.searchCollected(FtsQuery("zulu", limit = 6))
    assert(rs.size === 6, "a dead doc must not shrink the result set")
    assert(rs.map(_.path).toSet === alive.map(_.path).toSet)
  }

  test("limit=0 forces snippets off on ALL paths (search/wand/cached) " +
       "with identical results") {
    val root = freshIndex(Fixtures.corpusA ++ Fixtures.corpusB)
    val idx = new FtsIndex(spark, root).warm()
    val cache = new graft.query.FtsQueryCache(idx)
    val q = FtsQuery("def", limit = 0, snippetLines = 5)

    val ex = idx.searchCollected(q)
    val wand = idx.searchWand(q)
    val cached = cache.search(q)
    assert(ex.nonEmpty)
    assert(ex.forall(_.snippet.isEmpty), "search: snippets must be off")
    assert(wand.forall(_.snippet.isEmpty), "searchWand: snippets must be off")
    assert(cached.forall(_.snippet.isEmpty), "cached: snippets must be off")
    assert(wand.map(r => (r.doc_id, r.score)) ===
      ex.map(r => (r.doc_id, r.score)))
    assert(cached.map(r => (r.doc_id, r.score)) ===
      ex.map(r => (r.doc_id, r.score)))
  }

  test("cached path validates query parameters like the cluster path") {
    val root = freshIndex(Fixtures.corpusA)
    val idx = new FtsIndex(spark, root)
    val cache = new graft.query.FtsQueryCache(idx)
    intercept[IllegalArgumentException] {
      cache.search(FtsQuery("merge", editDistance = 7))
    }
    intercept[IllegalArgumentException] {
      cache.search(FtsQuery("merge", limit = -1))
    }
  }
}
