package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.{FtsDeltas, FtsIndexBuilder}
import graft.query.{FtsIndex, FtsQuery}

/** Incremental upsert/delete semantics (reference W1-W3:
  * fts_watch_handler.py) and the incremental+compact == rebuild
  * differential. */
class FtsIncrementalSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val cfg = FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)

  private def freshIndex(docs: Seq[Fixtures.Doc]): String = {
    val root = TestSpark.tempDir("inc")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(docs), root, cfg)
    root
  }

  test("upsert adds a new searchable document") {
    val root = freshIndex(Fixtures.corpusA)
    val newDoc = Fixtures.Doc("test_repo", "src/brand_new.py", "b" * 40,
      "python", "def zebra_function():\n    return quagga_value",
      Seq("zebra_function", "quagga_value"))
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(newDoc)), root, cfg)
    val idx = new FtsIndex(spark, root)
    val rs = idx.searchCollected(FtsQuery("zebra_function"))
    assert(rs.map(_.path) === Seq("src/brand_new.py"))
  }

  test("upsert replaces an existing path (delete-by-path + add)") {
    val root = freshIndex(Fixtures.corpusA)
    val updated = Fixtures.Doc("test_repo", "src/auth.py", "c" * 40,
      "python", "def totally_rewritten():\n    return nothing_here",
      Seq("totally_rewritten"))
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(updated)), root, cfg)
    val idx = new FtsIndex(spark, root)
    // old content of src/auth.py is gone
    val old = idx.searchCollected(FtsQuery("login_user"))
    assert(!old.exists(_.path == "src/auth.py"))
    assert(old.exists(_.path == "tests/test_auth.py")) // other docs unaffected
    // new content found
    val neu = idx.searchCollected(FtsQuery("totally_rewritten"))
    assert(neu.map(_.path) === Seq("src/auth.py"))
  }

  test("delete removes a path from results") {
    val root = freshIndex(Fixtures.corpusA)
    val s = spark
    import s.implicits._
    FtsDeltas.delete(spark,
      Seq(("test_repo", "src/utils.js")).toDF("repo", "path"), root)
    val idx = new FtsIndex(spark, root)
    val rs = idx.searchCollected(FtsQuery("authenticate"))
    assert(rs.nonEmpty)
    assert(!rs.exists(_.path == "src/utils.js"))
  }

  test("incremental then compact == from-scratch rebuild (bit-identical)") {
    // path A: base(corpusA) + upsert(corpusB docs) + delete(one) + compact
    val rootInc = freshIndex(Fixtures.corpusA)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Fixtures.corpusB), rootInc, cfg)
    val s = spark
    import s.implicits._
    FtsDeltas.delete(spark,
      Seq(("test_repo", "src/config.py")).toDF("repo", "path"), rootInc)
    FtsDeltas.compact(spark, rootInc, cfg)

    // path B: direct build of the same logical corpus
    val logical = Fixtures.corpusA.filterNot(_.path == "src/config.py") ++
      Fixtures.corpusB
    val rootRef = freshIndex(logical)

    def fp(root: String) = {
      val idx = new FtsIndex(spark, root)
      idx.segments.collect().toSeq
        .map(b => (b.field, b.term, b.first_doc, b.n,
          b.doc_bytes.toSeq, b.tf_bytes.toSeq, b.pos_bytes.toSeq))
        .sortBy(t => (t._1, t._2, t._3))
    }
    assert(fp(rootInc) === fp(rootRef))

    val a = new FtsIndex(spark, rootInc).searchCollected(FtsQuery("def", limit = 0))
    val b = new FtsIndex(spark, rootRef).searchCollected(FtsQuery("def", limit = 0))
    assert(a.map(r => (r.path, r.score)) === b.map(r => (r.path, r.score)))
  }

  test("streaming sink auto-folds after foldEvery generations") {
    val root = freshIndex(Fixtures.corpusA)
    val s = spark
    import s.implicits._
    def batch(i: Int) = Seq(
      ("test_repo", s"src/auto_$i.py", i.toString * 40, "python",
        s"def auto_fn_$i(): return marker_$i")
    ).toDF("repo", "path", "commit", "lang", "content")
    (1 to 3).foreach(i =>
      graft.streaming.FtsStream.applyBatch(root, cfg, foldEvery = 2)(
        batch(i), i.toLong))
    // gens 1,2 folded into 3 after the second batch; batch 3 landed at 4,
    // then folded with 3 into 5 after the third batch's check
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val hfs = FtsIndexBuilder.fs(spark, root)
    val gens = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$vDir/deltas"))
      .map(_.getPath.getName).filter(_.matches("d\\d+")).toSeq
    assert(gens.size <= 2, s"auto-fold must bound live generations: $gens")
    val idx = new FtsIndex(spark, root)
    (1 to 3).foreach { i =>
      assert(idx.searchCollected(FtsQuery(s"marker_$i"))
        .map(_.path) === Seq(s"src/auto_$i.py"))
    }
  }

  test("streaming microbatches apply as delta generations") {
    val root = freshIndex(Fixtures.corpusA)
    val s = spark
    import s.implicits._
    // drive the foreachBatch handler directly (same code path as the sink)
    val batch1 = Seq(
      ("test_repo", "src/stream1.py", "d" * 40, "python",
        "def streamed_one(): return alpha_token"),
    ).toDF("repo", "path", "commit", "lang", "content")
    val batch2 = Seq(
      ("test_repo", "src/stream1.py", "e" * 40, "python",
        "def streamed_one_v2(): return beta_token"),
      ("test_repo", "src/auth.py", "f" * 40, "python", ""), // delete event
    ).toDF("repo", "path", "commit", "lang", "content")
    graft.streaming.FtsStream.applyBatch(root, cfg)(batch1, 0L)
    graft.streaming.FtsStream.applyBatch(root, cfg)(batch2, 1L)
    val idx = new FtsIndex(spark, root)
    assert(idx.searchCollected(FtsQuery("alpha_token")).isEmpty) // replaced
    assert(idx.searchCollected(FtsQuery("beta_token"))
      .map(_.path) === Seq("src/stream1.py"))
    assert(idx.searchCollected(FtsQuery("login_user"))
      .forall(_.path != "src/auth.py")) // deleted
  }
}
