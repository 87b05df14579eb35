package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.{FtsDeltas, FtsIndexBuilder}
import graft.query.{FtsIndex, FtsQuery}

/** Tiered delta compaction ([[FtsDeltas.fold]]): N generations fold into
  * one with identical query results, base shards untouched, and cost that
  * scales with delta size rather than index size. */
class FtsFoldSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val cfg = FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)

  private val battery = Seq(
    FtsQuery("def", limit = 0),
    FtsQuery("merge", limit = 5),
    FtsQuery("login_user", limit = 5),
    FtsQuery("zebra_one", limit = 5),
    FtsQuery("rewritten_two", limit = 5))

  private def results(root: String): Seq[Seq[(String, Double)]] = {
    val idx = new FtsIndex(spark, root)
    battery.map(q => idx.searchCollected(q).map(r => (r.path, r.score)))
  }

  private def segmentState(root: String): Seq[(String, Long, Long)] = {
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val hfs = FtsIndexBuilder.fs(spark, root)
    def walk(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.FileStatus] =
      hfs.listStatus(p).toSeq.flatMap { st =>
        if (st.isDirectory) walk(st.getPath) else Seq(st)
      }
    walk(new org.apache.hadoop.fs.Path(s"$vDir/segments"))
      .map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
      .sortBy(_._1)
  }

  private def deltaGens(root: String): Seq[Int] = {
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val hfs = FtsIndexBuilder.fs(spark, root)
    val d = new org.apache.hadoop.fs.Path(s"$vDir/deltas")
    if (!hfs.exists(d)) Nil
    else hfs.listStatus(d).map(_.getPath.getName).filter(_.matches("d\\d+"))
      .map(_.drop(1).toInt).sorted.toSeq
  }

  test("fold: N generations -> 1, identical results, base segments untouched") {
    val root = TestSpark.tempDir("fold")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root, cfg)
    // gen 1: new docs; gen 2: replace one of them; gen 3: delete a base doc
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/z1.py", "a" * 40, "python",
        "def zebra_one(): return merge", Nil),
      Fixtures.Doc("test_repo", "src/z2.py", "b" * 40, "python",
        "def zebra_two(): return sort", Nil))), root, cfg)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/z2.py", "c" * 40, "python",
        "def rewritten_two(): return def_value", Nil))), root, cfg)
    val s = spark
    import s.implicits._
    FtsDeltas.delete(spark,
      Seq(("test_repo", "src/utils.js")).toDF("repo", "path"), root)
    assert(deltaGens(root) === Seq(1, 2, 3))

    val beforePaths = results(root).map(_.map(_._1))
    val segsBefore = segmentState(root)
    val folded = FtsDeltas.fold(spark, root, cfg)
    assert(folded === Some(4))
    assert(deltaGens(root) === Seq(4))
    assert(segmentState(root) === segsBefore,
      "fold must not rewrite or touch base segment files")
    assert(results(root).map(_.map(_._1)) === beforePaths,
      "fold must not change result membership/order")

    // exact-score contract: the folded index == base + ONE net upsert of
    // the surviving delta docs + the net delete. (Folding PURGES dead
    // delta docs from df/N — strictly closer to the rebuilt state than the
    // pre-fold index, whose dead docs still count per the
    // eventual-consistency contract.)
    val rootRef = TestSpark.tempDir("foldref")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA),
      rootRef, cfg)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/z1.py", "a" * 40, "python",
        "def zebra_one(): return merge", Nil),
      Fixtures.Doc("test_repo", "src/z2.py", "c" * 40, "python",
        "def rewritten_two(): return def_value", Nil))), rootRef, cfg)
    FtsDeltas.delete(spark,
      Seq(("test_repo", "src/utils.js")).toDF("repo", "path"), rootRef)
    assert(results(root) === results(rootRef),
      "folded index must score exactly like base + net upsert + net delete")

    // life goes on: a later upsert lands at gen 5 and compaction still
    // converges to the rebuilt state
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/z3.py", "d" * 40, "python",
        "def after_fold(): return 1", Nil))), root, cfg)
    assert(new FtsIndex(spark, root)
      .searchCollected(FtsQuery("after_fold")).map(_.path) === Seq("src/z3.py"))
    assert(new FtsIndex(spark, root)
      .searchCollected(FtsQuery("zebra_one")).map(_.path) === Seq("src/z1.py"))
  }

  test("fold reads delta-sized input, not index-sized") {
    // base: a few hundred docs with fat content; deltas: 2 tiny docs
    val fat = (1 to 300).map(i => Fixtures.Doc("test_repo", s"src/fat_$i.py",
      i.toString * 40, "python",
      s"def fat_fn_$i():\n" + (s"    filler_line_$i = value_token\n" * 60),
      Nil))
    val root = TestSpark.tempDir("foldsz")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(fat), root, cfg)
    for (n <- Seq("aa", "bb")) {
      FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
        Fixtures.Doc("test_repo", s"src/$n.py", n * 20, "python",
          s"def tiny_$n(): return 1", Nil))), root, cfg)
    }
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val hfs = FtsIndexBuilder.fs(spark, root)
    val baseBytes = hfs.getContentSummary(
      new org.apache.hadoop.fs.Path(vDir, "docs")).getLength +
      hfs.getContentSummary(
        new org.apache.hadoop.fs.Path(vDir, "segments")).getLength

    val bytesRead = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (e.taskMetrics != null)
          bytesRead.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      FtsDeltas.fold(spark, root, cfg)
      Thread.sleep(500) // let the async listener bus drain
    } finally spark.sparkContext.removeSparkListener(listener)

    assert(bytesRead.get() < baseBytes / 2,
      s"fold read ${bytesRead.get()} bytes but the base index holds " +
        s"$baseBytes — tiered compaction must not scan the base")
    // and the fold was still correct
    val idx = new FtsIndex(spark, root)
    assert(idx.searchCollected(FtsQuery("tiny_aa")).map(_.path) === Seq("src/aa.py"))
    assert(idx.searchCollected(FtsQuery("fat_fn_7")).nonEmpty)
  }
}
