package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan, TakeOrderedAndProjectExec}
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.{FtsDeltas, FtsIndexBuilder}
import graft.query.{FtsIndex, FtsQuery, ReloadingFtsIndex}

/** Round-2 search-path and delta fixes: no query-sized broadcast, WAND
  * fallback on deltas/filters, delta-aware corpus stats, line-range
  * filters, reload-on-access, sharded bulk upsert. */
class FtsRound2Spec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val cfg = FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)

  private def freshIndex(docs: Seq[Fixtures.Doc]): String = {
    val root = TestSpark.tempDir("r2")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(docs), root, cfg)
    root
  }

  private def scanOf(p: SparkPlan, pathPart: String): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec
        if f.relation.location.rootPaths.exists(_.toString.contains(pathPart)) => f
    }

  test("stopword-grade query: doc store never broadcast; scored set " +
       "reduced to k rows before the content fetch") {
    val root = freshIndex(Fixtures.corpusA ++ Fixtures.corpusB)
    val idx = new FtsIndex(spark, root)
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      // "def" appears in (nearly) every fixture doc — df ~ N, the shape
      // that used to be broadcast wholesale
      val df = idx.search(FtsQuery("def", limit = 3))
      val plan = df.queryExecution.executedPlan
      val broadcasts = plan.collect { case b: BroadcastExchangeExec => b }
      assert(broadcasts.nonEmpty) // dict + node map + k-row fetch
      broadcasts.foreach { b =>
        assert(scanOf(b, "/docs").isEmpty,
          s"doc store must never be broadcast:\n$b")
        if (scanOf(b, "/segments").nonEmpty)
          assert(b.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty,
            s"scored relation must be top-k-reduced before broadcast:\n$b")
      }
      assert(plan.collect { case t: TakeOrderedAndProjectExec => t }.nonEmpty)
      // and the results are still right (vs independent searchAnd pipeline)
      val rs = df.collect().toSeq.sortBy(r => (-r.score, r.doc_id))
      assert(rs.size === 3)
      assert(rs.forall(_.score > 0))
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("searchWand falls back on delta generations and matches exhaustive") {
    val root = freshIndex(Fixtures.corpusA)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/new_wand.py", "a" * 40, "python",
        "def merge sort merge def", Seq("merge")))), root, cfg)
    // replace a doc so a tombstone + dead doc exist
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/new_wand.py", "b" * 40, "python",
        "def quiet now", Seq("quiet")))), root, cfg)
    val idx = new FtsIndex(spark, root)
    val q = FtsQuery("def", limit = 5)
    val wand = idx.searchWand(q).map(r => (r.doc_id, r.score))
    val ex = idx.searchCollected(q).map(r => (r.doc_id, r.score))
    assert(wand === ex)
    assert(wand.nonEmpty)
  }

  test("searchWand honors the full query surface (filters)") {
    val root = freshIndex(Fixtures.corpusA)
    val idx = new FtsIndex(spark, root)
    val q = FtsQuery("def", limit = 10, languages = Seq("python"))
    val wand = idx.searchWand(q)
    val ex = idx.searchCollected(q)
    assert(wand.map(r => (r.doc_id, r.score)) === ex.map(r => (r.doc_id, r.score)))
    assert(wand.nonEmpty && wand.forall(_.language == "python"))
  }

  test("corpus stats include delta contributions: grown index scores == rebuild") {
    val extra = (1 to 8).map(i => Fixtures.Doc("test_repo", s"src/extra_$i.py",
      i.toString * 40, "python",
      s"def extra_fn_$i():\n    return def_value_$i # def", Seq(s"extra_fn_$i")))
    // path A: base + upsert (no dead docs — all new paths)
    val rootInc = freshIndex(Fixtures.corpusA)
    FtsDeltas.upsert(spark, TestSpark.docsDf(extra), rootInc, cfg)
    // path B: fresh build of the union
    val rootRef = freshIndex(Fixtures.corpusA ++ extra)

    def scores(root: String): Map[String, Double] =
      new FtsIndex(spark, root).searchCollected(FtsQuery("def", limit = 0))
        .map(r => r.path -> r.score).toMap
    val a = scores(rootInc)
    val b = scores(rootRef)
    assert(a.keySet === b.keySet)
    a.foreach { case (p, s) =>
      assert(math.abs(s - b(p)) < 1e-9, s"score mismatch at $p: $s vs ${b(p)}")
    }
    // idf sanity under delta-heavy growth: nothing negative
    assert(a.values.forall(_ > 0))
  }

  test("line-range filter selects only overlapping chunks") {
    val longDoc = Fixtures.Doc("test_repo", "src/long.py", "9" * 40, "python",
      (1 to 60).map(i => s"def chunk_line_$i(): return merge_$i").mkString("\n"),
      Nil)
    val chunked = graft.sources.ChunkedIngest.explode(
      TestSpark.docsDf(Seq(longDoc)).drop("identifiers"), chunkSize = 200)
    val root = TestSpark.tempDir("r2chunk")
    FtsIndexBuilder.build(spark, chunked, root, cfg)
    val idx = new FtsIndex(spark, root)

    val all = idx.searchCollected(FtsQuery("def", limit = 0))
    assert(all.size > 3) // multiple chunks
    val firstOnly = idx.searchCollected(
      FtsQuery("def", limit = 0, maxLine = Some(1L)))
    assert(firstOnly.map(_.line).distinct === Seq(1))
    val tail = idx.searchCollected(
      FtsQuery("def", limit = 0, minLine = Some(50L)))
    assert(tail.nonEmpty && tail.size < all.size)
    // every surviving chunk really spans line 50+
    val spans = idx.effectiveDocs
      .select("doc_id", "line_end").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(tail.forall(r => spans(r.doc_id) >= 50))
  }

  test("upserted chunks keep file-absolute line offsets (ADVICE r01)") {
    val mk = (marker: String) => Fixtures.Doc("test_repo", "src/big.py",
      "7" * 40, "python",
      (1 to 40).map(i => s"def line_fn_$i(): return filler_$i").mkString("\n") +
        s"\ndef $marker(): return 1", Nil)
    val chunkedBase = graft.sources.ChunkedIngest.explode(
      TestSpark.docsDf(Seq(mk("original_tail_fn"))).drop("identifiers"),
      chunkSize = 300)
    val root = TestSpark.tempDir("r2lines")
    FtsIndexBuilder.build(spark, chunkedBase, root, cfg)
    val before = new FtsIndex(spark, root)
      .searchCollected(FtsQuery("original_tail_fn"))
    assert(before.nonEmpty && before.head.line > 30) // file-absolute line
    // upsert the same path re-chunked with a new tail marker
    val chunkedNew = graft.sources.ChunkedIngest.explode(
      TestSpark.docsDf(Seq(mk("replacement_tail_fn"))).drop("identifiers"),
      chunkSize = 300)
    FtsDeltas.upsert(spark, chunkedNew, root, cfg)
    val after = new FtsIndex(spark, root)
      .searchCollected(FtsQuery("replacement_tail_fn"))
    assert(after.nonEmpty)
    assert(after.head.line === before.head.line,
      "upserted chunk must report the same file-absolute line as a fresh build")
  }

  test("reloading index sees upserts after warm() without reconstruction") {
    val root = freshIndex(Fixtures.corpusA)
    val r = new ReloadingFtsIndex(spark, root)
    assert(r.searchCollected(FtsQuery("xylophone_handler")).isEmpty)
    FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/xylo.py", "d" * 40, "python",
        "def xylophone_handler(): return 1", Seq("xylophone_handler")))),
      root, cfg)
    val rs = r.searchCollected(FtsQuery("xylophone_handler"))
    assert(rs.map(_.path) === Seq("src/xylo.py"))
    // the warm cache is swapped with the snapshot: cached search sees the
    // upsert too (via the cluster fallback while deltas exist)
    assert(r.searchCached(FtsQuery("xylophone_handler"))
      .map(_.path) === Seq("src/xylo.py"))
    // a full rebuild (current-pointer swap) is also picked up
    FtsDeltas.compact(spark, root, cfg)
    val rs2 = r.searchCollected(FtsQuery("xylophone_handler"))
    assert(rs2.map(_.path) === Seq("src/xylo.py"))
    // post-compaction: cache path proper (no deltas), fresh snapshot
    assert(r.searchCached(FtsQuery("xylophone_handler"))
      .map(_.path) === Seq("src/xylo.py"))
  }

  test("prefix-ngram lane: engine resolves prefix queries via the " +
       "identifiers field; off by default") {
    val root = TestSpark.tempDir("r2ng")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root,
      cfg.copy(prefixNgrams = true))
    val rs = new FtsIndex(spark, root)
      .searchCollected(FtsQuery("authent")) // prefix of "authenticate"
    assert(rs.nonEmpty)
    val root2 = TestSpark.tempDir("r2ng0")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root2, cfg)
    assert(new FtsIndex(spark, root2)
      .searchCollected(FtsQuery("authent")).isEmpty)
  }

  test("one-pass scanner == Tokenizer reference on unicode/edge content") {
    val s = spark
    import s.implicits._
    val texts = Seq(
      "def merge_sort(arr): return arr  # merge merge MERGE",
      "Δδ unicode ΤΟΚΕΝ ΤΟΚΕΝ δelta mixedΔcase",
      "İstanbul İ fi ﬁ ligature", // non-ASCII lowercase edge cases
      "a" * 41 + " keep " + "b" * 40, // >40-char token dropped, positions shift
      "", "   ", " ", "tabs\tand\nnewlines tabs",
      "emoji 🚀 split🚀token 42 42 x42_y"
    )
    val docs = texts.zipWithIndex.map { case (t, i) =>
      (i, i.toLong, t, Seq.empty[String])
    }.toDF("shard", "doc_id", "content", "ids")
    val rows = graft.index.FtsIndexBuilder
      .postingRows(docs, cfg.copy(indexRawField = true))
      .collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getAs[Array[Byte]](6).toSeq))
      .toSet
    // reference: per-token Tokenizer pipeline (the round-1 semantics)
    def varints(ps: Seq[Int]): Seq[Byte] = {
      val out = new graft.index.Codec.ByteBuf()
      ps.zip(0 +: ps.dropRight(1)).zipWithIndex.foreach { case ((p, prev), i) =>
        graft.index.Codec.writeVarLong(out,
          if (i == 0) p.toLong else (p - prev).toLong)
      }
      out.toByteArray.toSeq
    }
    val expected = texts.zipWithIndex.flatMap { case (t, i) =>
      val raw = graft.analysis.Tokenizer.tokenizeRaw(t)
      val dl = raw.size.toLong
      def field(name: String, toks: Seq[String]) =
        toks.zipWithIndex.groupBy(_._1).map { case (term, occ) =>
          (name, term, i.toLong, dl, occ.size.toLong,
            varints(occ.map(_._2)))
        }
      field("content",
        raw.map(_.toLowerCase(java.util.Locale.ROOT))) ++
        field("content_raw", raw)
    }.toSet
    assert(rows === expected)
  }

  test("driver-side query cache: identical results, zero jobs when hot, " +
       "fallback for unsupported shapes") {
    val root = freshIndex(Fixtures.corpusA ++ Fixtures.corpusB)
    val idx = new FtsIndex(spark, root).warm()
    val cache = new graft.query.FtsQueryCache(idx)
    for (text <- Seq("def", "merge sort", "login_user", "authenticate def")) {
      val q = FtsQuery(text, limit = 10)
      val cached = cache.search(q).map(r => (r.doc_id, r.score, r.path))
      val ex = idx.searchCollected(q).map(r => (r.doc_id, r.score, r.path))
      // scores double-compare (same scorer constants, same df/N/avgdl)
      assert(cached.map(_._1) === ex.map(_._1), s"docs for <$text>")
      cached.zip(ex).foreach { case (c, e) =>
        assert(math.abs(c._2 - e._2) < 1e-9, s"score for <$text>")
      }
    }
    // hot path runs no Spark jobs
    val tracker = spark.sparkContext.statusTracker
    cache.search(FtsQuery("def", limit = 10)) // warm the terms + docs
    val jobsBefore = tracker.getJobIdsForGroup(null).length
    val r = cache.search(FtsQuery("def", limit = 10))
    val jobsAfter = tracker.getJobIdsForGroup(null).length
    assert(r.nonEmpty)
    assert(jobsAfter === jobsBefore, "hot cached query must run zero jobs")
    // unsupported shapes fall back and stay correct
    val fz = FtsQuery("mergs", editDistance = 1)
    assert(cache.search(fz).map(_.doc_id) ===
      idx.searchCollected(fz).map(_.doc_id))
  }

  test("query cache: LRU capacity eviction keeps results correct") {
    val root = freshIndex(Fixtures.corpusA ++ Fixtures.corpusB)
    val idx = new FtsIndex(spark, root).warm()
    // capacity of 2 terms / 3 docs forces constant eviction
    val cache = new graft.query.FtsQueryCache(idx, maxTerms = 2, maxDocs = 3)
    val queries = Seq("def", "merge", "authenticate", "def", "merge")
    queries.foreach { text =>
      val q = FtsQuery(text, limit = 5)
      val c = cache.search(q)
      val e = idx.searchCollected(q)
      assert(c.map(_.doc_id) === e.map(_.doc_id),
        s"after eviction churn, query <$text>")
      c.zip(e).foreach { case (a, b) =>
        assert(math.abs(a.score - b.score) < 1e-9, s"score for <$text>")
      }
    }
  }

  test("bulk upsert: sharded, deterministic doc-id assignment") {
    val batch = (1 to 40).map(i => Fixtures.Doc("test_repo", s"bulk/f_$i.py",
      i.toString * 40, "python", s"def bulk_$i(): return $i", Nil))
    def upsertWith(parts: Int): Map[String, Long] = {
      val root = freshIndex(Fixtures.corpusA)
      FtsDeltas.upsert(spark, TestSpark.docsDf(batch).repartition(parts),
        root, cfg)
      val idx = new FtsIndex(spark, root)
      idx.docs.where(org.apache.spark.sql.functions.col("gen") > 0)
        .select("path", "doc_id").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val a = upsertWith(1)
    val b = upsertWith(7)
    assert(a === b) // parallelism-invariant
    assert(a.values.toSeq.distinct.size === 40)
    // ids spread across more than one sub-shard namespace
    assert(a.values.map(id => (id >> 28) & 0xFFF).toSet.size > 1)
  }
}
