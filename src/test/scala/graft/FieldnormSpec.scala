package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.{Fieldnorm, FtsIndexBuilder}
import graft.query.{FtsIndex, FtsQuery, FtsQueryCache}

/** 1-byte fieldnorm quantization (SURVEY §7.3 risk 1; VERDICT r04 #7):
  * the encoder's invariants, and the differential property that matters —
  * top-k RANKING on the reference query battery is stable between the
  * exact-norm and quantized-norm builds, on every query path. */
class FieldnormSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("quantizer invariants: exact below the free range, monotone " +
       "non-decreasing, idempotent, byte-bounded") {
    // exact small norms (Lucene SmallFloat: 24 free values)
    (0 until 24).foreach(i => assert(Fieldnorm.quantize(i.toLong) === i.toLong))
    // idempotent: a quantized value is its own quantization
    val probes = Seq(0L, 1L, 23L, 24L, 100L, 1000L, 123456L, 10000000L,
      Int.MaxValue.toLong, Long.MaxValue)
    probes.foreach { v =>
      val q = Fieldnorm.quantize(v)
      assert(Fieldnorm.quantize(q) === q, s"not idempotent at $v")
    }
    // monotone over a dense sweep + code stays in one byte
    var prev = -1L
    (0 until 100000).foreach { i =>
      val q = Fieldnorm.quantize(i.toLong)
      assert(q >= prev, s"non-monotone at $i")
      prev = q
      val code = Fieldnorm.intToByte4(i)
      assert(code >= 0 && code <= 255, s"code out of byte range at $i")
    }
    // round-trip error stays within the 4-significant-bit envelope
    (24 until 100000 by 7).foreach { i =>
      val q = Fieldnorm.quantize(i.toLong).toDouble
      assert(q <= i && q > i * 0.85,
        s"quantized $q too far below $i")
    }
  }

  test("differential: quantized-norm build ranks the reference battery " +
       "identically to the exact build, on all three query paths") {
    val corpus = Fixtures.corpusA ++ Fixtures.corpusB
    val cfgEx = FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)
    val cfgQ = cfgEx.copy(quantizeNorms = true)
    val rootEx = TestSpark.tempDir("fn_exact")
    val rootQ = TestSpark.tempDir("fn_quant")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(corpus), rootEx, cfgEx)
    FtsIndexBuilder.build(spark, TestSpark.docsDf(corpus), rootQ, cfgQ)
    val ex = new FtsIndex(spark, rootEx).warm()
    val qu = new FtsIndex(spark, rootQ).warm()
    val cacheQ = new FtsQueryCache(qu)
    val battery = Seq(
      FtsQuery("authenticate", limit = 10),
      FtsQuery("def", limit = 10),
      FtsQuery("def authenticate", limit = 10),
      FtsQuery("CONFIG", caseSensitive = true, limit = 10),
      FtsQuery("authenticat", editDistance = 1, limit = 10),
      FtsQuery("def", languages = Seq("python"), limit = 10))
    battery.foreach { q =>
      val exact = ex.searchCollected(q).map(_.doc_id)
      assert(exact.nonEmpty, s"battery query '${q.text}' matched nothing")
      assert(qu.searchCollected(q).map(_.doc_id) === exact,
        s"quantized cluster ranking diverged for '${q.text}'")
      assert(qu.searchWand(q).map(_.doc_id) === exact,
        s"quantized WAND ranking diverged for '${q.text}'")
      assert(cacheQ.search(q).map(_.doc_id) === exact,
        s"quantized cached ranking diverged for '${q.text}'")
    }
    ex.cool(); qu.cool()
    // the flag is not a no-op on this corpus: at least one doc's length
    // must actually quantize to a different value
    val exactDl = corpus.map(d =>
      graft.analysis.Tokenizer.tokenize(d.content).size.toLong)
    assert(exactDl.exists(dl => Fieldnorm.quantize(dl) != dl),
      "fixture corpus has no doc long enough to exercise quantization")
  }

  test("the norm regime is INDEX state: a default-Config upsert into a " +
       "quantized index writes quantized delta postings, and compact " +
       "keeps the regime on the fresh version") {
    import org.apache.spark.sql.functions.col
    val root = TestSpark.tempDir("fn_regime")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4,
        quantizeNorms = true))
    // 100 tokens: quantize(100) = 96, so an exact-norm delta would be
    // detectable
    val longDoc = (1 to 100).map(i => s"regimeword$i").mkString(" ")
    graft.index.FtsDeltas.upsert(spark, TestSpark.docsDf(Seq(
      Fixtures.Doc("test_repo", "src/regime.py", "r1" * 20, "python",
        longDoc, Nil))), root) // DEFAULT Config — no quantizeNorms passed
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val seg = spark.read.parquet(s"$vDir/deltas/d1/segments")
      .where(col("field") === "content" && col("term") === "regimeword1")
      .select("n", "dl_bytes").collect()
    assert(seg.nonEmpty)
    val dls = seg.flatMap(r => graft.index.Codec.decodeVarints(
      r.getAs[Array[Byte]]("dl_bytes"), r.getInt(0)))
    assert(dls.nonEmpty && dls.forall(_ === 96L),
      s"delta postings must carry the QUANTIZED dl 96, got ${dls.toSeq}")
    // compact (default Config) rebuilds a fresh version — still quantized
    graft.index.FtsDeltas.compact(spark, root)
    val vDir2 = FtsIndexBuilder.currentVersionDir(spark, root)
    assert(vDir2 !== vDir)
    assert(FtsIndexBuilder.quantizedNorms(spark, vDir2),
      "compact dropped the quantized-norm regime")
  }

  test("an EXPLICIT quantizeNorms=true delta write against an exact-norm " +
       "index fails loudly instead of silently dropping the flag") {
    val root = TestSpark.tempDir("fn_mismatch")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4)) // exact
    val batch = TestSpark.docsDf(Seq(Fixtures.Doc("test_repo",
      "src/mismatch.py", "m1" * 20, "python", "mismatch body", Nil)))
    val wantQuantized = FtsIndexBuilder.Config(quantizeNorms = true)
    val e = intercept[IllegalArgumentException](
      graft.index.FtsDeltas.upsert(spark, batch, root, wantQuantized))
    assert(e.getMessage.contains("quantizeNorms"))
    intercept[IllegalArgumentException](
      graft.index.FtsDeltas.compact(spark, root, wantQuantized))
    // and nothing was written: the index still has zero delta generations
    val vDir = FtsIndexBuilder.currentVersionDir(spark, root)
    val hfs = FtsIndexBuilder.fs(spark, root)
    assert(!hfs.exists(new org.apache.hadoop.fs.Path(s"$vDir/deltas")),
      "rejected upsert left delta state behind")
  }
}
