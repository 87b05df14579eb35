package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.FtsIndexBuilder
import graft.query.{FtsIndex, FtsQuery, Hybrid}

/** Hybrid parallel search (SURVEY Q15): FTS + semantic run concurrently,
  * results returned SEPARATELY (the reference fuses nothing). */
class HybridSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("hybrid returns both result lists; semantic side matches exact " +
       "cosine ranking") {
    val root = TestSpark.tempDir("hybrid")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusA), root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4))
    val idx = new FtsIndex(spark, root)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val qv = emb.where(org.apache.spark.sql.functions.col("vec_id") === 3)
      .select("embedding").collect()(0).getSeq[Float](0).toArray

    val r = Hybrid.search(idx, emb, qv, FtsQuery("authenticate", limit = 5),
      kSemantic = 7)
    assert(r.fts.nonEmpty)
    assert(r.fts.map(_.doc_id) ===
      idx.searchCollected(FtsQuery("authenticate", limit = 5)).map(_.doc_id))
    assert(r.semantic.size === 7)
    // the query IS vector 3, so vector 3 must rank first at sim 1.0
    assert(r.semantic.head.vec_id === 3L && r.semantic.head.sim === 1.0)
    // descending similarity, deterministic tie-break
    assert(r.semantic.map(_.sim) === r.semantic.map(_.sim).sorted.reverse)
  }
}
