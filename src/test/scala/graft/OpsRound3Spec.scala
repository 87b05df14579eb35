package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Ann, Dedup}

/** Round-3 ops work: parameterized dims/seeds/bands (oracle stays pinned
  * at the defaults), the simhash band-width cost guard, and seeded-k-means
  * IVF centroids with a recall bound. */
class OpsRound3Spec extends AnyFunSuite {

  private def spark = TestSpark.spark

  /** Deterministic non-default-dim embedding table: 3 clusters in 16-d. */
  private def emb16: DataFrame = {
    val s = spark
    import s.implicits._
    (0 until 48).map { i =>
      val cluster = i % 3
      val v = Array.tabulate(16) { d =>
        val base = if (d % 3 == cluster) 1.0f else 0.05f
        base + 0.01f * ((i * 7 + d * 3) % 5)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  test("LSH top-k and near-dups work at a non-default dimension (16)") {
    val vecs = emb16.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .toMap
    def cos(a: Long, b: Long): Double = {
      val (va, vb) = (vecs(a), vecs(b))
      val dot = va.zip(vb).map { case (x, y) => x * y }.sum
      val na = math.sqrt(va.map(x => x * x).sum)
      val nb = math.sqrt(vb.map(x => x * x).sum)
      math.round(dot / (na * nb) * 10000.0) / 10000.0
    }
    val lsh = Ann.lshTopK(emb16, 3, 5, numPlanes = 6, dim = 16).collect()
    assert(lsh.nonEmpty)
    lsh.foreach { r =>
      assert(cos(r.getLong(0), r.getLong(2)) === r.getDouble(3),
        s"LSH sim must equal true cosine for (${r.getLong(0)},${r.getLong(2)})")
    }
    val nd = Dedup.embeddingNearDups(emb16, 0.9, nBands = 4,
      planesPerBand = 4, dim = 16).collect()
    assert(nd.nonEmpty)
    assert(nd.forall(_.getDouble(2) >= 0.9))
  }

  test("MinHash/LSH with non-default seeds and band rows still pairs " +
       "identical docs") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta"),
      (1L, "alpha beta gamma delta epsilon zeta"), // exact dup of 0
      (2L, "totally different content with other words entirely here"),
    ).toDF("doc_id", "text")
    val pairs = Dedup.lshCandidatePairs(docs, numSeeds = 16, bandRows = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
    // signature count reflects the parameter
    val sig = Dedup.minhashSignatures(docs, numSeeds = 16)
      .groupBy("doc_id").count().collect()
    assert(sig.forall(_.getLong(1) === 16L))
  }

  test("simhash band-width envelope: maxDist >= 8 requires explicit opt-in") {
    val s = spark
    import s.implicits._
    val docs = Seq((0L, "a b c"), (1L, "a b d")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDups(docs, maxDist = 8)
    }
    // opt-in works and stays correct
    val r = Dedup.simhashNearDups(docs, maxDist = 8, allowCoarseBands = true)
      .collect()
    assert(r.forall(_.getInt(2) <= 8))
  }

  test("seeded k-means IVF: deterministic centroids, recall@5 >= 0.6 " +
       "vs brute force") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bf = Ann.bruteForceTopK(emb, 5, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val km = Ann.ivfTopKKmeans(emb, 5, 5, nCells = 8, nProbe = 3, iters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (bf intersect km).size.toDouble / bf.size
    assert(recall >= 0.6, s"k-means IVF recall@5 was $recall")
    // centroids are reproducible run to run
    val c1 = Ann.kmeansCentroids(emb, 4, 2).map(_._2.toSeq).toSeq
    val c2 = Ann.kmeansCentroids(emb, 4, 2).map(_._2.toSeq).toSeq
    assert(c1 === c2)
  }
}
