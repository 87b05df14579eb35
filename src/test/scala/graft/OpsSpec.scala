package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.{Ann, Dedup, TextAnalysis}

/** Training-data pipeline ops: dedup family, ANN, text analysis. */
class OpsSpec extends AnyFunSuite {

  private def spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private lazy val docs = {
    val s = spark
    import s.implicits._
    // real documents plus injected exact + near duplicates
    val base = s.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val d0 = base.where($"doc_id" === 0).collect()(0).getString(1)
    val extra = Seq(
      (9000L, d0),                          // exact dup of doc 0
      (9001L, d0 + " extra tail token"),    // near dup of doc 0
      (9002L, "tiny"),                      // degenerate short doc
    ).toDF("doc_id", "text")
    base.unionByName(extra).cache()
  }

  test("exact dedup groups identical texts, keeps smallest id") {
    val r = Dedup.exact(docs).where(col("is_dup")).collect()
    assert(r.map(_.getLong(0)).contains(9000L))
    assert(r.forall(_.getLong(1) < 9000L || !r.exists(_.getLong(0) == 9000L)
      || r.find(_.getLong(0) == 9000L).get.getLong(1) == 0L))
    val keeper = r.find(_.getLong(0) == 9000L).get.getLong(1)
    assert(keeper === 0L)
  }

  test("minhash+LSH surfaces the near-duplicate pair, jaccard high") {
    val pairs = Dedup.lshCandidatePairs(docs)
    val j = Dedup.jaccard(docs, pairs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    // exact dup pair has jaccard 1.0
    assert(j.exists(p => p._1 == 0L && p._2 == 9000L && p._3 == 1.0))
    // near dup found with high jaccard
    val near = j.find(p =>
      (p._1 == 0L && p._2 == 9001L) || (p._1 == 9000L && p._2 == 9001L))
    assert(near.nonEmpty && near.get._3 > 0.8)
  }

  test("simhash near-dup detection: identical texts at distance 0") {
    val nd = Dedup.simhashNearDups(docs, maxDist = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2) /* dist */)).toSeq
    val pair = nd.find(p => p._1 == 0L && p._2 == 9000L)
    assert(pair.nonEmpty && pair.get._3 === 0)
    assert(nd.exists(p => p._1 == 0L && p._2 == 9001L)) // near dup close in hamming
  }

  test("simhash60 is deterministic and locality-sensitive") {
    val a = Dedup.simhash60(Seq("alpha", "beta", "gamma", "delta"))
    val b = Dedup.simhash60(Seq("alpha", "beta", "gamma", "delta"))
    val c = Dedup.simhash60(Seq("alpha", "beta", "gamma", "epsilon"))
    val d = Dedup.simhash60(Seq("zeta", "eta", "theta", "iota"))
    assert(a === b)
    assert(Dedup.hamming(a, c) < Dedup.hamming(a, d))
  }

  test("simhash banding has exact recall vs brute force (several maxDist)") {
    val s = spark
    import s.implicits._
    val sample = docs.limit(60).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val hashes = sample.map { case (id, t) =>
      id -> Dedup.simhash60(graft.analysis.Tokenizer.tokenize(t))
    }
    val sampleDf = sample.toDF("doc_id", "text")
    for (maxDist <- Seq(0, 3, 11, 19)) {
      val brute = (for {
        (a, ha) <- hashes; (b, hb) <- hashes if a < b
        d = Dedup.hamming(ha, hb) if d <= maxDist
      } yield (a, b, d)).toSet
      val banded = Dedup.simhashNearDups(sampleDf, maxDist,
          allowCoarseBands = true).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(banded === brute, s"maxDist=$maxDist")
    }
  }

  test("IVF top-k achieves high recall vs brute force") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val exact = Ann.bruteForceTopK(emb, 10, 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = Ann.ivfTopK(emb, 10, 5, nCells = 16, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall too low") // probe 8/16 cells
  }

  test("LSH top-k results are a subset of brute-force ranking order") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val lsh = Ann.lshTopK(emb, 5, 5).collect()
    // sims must match the exact cosine for the same pairs
    val exactAll = Ann.bruteForceTopK(emb, 5, 500).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    lsh.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      assert(math.abs(exactAll(k) - r.getDouble(3)) < 1e-9)
    }
  }

  test("embedding cosine near-dups finds duplicated vectors") {
    val s = spark
    import s.implicits._
    val emb = s.read.parquet(s"$sf/embeddings.parquet")
    val dup = emb.where($"vec_id" === 7)
      .select(lit(9100L).as("vec_id"), $"embedding", $"label")
    val withDup = emb.unionByName(dup)
    val nd = Dedup.embeddingNearDups(withDup, 0.999).collect()
    assert(nd.exists(r => r.getLong(0) == 7L && r.getLong(1) == 9100L))
  }

  test("multi-band embedding LSH recall >= single-band on injected near-dups") {
    val s = spark
    import s.implicits._
    val base = spark.read.parquet(s"$sf/embeddings.parquet")
      .where(col("vec_id") < 40)
    val rows = base.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    // deterministic perturbed copy of each vector (cos ~ 0.95-0.99)
    val injected = rows.map { case (id, v) =>
      val w = v.reverse
      val nv = math.sqrt(v.map(x => x.toDouble * x).sum)
      val nw = math.sqrt(w.map(x => x.toDouble * x).sum)
      val pert = v.zip(w).map { case (a, b) =>
        (a / nv + 0.22 * b / nw).toFloat }
      (id + 10000L, pert)
    }.toSeq
    val emb = base.select("vec_id", "embedding")
      .unionByName(injected.toDF("vec_id", "embedding"))
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    // injected ground-truth pairs above the threshold
    val truth = rows.flatMap { case (id, v) =>
      val p = injected.find(_._1 == id + 10000L).get._2
      if (cos(v, p) >= 0.901) Some((id, id + 10000L)) else None
    }.toSet
    assert(truth.size >= 30) // perturbation kept pairs above threshold
    def found(nBands: Int, ppb: Int): Set[(Long, Long)] =
      Dedup.embeddingNearDups(emb, 0.9, nBands, ppb).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
        .intersect(truth)
    val single = found(1, 8) // the round-1 single-bucket scheme
    val multi = found(4, 6)
    val recallS = single.size.toDouble / truth.size
    val recallM = multi.size.toDouble / truth.size
    assert(recallM >= recallS, s"multi $recallM < single $recallS")
    assert(recallM >= 0.6, s"multi-band recall too low: $recallM")
  }

  test("quality metrics sane on degenerate inputs") {
    val q = TextAnalysis.quality(docs).where(col("doc_id") === 9002L).collect()(0)
    assert(q.getAs[Long]("n_chars") === 4L)
    assert(q.getAs[Long]("n_words") === 1L)
    assert(q.getAs[Double]("alpha_ratio") === 1.0)
    val fp = TextAnalysis.fingerprint(docs).where(col("doc_id") === 9002L).collect()(0)
    assert(fp.isNullAt(1)) // shorter than the 8-gram window
    assert(fp.getAs[Long]("n_windows") === 0L)
  }

  test("language id picks marker-heavy language deterministically") {
    val s = spark
    import s.implicits._
    val t = Seq(
      (1L, "the cat and the dog is a pet of the house"),
      (2L, "el la de y es el la"),
      (3L, "xyzzy qwerty plugh"),
    ).toDF("doc_id", "text")
    val r = TextAnalysis.langId(t).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) === "en")
    assert(r(2L) === "es")
    assert(r(3L) === "und")
  }
}
