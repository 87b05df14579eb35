package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Portable (Spark == DuckDB) 60-bit hash used by all dedup/ANN ops:
  * first 15 hex chars of md5, parsed as a long. Deterministic, seedable by
  * string suffix, and reproducible in the DuckDB oracle
  * (`CAST(concat('0x', substring(md5(x),1,15)) AS BIGINT)`). */
object PortableHash {
  def hash64(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")
  def hash64Sql(expr: String): String =
    s"CAST(concat('0x', substring(md5($expr), 1, 15)) AS BIGINT)"
  /** Scala-side twin of [[hash64]]: same md5 -> 60-bit long. */
  def hash64Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.take(8).map("%02x".format(_)).mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }
}

/** Large-scale deduplication operators over a `documents(doc_id, text)`
  * table — the training-data-pipeline layer (exact, MinHash+LSH, n-gram
  * Jaccard, SimHash). Every SQL-expressible stage has a DuckDB twin in
  * [[graft.OracleQueries]]; SimHash64 (bit-twiddling) is engine-only with
  * ScalaTest coverage.
  *
  * Scale notes: exact dedup is one hash-aggregate; MinHash signatures are
  * explode -> two-level aggregate (Catalyst inserts map-side partials);
  * LSH banding turns the quadratic candidate problem into an equi-join on
  * (band, key) — the only shuffle whose size depends on duplicate density,
  * not corpus size squared.
  */
object Dedup {
  import PortableHash._

  /** Contract defaults — the DuckDB oracle rows are pinned to these; the
    * operators take them as parameters so a deployment can trade recall
    * for selectivity (more seeds, wider bands). */
  final val NumSeeds = 8
  final val BandRows = 2 // 4 bands x 2 rows

  /** Tokens with the same normalization as the FTS engine. */
  def tokensCol(text: Column): Column =
    filter(split(lower(text), "[^\\p{L}\\p{N}]+"),
      t => t =!= lit("") && length(t) <= 40)

  /** Word 3-gram shingles, distinct per doc. */
  def shingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokensCol(col("text")).as("toks"))
      .where(size(col("toks")) >= 3)
      .select(col("doc_id"), explode(
        transform(sequence(lit(0), size(col("toks")) - 3),
          i => concat_ws(" ", element_at(col("toks"), i + 1),
            element_at(col("toks"), i + 2),
            element_at(col("toks"), i + 3)))).as("shingle"))
      .distinct()

  /** Exact dedup: group by content hash, keep the smallest doc_id.
    * Output: (doc_id, keeper, is_dup). */
  def exact(docs: DataFrame): DataFrame = {
    val h = docs.select(col("doc_id"), md5(col("text")).as("h"))
    val keepers = h.groupBy("h").agg(min("doc_id").as("keeper"))
    h.join(keepers, "h")
      .select(col("doc_id"), col("keeper"),
        (col("doc_id") =!= col("keeper")).as("is_dup"))
  }

  /** MinHash signatures: (doc_id, seed, minhash), seeds 0..numSeeds-1. */
  def minhashSignatures(docs: DataFrame,
                        numSeeds: Int = NumSeeds): DataFrame =
    shingles(docs)
      .crossJoin(spark_seeds(numSeeds))
      .select(col("doc_id"), col("seed"),
        hash64(concat(col("shingle"), lit("#"),
          col("seed").cast("string"))).as("h"))
      .groupBy("doc_id", "seed").agg(min("h").as("minhash"))

  private def spark_seeds(numSeeds: Int): DataFrame = {
    val s = org.apache.spark.sql.SparkSession.active
    s.range(numSeeds).select(col("id").cast("int").as("seed"))
  }

  /** LSH banding: docs sharing any (band, band-key) become candidate
    * pairs. Output: (a, b) with a < b, distinct. Band count =
    * numSeeds / bandRows; recall of a pair with Jaccard j is
    * 1 - (1 - j^bandRows)^(numSeeds/bandRows). */
  def lshCandidatePairs(docs: DataFrame, numSeeds: Int = NumSeeds,
                        bandRows: Int = BandRows): DataFrame = {
    val sig = minhashSignatures(docs, numSeeds)
      .withColumn("band", floor(col("seed") / bandRows).cast("int"))
      .groupBy("doc_id", "band")
      .agg(md5(concat_ws("_", sort_array(collect_list(
        concat_ws(":", col("seed"), col("minhash")))))).as("bkey"))
    val l = sig.select(col("band"), col("bkey"), col("doc_id").as("a"))
    val r = sig.select(col("band").as("band2"), col("bkey").as("bkey2"),
      col("doc_id").as("b"))
    l.join(r, l("band") === r("band2") && l("bkey") === r("bkey2") &&
        l("a") < r("b"))
      .select("a", "b").distinct()
  }

  /** Exact n-gram Jaccard similarity for candidate pairs.
    * Output: (a, b, jaccard rounded to 4). */
  def jaccard(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val sh = shingles(docs)
    val shA = sh.toDF("a", "shingle")
    val shB = sh.toDF("b", "shingle")
    val commons = pairs.join(shA, "a").join(shB, Seq("b", "shingle"))
      .groupBy("a", "b").agg(count(lit(1)).as("common"))
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(commons, Seq("a", "b"), "left")
      .join(sizes.toDF("a", "na"), "a")
      .join(sizes.toDF("b", "nb"), "b")
      .select(col("a"), col("b"),
        round(coalesce(col("common"), lit(0L)) /
          (col("na") + col("nb") - coalesce(col("common"), lit(0L))), 4)
          .as("jaccard"))
  }

  // ---- SimHash (portable 60-bit; DuckDB-oracled) -------------------------

  final val SimhashBits = 60

  /** 60-bit SimHash of a token multiset (Charikar): per distinct token,
    * the portable 60-bit md5 hash ([[PortableHash.hash64Local]]) votes
    * +-tf on each bit position; sign -> bit. 60 bits (not 64) so the value
    * and every intermediate stay inside a signed BIGINT — the DuckDB
    * oracle reproduces it exactly. */
  def simhash60(tokens: Seq[String]): Long = {
    val votes = new Array[Long](SimhashBits)
    tokens.groupBy(identity).foreach { case (t, occs) =>
      val tf = occs.size.toLong
      val bits = hash64Local(t)
      var i = 0
      while (i < SimhashBits) {
        if (((bits >>> i) & 1L) == 1L) votes(i) += tf else votes(i) -= tf
        i += 1
      }
    }
    var out = 0L
    var i = 0
    while (i < SimhashBits) { if (votes(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** (bitOffset, width) partition of the 60 bits into maxDist+1 bands —
    * by pigeonhole, two hashes within hamming distance maxDist agree
    * exactly on at least one band. Shared by the Spark operator and the
    * generated DuckDB oracle SQL. */
  def bandSpec(maxDist: Int): Seq[(Int, Int)] = {
    val n = maxDist + 1
    val base = SimhashBits / n
    val extra = SimhashBits % n
    var off = 0
    (0 until n).map { i =>
      val w = base + (if (i < extra) 1 else 0)
      val t = (off, w); off += w; t
    }
  }

  /** SimHash near-dup pairs: hamming(simhash) <= maxDist. Candidate
    * generation buckets on [[bandSpec]] bands, so recall is guaranteed for
    * ANY maxDist < 60 (round-1's fixed 16-bit quarters were only valid for
    * maxDist <= 3). The equi-join on (band, band-value) replaces the
    * all-pairs cross product; the hamming check is codegen'd
    * bit_count(xor). Scale knob: tighter maxDist => fewer, wider bands =>
    * exponentially more selective buckets. */
  def simhashNearDups(docs: DataFrame, maxDist: Int = 3,
                      allowCoarseBands: Boolean = false): DataFrame = {
    require(maxDist >= 0 && maxDist < SimhashBits,
      s"maxDist must be in [0, ${SimhashBits - 1}], got $maxDist")
    // cost cliff, not a correctness limit: (maxDist+1)-way banding at
    // maxDist >= 8 leaves bands of <= 6 bits = <= 64 buckets/band, and the
    // candidate equi-join degenerates toward all-pairs at scale. Callers
    // must opt in explicitly beyond the documented envelope.
    require(maxDist <= 7 || allowCoarseBands,
      s"maxDist=$maxDist yields ${SimhashBits / (maxDist + 1)}-bit bands — " +
        "candidate generation degenerates toward all-pairs at scale; pass " +
        "allowCoarseBands = true to accept the cost")
    val sim = udf((text: String) =>
      simhash60(graft.analysis.Tokenizer.tokenize(text)))
    val withSim = docs.select(col("doc_id"), sim(col("text")).as("sh"))
    val bandCols = bandSpec(maxDist).zipWithIndex.map { case ((off, w), bi) =>
      struct(lit(bi).as("q"),
        shiftrightunsigned(col("sh"), off)
          .bitwiseAND(lit((1L << w) - 1)).as("qv"))
    }
    val bands = withSim.select(col("doc_id"), col("sh"),
      explode(array(bandCols: _*)).as("band"))
      .select(col("doc_id"), col("sh"), col("band.q"), col("band.qv"))
    val l = bands.toDF("a", "sha", "q", "qv")
    val r = bands.toDF("b", "shb", "q", "qv")
    l.join(r, Seq("q", "qv")).where(col("a") < col("b"))
      .select(col("a"), col("b"),
        bit_count(col("sha").bitwiseXOR(col("shb"))).as("dist"))
      .where(col("dist") <= maxDist)
      .distinct()
  }

  /** Embedding-cosine near-duplicate pairs: vectors whose cosine similarity
    * is >= threshold. Candidates come from MULTI-BAND random-hyperplane
    * LSH ([[Ann.rhBandBuckets]]) — a pair is a candidate if ANY band's
    * sign pattern matches, so recall near the threshold is
    * 1-(1-p^planesPerBand)^nBands instead of the single-band p^8 (the
    * round-1 weak spot). Still an equi-join on (band, bkey) — no
    * all-pairs product. */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
                        nBands: Int = 4, planesPerBand: Int = 6,
                        dim: Int = Ann.Dim): DataFrame = {
    val bucketed = Ann.rhBandBuckets(emb, nBands, planesPerBand, dim)
    val l = bucketed.select(col("band"), col("bkey"),
      col("vec_id").as("a"), col("embedding").as("ea"))
    val r = bucketed.select(col("band").as("band2"), col("bkey").as("bkey2"),
      col("vec_id").as("b"), col("embedding").as("eb"))
    l.join(r, l("band") === r("band2") && l("bkey") === r("bkey2") &&
        l("a") < r("b"))
      .select(col("a"), col("b"),
        round(Ann.cosine(col("ea"), col("eb")), 4).as("sim"))
      .where(col("sim") >= threshold)
      .distinct()
  }
}
