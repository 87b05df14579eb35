package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`embeddings(vec_id, embedding float[], label)`).
  *
  *   - [[bruteForceTopK]]: exact cosine top-k, the correctness baseline —
  *     a broadcast of the (small) query set against the full vector table,
  *     dot products as codegen'd `aggregate`/`zip_with` column math, top-k
  *     per query via a window rank. At cluster scale the vector table stays
  *     partitioned; only the query set and the per-partition top-k rows
  *     move.
  *   - [[rhBuckets]] / [[lshTopK]]: random-hyperplane (SimHash-for-vectors)
  *     LSH — sign patterns of NumPlanes md5-seeded hyperplanes form the
  *     bucket key; search only scans bucket-mates. The scale path: bucket
  *     count grows 2^planes, the equi-join on bucket replaces the cross
  *     product.
  *   - [[ivfTopK]]: IVF-style probe — deterministic centroid sample (first
  *     nCells vec_ids), assign every vector to its nearest centroid,
  *     probe the query's nProbe nearest cells only.
  *
  * Hyperplane components are +-1 derived from the portable md5 hash so the
  * DuckDB oracle reproduces bucketing exactly.
  */
object Ann {
  import PortableHash._

  /** Contract defaults — the DuckDB oracle rows are pinned to these; every
    * operator takes them as parameters for non-default deployments (real
    * embeddings are 512-4096-d). */
  final val NumPlanes = 8
  final val Dim = 64

  /** Cosine similarity of two float-array columns, computed in double.
    * A zero-norm input yields NaN (undefined similarity) — guarded
    * explicitly because ANSI mode (Spark 4 default) raises DIVIDE_BY_ZERO
    * instead of following IEEE semantics. */
  def cosine(a: Column, b: Column): Column = {
    def d(c: Column) = transform(c, x => x.cast("double"))
    val da = d(a); val db = d(b)
    val dot = aggregate(zip_with(da, db, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(zip_with(da, da, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(zip_with(db, db, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v))
    val denom = na * nb
    when(denom === lit(0.0), lit(Double.NaN)).otherwise(dot / denom)
  }

  /** Exact top-k neighbors for queries (vec_id < nQueries), self excluded.
    * Output: (query_id, rank, neighbor_id, sim). `minScore` drops
    * neighbors below the (rounded) similarity floor BEFORE the k-cap —
    * the reference's `--min-score` semantic threshold (cli.py:4236,
    * applied as `score >= min_score` at cli.py:1199), so a query can
    * return fewer than k rows when the floor bites. */
  def bruteForceTopK(emb: DataFrame, nQueries: Int, k: Int,
                     minScore: Option[Double] = None): DataFrame = {
    val queries = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val all = broadcast(queries).crossJoin(
        emb.select(col("vec_id").as("neighbor_id"), col("embedding")))
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
    // NaN (zero-norm) sims would pass a bare `>=` floor — Spark and
    // DuckDB both order NaN above every number — so the floor also
    // requires a DEFINED similarity (the DuckDB twin mirrors this with
    // `NOT isnan(sim)`); the unfloored scan keeps NaN rows, as pinned
    // by the ann_topk oracle
    val scored = minScore.fold(all)(ms =>
      all.where(!isnan(col("sim")) && col("sim") >= ms))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** +-1 hyperplane component for (plane, dim), md5-portable. */
  private def sign(plane: Int, d: Int): Column =
    when(pmod(hash64(lit(s"p${plane}_d$d")), lit(2)) === 0, lit(1.0))
      .otherwise(lit(-1.0))

  /** Precomputed sign matrix as a literal 2-D array column (planes x dim) —
    * constant-folded by Catalyst, zero per-row hashing. */
  private[graft] def signMatrix: Array[Array[Double]] = signMatrixN(NumPlanes)

  /** First n md5-seeded hyperplanes of `dim` components (must match
    * sign()'s parity). */
  private[graft] def signMatrixN(n: Int, dim: Int = Dim): Array[Array[Double]] = {
    (0 until n).map { p =>
      (0 until dim).map { d =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"p${p}_d$d".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(15)
        if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
      }.toArray
    }.toArray
  }

  /** Multi-band random-hyperplane buckets: one row per (vector, band),
    * band key = sign pattern of that band's planesPerBand hyperplanes.
    * Recall of a near pair is 1 - (1 - p^planesPerBand)^nBands with
    * p = 1 - theta/pi — nBands is the recall knob, planesPerBand the
    * selectivity knob. Candidate generation stays an equi-join on
    * (band, bkey). */
  def rhBandBuckets(emb: DataFrame, nBands: Int,
                    planesPerBand: Int, dim: Int = Dim): DataFrame = {
    val m = signMatrixN(nBands * planesPerBand, dim)
    val bandCols = (0 until nBands).map { b =>
      val bits = (0 until planesPerBand).map { j =>
        val planeLit = array(m(b * planesPerBand + j).toIndexedSeq.map(lit): _*)
        val proj = aggregate(
          zip_with(transform(col("embedding"), x => x.cast("double")),
            planeLit, (x, s) => x * s),
          lit(0.0), (acc, v) => acc + v)
        when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
      }
      struct(lit(b).as("band"), bits.reduce(_ + _).as("bkey"))
    }
    emb.select(col("vec_id"), col("embedding"),
      explode(array(bandCols: _*)).as("bb"))
      .select(col("vec_id"), col("embedding"),
        col("bb.band").as("band"), col("bb.bkey").as("bkey"))
  }

  /** Random-hyperplane bucket id (0..2^numPlanes-1) per vector. */
  def rhBuckets(emb: DataFrame, numPlanes: Int = NumPlanes,
                dim: Int = Dim): DataFrame = {
    val m = signMatrixN(numPlanes, dim)
    val bucketBits = (0 until numPlanes).map { p =>
      val planeLit = array(m(p).toIndexedSeq.map(lit): _*)
      val proj = aggregate(
        zip_with(transform(col("embedding"), x => x.cast("double")),
          planeLit, (x, s) => x * s),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << p)).otherwise(lit(0L))
    }
    emb.withColumn("bucket", bucketBits.reduce(_ + _))
  }

  /** LSH top-k: exact cosine among same-bucket candidates only.
    * Output: (query_id, rank, neighbor_id, sim) — rank within bucket. */
  def lshTopK(emb: DataFrame, nQueries: Int, k: Int,
              numPlanes: Int = NumPlanes, dim: Int = Dim): DataFrame = {
    val bucketed = rhBuckets(emb, numPlanes, dim)
    val queries = bucketed.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("bucket"))
    val cands = bucketed.select(col("vec_id").as("neighbor_id"),
      col("embedding"), col("bucket"))
    val scored = broadcast(queries).join(cands, "bucket")
      .where(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }

  /** Deterministic seeded k-means centroids: init = the first nCells
    * vectors, then `iters` Lloyd rounds of (min_by cosine assignment ->
    * per-cell arithmetic-mean update). Each round is one broadcast join +
    * two hash aggregates; the nCells x dim centroid set collects to the
    * driver between rounds (tiny). Deterministic up to float summation
    * order — fine for the recall-oriented production mode; the oracle row
    * stays pinned to the "first" centroid mode. */
  def kmeansCentroids(emb: DataFrame, nCells: Int,
                      iters: Int = 5): Array[(Int, Array[Double])] = {
    val spark = emb.sparkSession
    import spark.implicits._
    var cents: Array[(Int, Array[Double])] =
      emb.where(col("vec_id") < nCells)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => (r.getLong(0).toInt,
          r.getSeq[Float](1).map(_.toDouble).toArray))
        .sortBy(_._1)
    for (_ <- 1 to iters) {
      val centsDf = broadcast(
        cents.toSeq.toDF("cell", "ce0")
          .select(col("cell"), col("ce0").as("ce")))
      val assigned = emb.crossJoin(centsDf)
        .select(col("vec_id"), col("embedding"), col("cell"),
          cosine(col("embedding"), col("ce")).as("csim"))
        .groupBy("vec_id")
        .agg(min_by(struct(col("cell"), col("embedding")),
          struct(negate(col("csim")), col("cell"))).as("m"))
        .select(col("m.cell").as("cell"), col("m.embedding").as("e"))
      val means = assigned
        .select(col("cell"), posexplode(col("e")).as(Seq("pos", "v")))
        .groupBy("cell", "pos").agg(avg("v").as("mv"))
        .groupBy("cell")
        .agg(sort_array(collect_list(struct(col("pos"), col("mv")))).as("ps"))
        .select(col("cell"),
          transform(col("ps"), p => p.getField("mv")).as("ce"))
        .collect()
        .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
        .sortBy(_._1)
      // cells that lost every member keep their previous centroid
      val got = means.toMap
      cents = cents.map { case (c, old) => (c, got.getOrElse(c, old)) }
    }
    cents
  }

  /** IVF probe with seeded-k-means centroids (production mode: better
    * cells on clustered data; same probe plan as [[ivfTopK]]). */
  def ivfTopKKmeans(emb: DataFrame, nQueries: Int, k: Int,
                    nCells: Int = 16, nProbe: Int = 4,
                    iters: Int = 5): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = kmeansCentroids(emb, nCells, iters).toSeq
      .toDF("cell", "ce0").select(col("cell"), col("ce0").as("ce"))
    ivfProbe(emb, cents.withColumn("ce",
      transform(col("ce"), _.cast("float"))), nQueries, k, nProbe)
  }

  /** IVF probe: deterministic centroids (vec_id < nCells), assign all
    * vectors to the nearest centroid, probe the query's nProbe cells.
    *
    * Assignment is a single min_by hash aggregate over the N x nCells
    * scored rows (map-side partials, no sort) — NOT a row_number window,
    * which would shuffle-and-sort all N x nCells rows by vec_id. Ties
    * break on the lower cell id via the (csim desc, cell asc) struct
    * ordering, matching the DuckDB oracle. */
  def ivfTopK(emb: DataFrame, nQueries: Int, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cents = emb.where(col("vec_id") < nCells)
      .select(col("vec_id").as("cell"), col("embedding").as("ce"))
    ivfProbe(emb, cents, nQueries, k, nProbe)
  }

  /** Nearest-centroid assignment of every vector: a single min_by hash
    * aggregate over the N x nCells scored rows (no window sort); ties
    * break on the LOWER cell id via the (csim desc, cell asc) struct
    * ordering — the contract the DuckDB oracle is pinned to. Shared by
    * the probe plans here and the serving-side [[AnnIndex]]. */
  def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("cell"),
        cosine(col("embedding"), col("ce")).as("csim"))
      .groupBy("vec_id")
      .agg(min_by(struct(col("cell"), col("embedding")),
        struct(negate(col("csim")), col("cell"))).as("m"))
      .select(col("vec_id"), col("m.cell").as("cell"),
        col("m.embedding").as("embedding"))

  private def ivfProbe(emb: DataFrame, cents: DataFrame, nQueries: Int,
                       k: Int, nProbe: Int): DataFrame = {
    val assigned = assignCells(emb, cents)
    val probeW = Window.partitionBy("query_id")
      .orderBy(desc("csim"), asc("cell"))
    val probes = emb.where(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .select(col("query_id"), col("qe"), col("cell"),
        cosine(col("qe"), col("ce")).as("csim"))
      .withColumn("r", row_number().over(probeW))
      .where(col("r") <= nProbe).drop("r", "csim")
    val scored = probes.join(assigned, "cell")
      .where(col("query_id") =!= col("vec_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        round(cosine(col("qe"), col("embedding")), 4).as("sim"))
      .distinct() // a neighbor may appear via multiple probed cells
    val w = Window.partitionBy("query_id")
      .orderBy(desc("sim"), asc("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id", "sim")
  }
}
