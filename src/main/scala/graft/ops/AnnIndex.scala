package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Serving-side IVF index over an embeddings table — the scale path for
  * the hybrid query's semantic half (reference: HNSW over its vector
  * store at ~20 ms per query, docs/query-guide.md:76,498; the engine-side
  * contract starts from the query vector, SURVEY §0).
  *
  * Built once per snapshot and reused across queries:
  *   - seeded k-means centroids ([[Ann.kmeansCentroids]]) held on the
  *     driver (nCells x dim doubles — tiny);
  *   - the vector->cell assignment relation, persisted and repartitioned
  *     by cell. At cluster scale this relation is written bucketed /
  *     partitioned by cell, so a probe scans only the probed cells'
  *     files; nothing per-query is ever index-sized.
  *
  * Per query: probe selection is DRIVER-side math over the centroid
  * array (zero Spark jobs), then ONE job scores only the nProbe probed
  * cells — a TakeOrderedAndProject over |probed cells| rows instead of a
  * full-table scan. The exact scan ([[graft.query.Hybrid.semanticTopK]])
  * stays available as the correctness/contract mode.
  */
class AnnIndex(emb: DataFrame, val nCells: Int = 64, val nProbe: Int = 8,
               iters: Int = 5) {

  /** Seeded k-means cell centroids (cell id -> centroid), driver-held. */
  val centroids: Array[(Int, Array[Double])] =
    Ann.kmeansCentroids(emb, nCells, iters)

  /** (vec_id, cell, embedding), cell-partitioned and persisted — the same
    * assignment relation (and tie-break contract) as [[Ann.assignCells]],
    * which the `ann_ivf_topk` oracle pins. */
  val assigned: DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cents = centroids.toSeq.toDF("cell", "ce0")
      .select(col("cell"), col("ce0").as("ce"))
    val a = Ann.assignCells(emb, cents)
      .repartition(col("cell"))
      .persist()
    a.count() // materialize once
    a
  }

  private def cosineLocal(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** The query's nProbe nearest cells (ties -> lower cell id); pure
    * driver math over the centroid array. */
  def probeCells(queryVec: Array[Float]): Seq[Int] = {
    val q = queryVec.map(_.toDouble)
    centroids.map { case (c, ce) => (c, cosineLocal(q, ce)) }
      .sortBy { case (c, s) => (-s, c) }
      .take(nProbe).map(_._1).toSeq
  }

  /** Approximate cosine top-k of a query vector: ONE pruned job over the
    * probed cells (similarity rounded to 4 decimals, ordering and
    * self-inclusion identical to the exact contract scan). */
  def topK(queryVec: Array[Float], k: Int): Seq[(Long, Double)] = {
    val cells = probeCells(queryVec)
    val qLit = array(queryVec.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    assigned.where(col("cell").isin(cells: _*))
      .select(col("vec_id"),
        round(Ann.cosine(qLit, col("embedding")), 4).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
      .toSeq
  }

  /** Release the persisted assignment relation. */
  def close(): Unit = { assigned.unpersist(); () }
}
