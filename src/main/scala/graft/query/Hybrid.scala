package graft.query

import org.apache.spark.sql.DataFrame

/** Hybrid parallel search — SURVEY Q15 (reference: cli.py:5039-5107
  * `_execute_hybrid_search`): FTS and semantic search run CONCURRENTLY in
  * a 2-worker pool and their result lists are returned separately — the
  * reference deliberately does NOT fuse scores ("results displayed
  * separately (no score fusion)").
  *
  * The semantic side here is the ANN layer over an embeddings table
  * ([[graft.ops.Ann]]): the caller supplies the query embedding (the
  * reference obtains it from its embedding provider, which is out of
  * scope per SURVEY §0 — the engine-side contract is identical from the
  * query vector on). Cosine top-k goes through the same bucketed plans as
  * the `ann_*` contract queries.
  */
object Hybrid {

  /** One semantic hit: neighbor vector id + cosine similarity. */
  final case class SemanticHit(vec_id: Long, sim: Double)

  /** Both result lists, separate (reference displays them side by side,
    * daemon/service.py:244-256 returns `{"semantic": ..., "fts": ...}`). */
  final case class HybridResults(fts: Seq[SearchResult],
                                 semantic: Seq[SemanticHit])

  /** Run FTS and semantic search in parallel (the reference's 2-worker
    * ThreadPoolExecutor — here two futures over the shared SparkSession;
    * Spark schedules the two job DAGs concurrently). CONTRACT MODE: the
    * semantic half is the exact full scan — bit-reproducible, but O(table)
    * per query; production serving goes through [[search(idx*]] with an
    * [[graft.ops.AnnIndex]]. */
  def search(idx: FtsIndex, emb: DataFrame, queryVec: Array[Float],
             q: FtsQuery, kSemantic: Int = 10): HybridResults =
    runBoth(idx, q, semanticTopK(emb, queryVec, kSemantic))

  /** Production hybrid: the semantic half probes a prebuilt IVF index
    * through its warm cell cache — driver-side probe selection, one
    * pruned job per COLD cell, zero jobs hot (the reference's ~20 ms
    * HNSW analog, docs/query-guide.md:76) — instead of a full scan of
    * the embeddings table. [[graft.ops.AnnIndex.topK]] is the same
    * plan kept on the cluster for vector sets too large to cache cells
    * driver-side. */
  def search(idx: FtsIndex, ann: graft.ops.AnnIndex, queryVec: Array[Float],
             q: FtsQuery, kSemantic: Int): HybridResults =
    search(idx, ann, queryVec, q, kSemantic, warmSemantic = true)

  /** As above, choosing the semantic serving path explicitly:
    * `warmSemantic = false` scores the probed cells on the cluster
    * ([[graft.ops.AnnIndex.topK]]) instead of the driver cell cache —
    * for vector sets whose cells exceed the driver budget. */
  def search(idx: FtsIndex, ann: graft.ops.AnnIndex, queryVec: Array[Float],
             q: FtsQuery, kSemantic: Int,
             warmSemantic: Boolean): HybridResults =
    runBoth(idx, q, {
      val hits =
        if (warmSemantic) ann.topKWarm(queryVec, kSemantic)
        else ann.topK(queryVec, kSemantic)
      hits.map { case (id, s) => SemanticHit(id, s) }
    })

  private def runBoth(idx: FtsIndex, q: FtsQuery,
                      semantic: => Seq[SemanticHit]): HybridResults = {
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val ftsF = Future(idx.searchCollected(q))
    val semF = Future(semantic)
    HybridResults(Await.result(ftsF, Duration.Inf),
      Await.result(semF, Duration.Inf))
  }

  /** Exact cosine top-k of a LITERAL query vector against the embeddings
    * table: the vector broadcasts as a literal array column, similarity
    * is codegen'd `aggregate`/`zip_with` math, and only k rows survive the
    * TakeOrderedAndProject — the same shape as [[graft.ops.Ann]]'s
    * contract queries. */
  def semanticTopK(emb: DataFrame, queryVec: Array[Float],
                   k: Int): Seq[SemanticHit] = {
    import org.apache.spark.sql.functions._
    val qLit = array(queryVec.toIndexedSeq.map(v => lit(v.toDouble)): _*)
    emb.select(col("vec_id"),
        round(graft.ops.Ann.cosine(qLit, col("embedding")), 4).as("sim"))
      .orderBy(desc("sim"), asc("vec_id"))
      .limit(k)
      .collect()
      .map(r => SemanticHit(r.getLong(0), r.getDouble(1)))
      .toSeq
  }
}
