package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Multi-repository fan-out aggregation (reference MultiResultAggregator,
  * server/multi/multi_result_aggregator.py:10-67 + fan-out collection in
  * multi_search_service.py:115-179):
  *   - always per-repository mode: results grouped by repo, no
  *     cross-repository deduplication
  *   - optional min_score filter applied BEFORE the per-repo limit
  *     (reference AC2 "Score Filtering Consistency")
  *   - per-repo limit enforced independently.
  *
  * In Spark the "fan-out" is one query over the union table — the per-repo
  * rank is a window over the repo key, so each repo's top-k computes in its
  * own partition group (the parallel-search analog; at scale this shuffles
  * only (repo, doc_id, score) tuples, never content). */
object MultiRepo {

  def aggregate(results: DataFrame, limit: Int,
                minScore: Option[Double] = None,
                orderCols: Seq[Column] =
                  Seq(desc("score"), asc("doc_id"))): DataFrame = {
    val filtered = minScore match {
      case Some(m) => results.where(col("score") >= m)
      case None => results
    }
    val w = Window.partitionBy("repo").orderBy(orderCols: _*)
    filtered.withColumn("rank", row_number().over(w))
      .where(col("rank") <= limit)
  }
}
