package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.index.{FtsDeltas, FtsIndexBuilder}

/** Structured-Streaming ingestion: the watch-mode equivalent (reference:
  * fts_watch_handler.py watchdog events -> update_document). A stream of
  * (repo, path, commit, lang, content[, identifiers]) rows is applied as
  * per-microbatch delta upserts; rows with null/empty content are treated
  * as deletions (move/delete events).
  *
  * Exactly-once per snapshot: each microbatch becomes one delta generation,
  * so readers observe whole batches or nothing — strictly stronger than the
  * reference's eventual-consistency contract
  * (tantivy_index_manager.py:25-33, SURVEY.md W5).
  */
object FtsStream {

  /** foreachBatch handler, also usable directly in tests. Every
    * `foldEvery` accumulated delta generations the handler runs a tiered
    * [[FtsDeltas.fold]] so long-running streams keep O(1) generations
    * live (query-time unions stay flat; cost is delta-sized, never
    * index-sized). */
  def applyBatch(root: String, cfg: FtsIndexBuilder.Config,
                 foldEvery: Int = 16)
                (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.functions._
    val cached = batch.cache()
    try {
      val deletes = cached.where(col("content").isNull ||
        length(col("content")) === 0).select("repo", "path")
      val upserts = cached.where(col("content").isNotNull &&
        length(col("content")) > 0)
      if (!upserts.isEmpty) FtsDeltas.upsert(spark, upserts, root, cfg)
      if (!deletes.isEmpty) FtsDeltas.delete(spark, deletes, root)
    } finally cached.unpersist()
    if (foldEvery > 0 &&
        FtsDeltas.liveGenerations(spark, root).size >= foldEvery)
      FtsDeltas.fold(spark, root, cfg)
  }

  /** Attach the sink to a streaming DataFrame. */
  def writer(stream: DataFrame, root: String,
             cfg: FtsIndexBuilder.Config = FtsIndexBuilder.Config(),
             checkpointDir: Option[String] = None,
             foldEvery: Int = 16): DataStreamWriter[org.apache.spark.sql.Row] = {
    val w = stream.writeStream
      .outputMode("append")
      .trigger(Trigger.ProcessingTime("1 second"))
      .foreachBatch(applyBatch(root, cfg, foldEvery) _)
    checkpointDir.fold(w)(d => w.option("checkpointLocation", d))
  }

  def start(stream: DataFrame, root: String,
            cfg: FtsIndexBuilder.Config = FtsIndexBuilder.Config(),
            checkpointDir: Option[String] = None,
            foldEvery: Int = 16): StreamingQuery =
    writer(stream, root, cfg, checkpointDir, foldEvery).start()
}
