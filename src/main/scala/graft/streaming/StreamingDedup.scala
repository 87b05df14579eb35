package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming exact-dedup: keep only the FIRST occurrence of each
  * content hash across the whole stream — the training-data firehose
  * deduped before ingestion (the streaming counterpart of
  * [[graft.ops.Dedup.exact]], which is the batch/backfill form).
  *
  * State model: `flatMapGroupsWithState` keyed by the content hash; the
  * state per key is the doc_id that claimed it. Within one microbatch the
  * lowest doc_id wins (deterministic under any partitioning); across
  * microbatches the earlier batch wins. Emitted rows are exactly the
  * survivors — duplicates are dropped, not marked.
  *
  * Scale: state is one (hash, id) entry per DISTINCT document, sharded by
  * the hash across executors by Structured Streaming's state store. At
  * 10^12-doc scale a deployment backs this with the RocksDB state store
  * (`spark.sql.streaming.stateStore.providerClass`) and, when the dedup
  * window may be bounded, a processing-time `ttl` here so state ages out
  * instead of growing forever.
  */
object StreamingDedup {

  final case class Seen(doc_id: Long)
  final case class Survivor(doc_id: Long, h: String, text: String)

  /** Attach to a streaming (or batch) DataFrame with (doc_id, text)
    * columns; emits the first-seen row per md5(text). `ttl` bounds state
    * lifetime (None = exact dedup over the whole stream). */
  def firstSeen(stream: DataFrame,
                ttl: Option[java.time.Duration] = None): Dataset[Survivor] = {
    val spark = stream.sparkSession
    import spark.implicits._
    val keyed = stream
      .select(col("doc_id").cast("long"), md5(col("text")).as("h"),
        col("text"))
      .as[(Long, String, String)]
      .groupByKey(_._2)
    val timeout =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed.flatMapGroupsWithState[Seen, Survivor](
      OutputMode.Append, timeout) {
      (h: String, rows: Iterator[(Long, String, String)],
       state: GroupState[Seen]) =>
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else if (state.exists) {
          // duplicate of a past batch. Spark clears the timeout on every
          // invocation of the function for a key — re-arm it, making the
          // TTL a sliding inactivity window (without this, any key that
          // ever sees a duplicate would keep its state forever)
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          Iterator.empty
        }
        else {
          // lowest doc_id in this batch claims the hash (deterministic
          // under any partitioning/arrival order within the batch)
          val first = rows.minBy(_._1)
          state.update(Seen(first._1))
          ttl.foreach(d => state.setTimeoutDuration(d.toMillis))
          Iterator.single(Survivor(first._1, h, first._3))
        }
    }
  }
}
