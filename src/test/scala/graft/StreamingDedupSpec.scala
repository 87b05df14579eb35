package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingDedup

/** Stateful streaming dedup: first-seen-wins across microbatches via
  * flatMapGroupsWithState. */
class StreamingDedupSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("first occurrence per content hash survives; later microbatch " +
       "duplicates are dropped by keyed state") {
    val sp = spark
    import sp.implicits._
    implicit val sql = sp.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val out = StreamingDedup.firstSeen(
      source.toDF().toDF("doc_id", "text"))
    val query = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode("append")
      .start()
    try {
      // batch 1: an in-batch duplicate (ids 7 and 3 share text; 3 wins)
      source.addData((7L, "alpha beta"), (3L, "alpha beta"), (10L, "gamma"))
      query.processAllAvailable()
      // batch 2: a cross-batch duplicate (id 1 repeats "gamma") plus a
      // fresh doc
      source.addData((1L, "gamma"), (20L, "delta"))
      query.processAllAvailable()
      val got = sp.table("dedup_out")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got === Set((3L, "alpha beta"), (10L, "gamma"), (20L, "delta")))
    } finally query.stop()
  }

  test("batch-mode parity with Dedup.exact keepers on the documents table") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    // batch execution of the same operator: every hash keeps its lowest id
    val survivors = StreamingDedup.firstSeen(docs)
      .collect().map(_.doc_id).toSet
    val keepers = graft.ops.Dedup.exact(docs)
      .where(org.apache.spark.sql.functions.col("doc_id") ===
        org.apache.spark.sql.functions.col("keeper"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(survivors === keepers)
  }
}
