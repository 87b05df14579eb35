package graft

import org.apache.spark.sql.SparkSession

/** Scratch harness: dump formatted physical plans of the hot paths so scan
  * pruning / broadcast / codegen can be inspected (not driver contract). */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    val root = java.nio.file.Files.createTempDirectory("explain").toString
    val corpus = graft.corpus.CodeCorpus
      .sourceFiles(spark, "/root/testdata/sf0.001").drop("doc_id")
    graft.index.FtsIndexBuilder.build(spark, corpus, root,
      graft.index.FtsIndexBuilder.Config(nShards = 4, segmentPartitions = 4))
    val idx = new graft.query.FtsIndex(spark, root)

    println("==== segment scan with term predicate ====")
    idx.segments.where(col("field") === "content" &&
      col("term").isin("merge", "sort")).explain("formatted")

    println("==== full search plan ====")
    idx.search(graft.query.FtsQuery("merge sort", limit = 10))
      .explain("formatted")

    println("==== ANN brute-force plan ====")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    graft.ops.Ann.bruteForceTopK(emb, 5, 5).explain("formatted")

    println("==== corpus-derived BM25 (declarative path) ====")
    val toks = graft.index.IndexBuilder.tokens(
      graft.corpus.CodeCorpus.sourceFiles(spark, "/root/testdata/sf0.001"))
    graft.index.IndexBuilder.searchAnd(
      graft.index.IndexBuilder.postings(toks),
      graft.index.IndexBuilder.docLens(toks), Seq("merge"), 10)
      .explain("formatted")
    spark.stop()
  }
}
