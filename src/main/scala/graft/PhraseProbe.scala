package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.FtsIndexBuilder
import graft.query.{FtsIndex, FtsQuery, FtsQueryCache}

/** Temporary diagnostic: where does hot warm-cache phrase time go at the
  * bench's query scale? */
object PhraseProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("phrase-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val root = java.nio.file.Files.createTempDirectory("phrase_probe").toString
    FtsIndexBuilder.build(spark,
      CodeCorpus.sourceFiles(spark, sfDir).drop("doc_id"), root,
      FtsIndexBuilder.Config(nShards = 8, segmentPartitions = 16))
    val idx = new FtsIndex(spark, root).warm()
    val cache = new FtsQueryCache(idx)
    val q = FtsQuery("import_os", limit = 10)
    cache.search(q) // cold load
    // hot reps (enough to pass JIT warmup; report median + min)
    val ts = (0 until 25).map { _ =>
      val t0 = System.nanoTime()
      cache.search(q)
      (System.nanoTime() - t0) / 1e6
    }.sorted
    println(f"hot phrase: median ${ts(ts.size / 2)}%.2f ms, " +
      f"min ${ts.head}%.2f ms, max ${ts.last}%.2f ms")
    // how many docs align?
    val docs = idx.effectiveDocs.count()
    println(s"corpus docs: $docs")
    val full = cache.search(q.copy(limit = 0))
    println(s"full phrase match count: ${full.size}")
    spark.stop()
  }
}
