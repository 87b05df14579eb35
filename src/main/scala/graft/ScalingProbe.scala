package graft

import org.apache.spark.sql.SparkSession
import graft.index.FtsIndexBuilder

/** Scratch harness for isolating build-scaling behavior (not part of the
  * driver contract). args: cores shards segParts repl */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val Array(cores, shards, segParts, repl) = args.map(_.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._
    val base = graft.corpus.CodeCorpus
      .sourceFiles(spark, "/root/testdata/sf0.01").drop("doc_id")
    val corpus = spark.range(repl).repartition(repl)
      .select(col("id").cast("string").as("replica"))
      .join(broadcast(base))
      .select(concat(col("repo"), lit("_r"), col("replica")).as("repo"),
        concat(col("replica"), lit("/"), col("path")).as("path"),
        col("commit"), col("lang"), col("content"))
    // warmup
    val w = java.nio.file.Files.createTempDirectory("probe_w").toString
    FtsIndexBuilder.build(spark, corpus.limit(200), w,
      FtsIndexBuilder.Config(2, 4, shardGroups = 2))
    val root = java.nio.file.Files.createTempDirectory("probe").toString
    val t0 = System.nanoTime()
    val r = FtsIndexBuilder.build(spark, corpus, root,
      FtsIndexBuilder.Config(shards, segParts, shardGroups = 4))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"PROBE cores=$cores shards=$shards segParts=$segParts docs=${r.nDocs} sec=$sec%.2f fps=${r.nDocs / sec}%.1f")
    spark.stop()
  }
}
