package graft

import org.apache.spark.sql.SparkSession

/** One worker process of the scaling benchmark — forked by [[Bench]] with
  * `taskset` + `-XX:ActiveProcessorCount` so each worker JVM is a faithful
  * stand-in for one fixed-size executor (own heap, GC, allocator; only the
  * host's memory bus and disk are shared, as they would be within one
  * physical node of a real cluster).
  *
  * Modes:
  *   prep <cores> <sfDir> <repl> <outDir>           — materialize the input
  *   docs <cores> <sfDir> <repl> <root>             — shared docs stage
  *   shards <cores> <sfDir> <repl> <root> <lo> <hi> — build shards [lo,hi)
  *   finalize <cores> <sfDir> <repl> <root>         — dict/stats/commit
  *   full <cores> <sfDir> <repl> <root>             — everything
  *
  * SPARK_GRAFT_BENCH_INPUT names a pre-materialized shared input parquet
  * (written once by `prep`) so the untimed synthesis doesn't repeat in
  * every measurement fork.
  */
object BenchBuild {

  private val NShards = 32

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val cores = args(1).toInt
    val sfDir = args(2)
    val repl = args(3).toInt
    val root = args(4)
    // IDENTICAL logical plan at every parallelism level (same partition
    // counts, sized for the 4N config) — a cluster comparison varies only
    // the executor count, never the plan
    // shuffle/IO compression codec. zstd is the measured default: the
    // segments exchange is memory-bandwidth-bound, so zstd's better
    // ratio through the (tmpfs) shuffle outweighs its CPU cost —
    // segments-stage seconds dropped ~45% at n8 vs lz4 on this host
    // (round-4 experiments, BENCH/BASELINE.md §3); a production deploy
    // sets spark.io.compression.codec=zstd in spark-submit conf
    val codec = sys.env.getOrElse("GRAFT_BENCH_CODEC", "zstd")
    val bucketBlocks = sys.env.getOrElse("GRAFT_BENCH_BUCKET_BLOCKS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bb-$mode-$cores")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.io.compression.codec", codec)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.functions._

    def corpus(r: Int) = {
      val base = graft.corpus.CodeCorpus.sourceFiles(spark, sfDir)
        .drop("doc_id")
      spark.range(r).repartition(r)
        .select(col("id").cast("string").as("replica"))
        .join(broadcast(base))
        .select(concat(col("repo"), lit("_r"), col("replica")).as("repo"),
          concat(col("replica"), lit("/"), col("path")).as("path"),
          col("commit"), col("lang"), col("content"))
    }

    // 32 segment partitions at EVERY parallelism level (identical plan;
    // finer partitions keep the 8-core config's final wave balanced)
    def cfg = graft.index.FtsIndexBuilder.Config(nShards = NShards,
      segmentPartitions = 32, shardGroups = 1, bucketBlocks = bucketBlocks)

    /** The measured-build input table: a shared pre-materialized parquet
      * when it exists AND its stamp matches this run's (sfDir, repl) — a
      * stale env var from an earlier exploratory run must never feed the
      * wrong corpus into a measurement — else synthesized (untimed)
      * under `root`. */
    val inputStamp = s"$sfDir|$repl"
    def inputTable(root: String) = {
      val shared = sys.env.get("SPARK_GRAFT_BENCH_INPUT").filter { d =>
        new java.io.File(d, "_SUCCESS").exists() && {
          val st = new java.io.File(d, "_GRAFT_INPUT")
          st.exists() &&
            new String(java.nio.file.Files.readAllBytes(st.toPath),
              "UTF-8") == inputStamp
        }
      }
      val dir = shared.getOrElse {
        val d = s"$root/input.parquet"
        corpus(repl).write.mode("overwrite").parquet(d)
        d
      }
      spark.read.parquet(dir)
    }

    mode match {
      case "prep" =>
        corpus(repl).write.mode("overwrite").parquet(root)
        java.nio.file.Files.write(
          new java.io.File(root, "_GRAFT_INPUT").toPath,
          inputStamp.getBytes("UTF-8"))
        println(s"PREP dir=$root")
      case "docs" =>
        // small untimed warmup of the write path
        val wroot = java.nio.file.Files
          .createTempDirectory("graft_bb_wd").toString
        graft.index.FtsIndexBuilder.stageDocs(spark, corpus(1).limit(500),
          wroot, cfg)
        // untimed input materialization (see "full" mode)
        val input = inputTable(root)
        val t0 = System.nanoTime()
        val vDir = graft.index.FtsIndexBuilder
          .stageDocs(spark, input, root, cfg)
        println(s"DOCS vdir=$vDir sec=${(System.nanoTime() - t0) / 1e9}")
      case "shards" =>
        val lo = args(5).toInt
        val hi = args(6).toInt
        // untimed JIT warmup against a throwaway root
        val wroot = java.nio.file.Files
          .createTempDirectory("graft_bb_w").toString
        graft.index.FtsIndexBuilder.build(spark, corpus(1).limit(500), wroot,
          graft.index.FtsIndexBuilder.Config(nShards = 2,
            segmentPartitions = 4, shardGroups = 2))
        val vDir = s"$root/v1"
        val t0 = System.nanoTime()
        graft.index.FtsIndexBuilder
          .stageShards(spark, vDir, cfg, Some(lo until hi))
        println(s"SHARDS lo=$lo hi=$hi sec=${(System.nanoTime() - t0) / 1e9}")
      case "finalize" =>
        // untimed warmup of the scan/shuffle/write paths (executors are
        // long-lived in a real cluster; JIT/codegen is not the job)
        val wroot = java.nio.file.Files
          .createTempDirectory("graft_bb_wf").toString
        graft.index.FtsIndexBuilder.build(spark, corpus(1).limit(500), wroot,
          graft.index.FtsIndexBuilder.Config(nShards = 2,
            segmentPartitions = 4, shardGroups = 2))
        val vDir = s"$root/v1"
        val t0 = System.nanoTime()
        val n = graft.index.FtsIndexBuilder
          .stageFinalize(spark, root, vDir, cfg)
        println(s"FINAL docs=$n sec=${(System.nanoTime() - t0) / 1e9}")
      case "full" =>
        // untimed JIT/codegen warmup, like the staged modes (cluster
        // executors are long-lived; cold-JVM seconds are a constant that
        // would otherwise dominate the ratio at every data size)
        val wroot = java.nio.file.Files
          .createTempDirectory("graft_bb_wfull").toString
        graft.index.FtsIndexBuilder.build(spark, corpus(1).limit(500), wroot,
          graft.index.FtsIndexBuilder.Config(nShards = 2,
            segmentPartitions = 4, shardGroups = 2))
        // the input table is UNTIMED: the metric is indexing throughput
        // from an input table (BASELINE.json input_hint), not test-corpus
        // synthesis
        val input = inputTable(root)
        val t0 = System.nanoTime()
        val report = graft.index.FtsIndexBuilder.build(spark, input, root, cfg)
        val sec = (System.nanoTime() - t0) / 1e9
        println(s"BUILD cores=$cores docs=${report.nDocs} sec=$sec fps=${report.nDocs / sec}")
    }
    spark.stop()
  }
}
