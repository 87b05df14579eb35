package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.CodeCorpus
import graft.index.FtsIndexBuilder
import graft.query.{FtsIndex, FtsQuery, FtsQueryCache}

/** Round-6 optimization probe (guide §1: measure first; NOT part of the
  * driver contract — the frozen [[Bench]] stays the judged harness).
  *
  * Modes (args(0)):
  *   - `queries <sfDir> <outDir>`: build the same query index the bench
  *     builds (8 shards, 16 segment partitions over the raw sf corpus),
  *     then per query shape: 7 timed reps of the exhaustive / WAND /
  *     cached paths (median printed), plus `.explain("formatted")` dumps
  *     for the plans the round touches, written under <outDir>.
  *   - `ann <sfDir>`: IVF serving-path timings (topK / topKWarm).
  *   - `build <sfDir> <repl> <n> [variantLabel]`: one full timed build at
  *     local[n] with per-stage [timing] lines — the quick A/B loop for
  *     build-stage changes (the judged numbers come from the frozen
  *     Bench's pinned forks; this is directional only).
  */
object BenchExtra {

  private def timeS[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

  def main(args: Array[String]): Unit = {
    val mode = args(0)
    val sfDir = args(1)
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-extra-$mode")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    mode match {
      case "queries" =>
        val outDir = args(2)
        new java.io.File(outDir).mkdirs()
        val root = java.nio.file.Files
          .createTempDirectory("graft_bextra_q").toString
        FtsIndexBuilder.build(spark,
          CodeCorpus.sourceFiles(spark, sfDir).drop("doc_id"), root,
          FtsIndexBuilder.Config(nShards = 8, segmentPartitions = 16))
        val idx = new FtsIndex(spark, root).warm()
        val querySet = Seq("merge", "sort table", "import",
          "merge sort scan", "getusername", "handler", "stream batch")
        // warmup
        idx.searchCollected(FtsQuery("merge"))
        idx.searchWand("merge", 10)

        def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
          val w = new java.io.PrintWriter(s"$outDir/$name.txt")
          try {
            // queryExecution.explainString mirrors explain("formatted")
            w.println(df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted")))
          } finally w.close()
        }
        dump("q_exhaustive_single",
          idx.search(FtsQuery("merge", limit = 10)).toDF())
        dump("q_exhaustive_and",
          idx.search(FtsQuery("merge sort", limit = 10)).toDF())
        dump("q_exhaustive_lang",
          idx.search(FtsQuery("merge", limit = 10,
            languages = Seq("py", "js"))).toDF())

        querySet.foreach { q =>
          val ex = (0 until 7).map(_ =>
            timeS(idx.searchCollected(FtsQuery(q, limit = 10))))
          val wd = (0 until 7).map(_ => timeS(idx.searchWand(q, 10)))
          println(f"[extra] q=$q%-16s exhaustive=${med(ex)}%.4f " +
            f"wand=${med(wd)}%.4f (raw ex: ${ex.map(x => f"$x%.3f").mkString(",")})")
        }
        val cache = new FtsQueryCache(idx)
        querySet.foreach(q => cache.search(FtsQuery(q, limit = 10)))
        querySet.foreach { q =>
          val c = (0 until 7).map(_ =>
            timeS(cache.search(FtsQuery(q, limit = 10))))
          println(f"[extra] q=$q%-16s cached=${med(c)}%.6f")
        }

      case "plancost" =>
        // split a warm exhaustive query's cost into Catalyst
        // analysis+planning vs job execution
        val root = java.nio.file.Files
          .createTempDirectory("graft_bextra_pc").toString
        FtsIndexBuilder.build(spark,
          CodeCorpus.sourceFiles(spark, sfDir).drop("doc_id"), root,
          FtsIndexBuilder.Config(nShards = 8, segmentPartitions = 16))
        val idx = new FtsIndex(spark, root).warm()
        idx.searchCollected(FtsQuery("merge")) // warm codegen
        (0 until 3).foreach { _ =>
          Seq("merge", "merge sort scan").foreach { q =>
            var df: org.apache.spark.sql.DataFrame = null
            val tBuild = timeS { df = idx.search(FtsQuery(q, limit = 10)).toDF() }
            val tPlan = timeS { df.queryExecution.executedPlan }
            val tExec = timeS { df.collect() }
            println(f"[extra] plancost q=$q%-16s build=$tBuild%.4f " +
              f"plan=$tPlan%.4f exec=$tExec%.4f")
          }
        }

      case "ann" =>
        import org.apache.spark.sql.functions.col
        val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val ann = new graft.ops.AnnIndex(emb, nCells = 64, nProbe = 8)
        val qvs = emb.where(col("vec_id") < 5).select("embedding")
          .collect().map(_.getSeq[Float](0).toArray)
        qvs.foreach(ann.topK(_, 10)) // warm codegen/plan caches
        val ts = (0 until 5).flatMap(_ => qvs.map(qv =>
          timeS(ann.topK(qv, 10))))
        qvs.foreach(ann.topKWarm(_, 10))
        val tw = (0 until 5).flatMap(_ => qvs.map(qv =>
          timeS(ann.topKWarm(qv, 10))))
        println(f"[extra] ann topK p50=${med(ts)}%.4f warm p50=${med(tw)}%.6f")
        ann.close()

      case "build" =>
        // directional in-process build timing (stage lines via
        // GRAFT_BUILD_TIMING) — run under `taskset -c 0-(n-1)` for
        // anything worth quoting
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler
                  .SparkListenerStageCompleted): Unit = {
              val i = sc.stageInfo
              val m = i.taskMetrics
              println(f"[stage] id=${i.stageId}%3d tasks=${i.numTasks}%3d " +
                f"run=${m.executorRunTime / 1e3}%7.1fs " +
                f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
                f"gc=${m.jvmGCTime / 1e3}%5.1fs " +
                f"shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
                f"shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
                f"in=${m.inputMetrics.bytesRead / 1e6}%7.1fMB " +
                f"out=${m.outputMetrics.bytesWritten / 1e6}%7.1fMB " +
                f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB " +
                s"${i.name.takeWhile(_ != '\n').take(60)}")
            }
          })
        val repl = args(2).toInt
        val label = if (args.length > 4) args(4) else "head"
        import org.apache.spark.sql.functions._
        val base = CodeCorpus.sourceFiles(spark, sfDir).drop("doc_id")
        val corpus = spark.range(repl).repartition(repl)
          .select(col("id").cast("string").as("replica"))
          .join(broadcast(base))
          .select(concat(col("repo"), lit("_r"), col("replica")).as("repo"),
            concat(col("replica"), lit("/"), col("path")).as("path"),
            col("commit"), col("lang"), col("content"))
        val inDir = java.nio.file.Files
          .createTempDirectory("graft_bextra_in").toString
        corpus.write.mode("overwrite").parquet(s"$inDir/input.parquet")
        val input = spark.read.parquet(s"$inDir/input.parquet")
        val root = java.nio.file.Files
          .createTempDirectory("graft_bextra_b").toString
        // small warmup
        FtsIndexBuilder.build(spark, base.limit(500),
          java.nio.file.Files.createTempDirectory("graft_bextra_w").toString,
          FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4,
            shardGroups = 2))
        val t0 = System.nanoTime()
        val rep = FtsIndexBuilder.build(spark, input, root,
          FtsIndexBuilder.Config(nShards = 32, segmentPartitions = 32,
            shardGroups = 1))
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[extra] build variant=$label docs=${rep.nDocs} " +
          f"sec=$sec%.2f fps=${rep.nDocs / sec}%.0f")
    }
    spark.stop()
  }
}
