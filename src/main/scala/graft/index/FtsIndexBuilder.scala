package graft.index

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.analysis.Tokenizer
import graft.index.FtsSchema._

/** Builds the on-disk inverted index (see [[FtsSchema]] for the layout).
  *
  * Build lifecycle (reference analog: SmartIndexer full build,
  * services/smart_indexer.py:589+, with ProgressiveMetadata resume,
  * services/progressive_metadata.py):
  *
  *  1. docs stage — assign stable docIds: shard = xxhash64(repo, path) mod
  *     nShards, docId = shard << 40 | row_number within shard ordered by
  *     (repo, path). Deterministic under any parallelism (the scaling
  *     evidence precondition). Written partitioned by shard.
  *  2. shard stage, per shard (the resumable checkpoint unit): tokenize all
  *     three fields -> postings with positions -> repartitionByRange on
  *     (field, term, doc_id) [range partitioning splits a skewed term's
  *     posting list across partitions by doc range — the salting analog
  *     required by the north rule, without a salt column] ->
  *     sortWithinPartitions -> streaming mapPartitions encoder emitting
  *     delta-gap + varint blocks with block-max metadata. A manifest row
  *     with lineage + token/byte metrics commits the shard.
  *  3. finalize — global dict (df/cf summed across shards, exactly-once
  *     because per-shard docs are disjoint), corpus stats, and an atomic
  *     `current` pointer swap (reference analog: tmp dir + os.rename,
  *     tantivy_index_manager.py:1037-1136).
  *
  * Resume: rerunning `build` on the same root skips shards whose manifest
  * row is `done` (anti-join of shard list vs manifest — W4 in SURVEY.md §2.5).
  */
object FtsIndexBuilder {

  final case class Config(
      nShards: Int = 4,
      segmentPartitions: Int = 32,
      blockSize: Int = 128,
      /** camelCase sub-token analyzers on the identifiers field; disable
        * for exact reference-fixture parity. */
      codeAnalyzers: Boolean = true,
      /** index the case-preserving content_raw field. */
      indexRawField: Boolean = true)

  final case class BuildReport(version: String, nDocs: Long,
                               shardsBuilt: Seq[Int], shardsSkipped: Seq[Int])

  private[graft] def fs(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Full (or resumed) index build from an ingest table with columns
    * (repo, path, commit, lang, content[, identifiers array<string>]). */
  def build(spark: SparkSession, source: DataFrame, root: String,
            cfg: Config = Config()): BuildReport = {
    import spark.implicits._
    val hfs = fs(spark, root)
    val version = resumableVersion(hfs, root)
    val vDir = s"$root/$version"

    // ---- stage 1: docs -------------------------------------------------
    val docsDir = s"$vDir/docs"
    if (!hfs.exists(new Path(docsDir, "_SUCCESS"))) {
      val withIds =
        if (source.columns.contains("identifiers")) source
        else source.withColumn("identifiers",
          lit(null).cast("array<string>"))
      val extractIds = udf((content: String) =>
        Tokenizer.identifiers(content))
      val identLen = udf((ids: Seq[String]) =>
        Tokenizer.identifierFieldTokens(ids, cfg.codeAnalyzers).size.toLong)
      val w = Window.partitionBy($"shard").orderBy($"repo", $"path")
      withIds
        .withColumn("shard",
          pmod(xxhash64($"repo", $"path"), lit(cfg.nShards)).cast("int"))
        .withColumn("doc_id",
          $"shard".cast("long") * lit(1L << 40) +
            (row_number().over(w) - 1))
        .withColumn("sha256", sha2($"content", 256))
        .withColumn("ids", coalesce($"identifiers", extractIds($"content")))
        .withColumn("dl", size(IndexBuilder.tokenArray($"content")).cast("long"))
        .withColumn("dl_ident", identLen($"ids"))
        .select("doc_id", "shard", "repo", "path", "commit", "lang",
          "sha256", "dl", "dl_ident", "ids", "content")
        .write.mode("overwrite").partitionBy("shard").parquet(docsDir)
    }
    val docs = spark.read.parquet(docsDir)
    val nDocs = docs.count()

    // ---- stage 2: per-shard segments (resumable) -----------------------
    val done = doneShards(spark, vDir)
    val (skipped, todo) = (0 until cfg.nShards).partition(done.contains)
    todo.foreach { s => buildShard(spark, docs, vDir, s, cfg) }

    // ---- stage 3: finalize ---------------------------------------------
    val dictShards = spark.read.parquet(s"$vDir/dict_shards/*")
    dictShards.groupBy("field", "term")
      .agg(sum("df").as("df"), sum("cf").as("cf"))
      .repartitionByRange(cfg.segmentPartitions / 2 max 1, $"field", $"term")
      .sortWithinPartitions("field", "term")
      .write.mode("overwrite").parquet(s"$vDir/dict")
    docs.agg(
      count(lit(1)).as("n_docs"),
      avg("dl").as("avgdl_content"),
      avg("dl").as("avgdl_raw"),
      avg("dl_ident").as("avgdl_ident"))
      .write.mode("overwrite").parquet(s"$vDir/stats")
    hfs.create(new Path(vDir, "BUILD_SUCCESS"), true).close()
    // atomic current-pointer swap
    val tmp = new Path(root, s"current.tmp.$version")
    val out = hfs.create(tmp, true)
    out.write(version.getBytes("UTF-8")); out.close()
    val cur = new Path(root, "current")
    if (hfs.exists(cur)) hfs.delete(cur, false)
    hfs.rename(tmp, cur)
    BuildReport(version, nDocs, todo, skipped)
  }

  /** One shard = one checkpointable unit of segment construction. */
  private def buildShard(spark: SparkSession, docs: DataFrame, vDir: String,
                         shard: Int, cfg: Config): Unit = {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val d = docs.where($"shard" === shard)
      .select($"doc_id", $"content", $"ids", $"dl", $"dl_ident")
      .as[(Long, String, Seq[String], Long, Long)]

    val indexRaw = cfg.indexRawField
    val codeAn = cfg.codeAnalyzers
    // (field, term, doc_id, dl, pos)
    val toks: Dataset[(String, String, Long, Long, Int)] = d.flatMap {
      case (id, content, ids, dl, dlIdent) =>
        val c = Tokenizer.tokenize(content).iterator.zipWithIndex
          .map { case (t, p) => (FieldContent, t, id, dl, p) }
        val r = if (indexRaw)
          Tokenizer.tokenizeRaw(content).iterator.zipWithIndex
            .map { case (t, p) => (FieldRaw, t, id, dl, p) }
        else Iterator.empty
        val i = Tokenizer.identifierFieldTokens(ids, codeAn).iterator
          .map { case (t, p) => (FieldIdent, t, id, dlIdent, p) }
        c ++ r ++ i
    }.toDF("field", "term", "doc_id", "dl", "pos")
      .as[(String, String, Long, Long, Int)]

    val postings = toks.toDF("field", "term", "doc_id", "dl", "pos")
      .groupBy("field", "term", "doc_id", "dl")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list($"pos")).as("positions"))

    val blockSize = cfg.blockSize
    val blocks = postings
      .repartitionByRange(cfg.segmentPartitions, $"field", $"term", $"doc_id")
      .sortWithinPartitions("field", "term", "doc_id")
      .select($"field", $"term", $"doc_id", $"dl", $"tf", $"positions")
      .as[(String, String, Long, Long, Long, Seq[Int])]
      .mapPartitions { it => encodePartition(it, shard, blockSize) }

    blocks.write.mode("overwrite").parquet(s"$vDir/segments/s$shard")

    // per-shard dictionary (df/cf) — summed globally at finalize
    postings.groupBy("field", "term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
      .write.mode("overwrite").parquet(s"$vDir/dict_shards/s$shard")

    // lineage + metrics manifest row (read back what was durably written)
    val seg = spark.read.parquet(s"$vDir/segments/s$shard")
    val m = seg.agg(
      count(lit(1)).as("n_blocks"),
      coalesce(sum("n"), lit(0L)).as("n_postings"),
      coalesce(sum(length($"doc_bytes") + length($"tf_bytes") +
        length($"dl_bytes") + length($"pos_bytes")), lit(0L)).as("bytes_postings"))
      .collect()(0)
    val dd = docs.where($"shard" === shard).agg(
      count(lit(1)).as("n_docs"),
      coalesce(sum("dl"), lit(0L)).as("n_tokens"),
      coalesce(sum(crc32($"sha256")), lit(0L)).as("input_sha"),
      coalesce(sum(length($"content")), lit(0L)).as("bytes_docs"))
      .collect()(0)
    val row = ManifestRow(shard, "done", dd.getLong(0), dd.getLong(1),
      m.getLong(1), m.getLong(0), dd.getLong(3), m.getLong(2),
      System.currentTimeMillis() - t0, dd.getLong(2).toString)
    spark.createDataset(Seq(row))
      .write.mode("overwrite").parquet(s"$vDir/manifest/s$shard")
  }

  /** Streaming block encoder over a (field, term, doc_id)-sorted iterator.
    * Memory is O(blockSize), independent of posting-list length — a term
    * with df = N (stopword-grade skew) streams through without buffering.
    */
  private[index] def encodePartition(
      it: Iterator[(String, String, Long, Long, Long, Seq[Int])],
      shard: Int, blockSize: Int): Iterator[SegmentBlock] =
    new Iterator[SegmentBlock] {
      private val buf = it.buffered
      private var pending: Option[SegmentBlock] = None

      override def hasNext: Boolean = pending.nonEmpty || buf.hasNext

      override def next(): SegmentBlock = pending match {
        case Some(b) => pending = None; b
        case None =>
          val (field, term, _, _, _, _) = buf.head
          val docIds = new scala.collection.mutable.ArrayBuffer[Long](blockSize)
          val tfs = new scala.collection.mutable.ArrayBuffer[Long](blockSize)
          val dls = new scala.collection.mutable.ArrayBuffer[Long](blockSize)
          val posOut = new java.io.ByteArrayOutputStream()
          var maxTf = 0L
          var minDl = Long.MaxValue
          while (buf.hasNext && buf.head._1 == field &&
                 buf.head._2 == term && docIds.length < blockSize) {
            val (_, _, doc, dl, tf, positions) = buf.next()
            docIds += doc; tfs += tf; dls += dl
            if (tf > maxTf) maxTf = tf
            if (dl < minDl) minDl = dl
            var prev = 0L
            var first = true
            positions.foreach { p =>
              if (first) { Codec.writeVarLong(posOut, p.toLong); first = false }
              else Codec.writeVarLong(posOut, p.toLong - prev)
              prev = p.toLong
            }
          }
          SegmentBlock(shard, field, term, docIds.head, docIds.last,
            docIds.length,
            Codec.encodeDeltas(docIds.toArray),
            Codec.encodeVarints(tfs.toArray),
            Codec.encodeVarints(dls.toArray),
            posOut.toByteArray, maxTf, minDl)
      }
    }

  private def doneShards(spark: SparkSession, vDir: String): Set[Int] = {
    val hfs = fs(spark, vDir)
    if (!hfs.exists(new Path(s"$vDir/manifest"))) return Set.empty
    import spark.implicits._
    spark.read.parquet(s"$vDir/manifest/*")
      .where($"status" === "done").select("shard")
      .as[Int].collect().toSet
  }

  /** Pick the version dir to (re)build: an unfinished one if present,
    * else the next fresh one. */
  private def resumableVersion(hfs: FileSystem, root: String): String = {
    val rootPath = new Path(root)
    if (!hfs.exists(rootPath)) hfs.mkdirs(rootPath)
    val versions = hfs.listStatus(rootPath).toSeq
      .map(_.getPath.getName).filter(_.matches("v\\d+"))
      .map(_.drop(1).toInt).sorted
    val unfinished = versions.reverse.find { v =>
      !hfs.exists(new Path(s"$root/v$v/BUILD_SUCCESS"))
    }
    unfinished.map(v => s"v$v")
      .getOrElse(s"v${versions.lastOption.getOrElse(0) + 1}")
  }

  /** Read the live version dir from the `current` pointer. */
  def currentVersionDir(spark: SparkSession, root: String): String = {
    val hfs = fs(spark, root)
    val in = hfs.open(new Path(root, "current"))
    val v = new String(
      org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim
    in.close()
    s"$root/$v"
  }
}
