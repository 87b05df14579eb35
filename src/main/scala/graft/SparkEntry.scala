package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.CodeCorpus
import graft.index.{FtsIndexBuilder, IndexBuilder}
import graft.query.{FtsIndex, FtsQuery}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every stage of the FTS engine is exposed as a named DataFrame query over
  * the deterministic corpus derived from `documents.parquet`, with a DuckDB
  * oracle SQL twin in [[oracleSql]] (the driver runs both at sf0.01 and
  * compares row/schema/hash).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: AND-of-terms BM25 top-10
    * ("merge sort") over the derived source-code corpus. */
  def entry(spark: SparkSession): DataFrame =
    Queries.bm25And(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "fts_corpus" -> Queries.corpus,
    "fts_tokens" -> Queries.tokens,
    "fts_postings" -> Queries.postings,
    "fts_term_stats" -> Queries.termStats,
    "fts_doclen" -> Queries.docLen,
    "fts_corpus_stats" -> Queries.corpusStats,
    "fts_ident_tokens" -> Queries.identTokens,
    "fts_bm25_single" -> Queries.bm25Single,
    "fts_bm25_and" -> Queries.bm25And,
    "fts_bm25_lang" -> Queries.bm25Lang,
    "fts_regex_terms" -> Queries.regexTerms,
    "fts_fuzzy_terms" -> Queries.fuzzyTerms,
    "fts_engine_single" -> Queries.engineSingle,
    "fts_engine_and" -> Queries.engineAnd,
    "fts_engine_wand" -> Queries.engineWand,
  ) ++ graft.ops.OpsQueries.all ++ graft.sources.DiscoveryQueries.all

  def oracleSql: Map[String, String] =
    OracleQueries.all ++ graft.ops.OpsOracle.all ++
      graft.sources.DiscoveryQueries.oracle
}

/** The Spark side of each verified query. Each function takes the
  * scale-factor dir holding the driver-generated parquet tables. */
object Queries {

  private def corpusDf(s: SparkSession, dir: String): DataFrame =
    CodeCorpus.sourceFiles(s, dir)

  val corpus: (SparkSession, String) => DataFrame = (s, dir) =>
    corpusDf(s, dir).withColumn("sha256", sha2(col("content"), 256))

  val tokens: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.tokens(corpusDf(s, dir))

  val postings: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.postings(IndexBuilder.tokens(corpusDf(s, dir)))

  val termStats: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.termStats(
      IndexBuilder.postings(IndexBuilder.tokens(corpusDf(s, dir))))

  val docLen: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.docLens(IndexBuilder.tokens(corpusDf(s, dir)))

  val corpusStats: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.corpusStats(
      IndexBuilder.docLens(IndexBuilder.tokens(corpusDf(s, dir))))
      .select(col("n_docs"), round(col("avgdl"), 6).as("avgdl"))

  val identTokens: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.identifierTokens(corpusDf(s, dir))

  private def search(s: SparkSession, dir: String, terms: Seq[String],
                     k: Int): DataFrame = {
    val toks = IndexBuilder.tokens(corpusDf(s, dir))
    IndexBuilder.searchAnd(
      IndexBuilder.postings(toks), IndexBuilder.docLens(toks), terms, k)
  }

  val bm25Single: (SparkSession, String) => DataFrame = (s, dir) =>
    search(s, dir, Seq("merge"), 10)

  val bm25And: (SparkSession, String) => DataFrame = (s, dir) =>
    search(s, dir, Seq("merge", "sort"), 10)

  /** Language-filtered search: filter composes BEFORE top-k (the reference
    * overfetches 3x then post-filters; filter-then-topk preserves its
    * semantics without the recall loss — SURVEY.md §4). */
  val bm25Lang: (SparkSession, String) => DataFrame = (s, dir) => {
    val c = corpusDf(s, dir)
    val toks = IndexBuilder.tokens(c)
    val scoredAll = IndexBuilder.searchAnd(
      IndexBuilder.postings(toks), IndexBuilder.docLens(toks),
      Seq("merge"), Int.MaxValue)
    scoredAll.join(c.select("doc_id", "lang"), "doc_id")
      .where(col("lang").isin("py", "js"))
      .orderBy(desc("score"), asc("doc_id"))
      .limit(10)
      .select("doc_id", "lang", "score")
  }

  /** Regex query expansion over the term dictionary (token-level DFA in the
    * reference; full-match semantics). */
  val regexTerms: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.termStats(
      IndexBuilder.postings(IndexBuilder.tokens(corpusDf(s, dir))))
      .where(col("term").rlike("^(?:mer.*)$"))
      .select("term")

  /** Fuzzy query expansion: terms within edit distance 1 of "mergs". */
  val fuzzyTerms: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.termStats(
      IndexBuilder.postings(IndexBuilder.tokens(corpusDf(s, dir))))
      .where(levenshtein(col("term"), lit("mergs")) <= 1)
      .select("term")

  // ---- segment-engine-backed queries (DuckDB-verified end to end) -------

  /** Build (once per sfDir+JVM) a content-field-only on-disk index over the
    * derived corpus, so engine BM25 scores are directly comparable to the
    * pure-SQL oracle. identifiers are forced empty and content_raw off. */
  private val engineCache =
    new java.util.concurrent.ConcurrentHashMap[String, FtsIndex]()

  private def engineIndex(s: SparkSession, dir: String): FtsIndex =
    engineCache.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_fts_verify").toString
      val corpus = corpusDf(s, dir)
        .withColumn("identifiers",
          array().cast("array<string>"))
      FtsIndexBuilder.build(s, corpus, root,
        FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 8,
          codeAnalyzers = false, indexRawField = false))
      new FtsIndex(s, root).warm()
    })

  /** Engine result -> (doc_id from path, rounded score) for hash compare. */
  private def engineTopK(s: SparkSession, dir: String,
                         text: String): DataFrame = {
    engineIndex(s, dir).search(FtsQuery(text, snippetLines = 0, limit = 10))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))
  }

  val engineSingle: (SparkSession, String) => DataFrame = (s, dir) =>
    engineTopK(s, dir, "merge")

  val engineAnd: (SparkSession, String) => DataFrame = (s, dir) =>
    engineTopK(s, dir, "merge sort")

  /** Same query through the block-max WAND scorer — the pruned path must
    * be DuckDB-identical to the exhaustive SQL. */
  val engineWand: (SparkSession, String) => DataFrame = (s, dir) => {
    import s.implicits._
    engineIndex(s, dir).searchWand("merge sort", 10)
      .map(r => (r.path, r.score)).toDF("path", "score")
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))
  }
}

/** DuckDB twins of every query in [[Queries]], built over the same
  * `documents` parquet table via shared CTEs. */
object OracleQueries {

  private val base: String =
    s"""WITH ${CodeCorpus.corpusCteSql},
       |tokens AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(lower(content), '[^\\p{L}\\p{N}]+'),
       |    x -> x <> '' AND length(x) <= 40)) AS term
       |  FROM corpus
       |),
       |postings AS (
       |  SELECT term, doc_id, count(*) AS tf FROM tokens GROUP BY 1, 2
       |),
       |doclen AS (
       |  SELECT doc_id, count(*) AS dl FROM tokens GROUP BY 1
       |),
       |stats AS (
       |  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen
       |)""".stripMargin

  private def bm25TopK(termsSqlList: String, nTerms: Int, k: Int): String =
    s"""$base
       |SELECT doc_id, round(score, 4) AS score FROM (
       |  SELECT p.doc_id,
       |    sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score,
       |    count(*) AS nmatch
       |  FROM postings p
       |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
       |  JOIN doclen l USING (doc_id)
       |  CROSS JOIN stats s
       |  WHERE p.term IN ($termsSqlList)
       |  GROUP BY 1
       |) WHERE nmatch = $nTerms
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin

  val all: Map[String, String] = Map(
    "fts_corpus" ->
      s"""$base
         |SELECT doc_id, repo, path, "commit", lang, content,
         |       sha256(content) AS sha256
         |FROM corpus""".stripMargin,

    "fts_tokens" -> s"$base\nSELECT doc_id, term FROM tokens",

    "fts_postings" -> s"$base\nSELECT term, doc_id, tf FROM postings",

    "fts_term_stats" ->
      s"""$base
         |SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS cf
         |FROM postings GROUP BY 1""".stripMargin,

    "fts_doclen" -> s"$base\nSELECT doc_id, dl FROM doclen",

    "fts_corpus_stats" ->
      s"$base\nSELECT n_docs, round(avgdl, 6) AS avgdl FROM stats",

    "fts_ident_tokens" ->
      s"""WITH ${CodeCorpus.corpusCteSql}
         |SELECT DISTINCT doc_id, term FROM (
         |  SELECT doc_id, unnest(list_filter(
         |    list_concat([lower(id)],
         |      regexp_split_to_array(lower(
         |        regexp_replace(regexp_replace(id,
         |          '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
         |          '([A-Z])([A-Z][a-z])', '\\1 \\2', 'g')),
         |        '[_ ]+')),
         |    x -> x <> '' AND length(x) <= 40)) AS term
         |  FROM (
         |    SELECT doc_id,
         |           unnest(regexp_extract_all(content, '[a-zA-Z_][a-zA-Z0-9_]*')) AS id
         |    FROM corpus
         |  )
         |)""".stripMargin,

    "fts_bm25_single" -> bm25TopK("'merge'", 1, 10),

    "fts_bm25_and" -> bm25TopK("'merge', 'sort'", 2, 10),

    "fts_bm25_lang" ->
      s"""$base
         |SELECT sc.doc_id, c.lang, round(sc.score, 4) AS score FROM (
         |  SELECT p.doc_id,
         |    sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
         |  FROM postings p
         |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
         |  JOIN doclen l USING (doc_id)
         |  CROSS JOIN stats s
         |  WHERE p.term IN ('merge')
         |  GROUP BY 1
         |) sc JOIN corpus c USING (doc_id)
         |WHERE c.lang IN ('py', 'js')
         |ORDER BY sc.score DESC, sc.doc_id
         |LIMIT 10""".stripMargin,

    "fts_regex_terms" ->
      s"""$base
         |SELECT term FROM (SELECT term FROM postings GROUP BY 1)
         |WHERE regexp_full_match(term, 'mer.*')""".stripMargin,

    "fts_fuzzy_terms" ->
      s"""$base
         |SELECT term FROM (SELECT term FROM postings GROUP BY 1)
         |WHERE levenshtein(term, 'mergs') <= 1""".stripMargin,

    // the on-disk segment engine must reproduce the pure-SQL BM25 exactly
    "fts_engine_single" -> bm25TopK("'merge'", 1, 10),
    "fts_engine_and" -> bm25TopK("'merge', 'sort'", 2, 10),
    "fts_engine_wand" -> bm25TopK("'merge', 'sort'", 2, 10),
  )
}
