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
    "fts_ident_ngrams" -> Queries.identNgrams,
    "fts_bm25_single" -> Queries.bm25Single,
    "fts_bm25_and" -> Queries.bm25And,
    "fts_bm25_lang" -> Queries.bm25Lang,
    "fts_regex_terms" -> Queries.regexTerms,
    "fts_fuzzy_terms" -> Queries.fuzzyTerms,
    "fts_engine_single" -> Queries.engineSingle,
    "fts_engine_and" -> Queries.engineAnd,
    "fts_engine_wand" -> Queries.engineWand,
    "fts_engine_lang" -> Queries.engineLang,
    "fts_engine_limit0" -> Queries.engineLimit0,
    "fts_engine_prod_single" -> Queries.engineProdSingle,
    "fts_engine_prod_phrase" -> Queries.engineProdPhrase,
    "fts_engine_fuzzy" -> Queries.engineFuzzy,
    "fts_engine_regex" -> Queries.engineRegex,
    "fts_engine_qnorm" -> Queries.engineQnorm,
    "t5_chunks" -> Queries.semanticChunks,
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

  val identNgrams: (SparkSession, String) => DataFrame = (s, dir) =>
    IndexBuilder.identifierNgramStats(corpusDf(s, dir))

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

  /** Semantic chunker (SURVEY T5) packing stage over the corpus: greedy
    * line packing with line tracking, chunk_size 150 so multi-chunk docs
    * and single-line-oversized chunks both occur. The merge/drop filter
    * stages are ScalaTest-verified (SemanticChunkerSpec). */
  val semanticChunks: (SparkSession, String) => DataFrame = (s, dir) =>
    graft.sources.SemanticChunker.packingStage(corpusDf(s, dir), "content", 150)

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

  /** Language-filtered search through the ENGINE (exercises the
    * metadata-shuffle-join + filter-before-top-k branch end to end). */
  val engineLang: (SparkSession, String) => DataFrame = (s, dir) =>
    engineIndex(s, dir)
      .search(FtsQuery("merge", snippetLines = 0, limit = 10,
        languages = Seq("py", "js")))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        col("language").as("lang"),
        round(col("score"), 4).as("score"))

  val engineAnd: (SparkSession, String) => DataFrame = (s, dir) =>
    engineTopK(s, dir, "merge sort")

  /** limit=0 semantics through the engine: "unlimited" = 100000 cap,
    * snippets forced off — the FULL matching set must equal SQL's. */
  val engineLimit0: (SparkSession, String) => DataFrame = (s, dir) =>
    engineIndex(s, dir).search(FtsQuery("merge", limit = 0))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))

  // ---- PRODUCTION-config engine (identifiers extracted from content,
  // codeAnalyzers on, content_raw indexed) — the config a real deployment
  // runs, now DuckDB-verified end to end (round-1 verdict gap #4) --------

  private val engineProdCache =
    new java.util.concurrent.ConcurrentHashMap[String, FtsIndex]()

  private def engineProdIndex(s: SparkSession, dir: String): FtsIndex =
    engineProdCache.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_fts_verify_prod").toString
      // NO identifiers column: stageDocs extracts them from content, the
      // identifiers field gets camel/snake sub-tokens (codeAnalyzers)
      FtsIndexBuilder.build(s, corpusDf(s, dir), root,
        FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 8))
      new FtsIndex(s, root).warm()
    })

  private def engineProdTopK(s: SparkSession, dir: String,
                             text: String): DataFrame = {
    engineProdIndex(s, dir)
      .search(FtsQuery(text, snippetLines = 0, limit = 10))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))
  }

  /** Single term scored over content + identifiers fields (OR across
    * fields, scores summed). */
  val engineProdSingle: (SparkSession, String) => DataFrame = (s, dir) =>
    engineProdTopK(s, dir, "merge")

  /** A word that tokenizes to several tokens becomes a positional phrase
    * on both fields ("import_os" -> ["import","os"]) — exercises the
    * position lists end to end. */
  val engineProdPhrase: (SparkSession, String) => DataFrame = (s, dir) =>
    engineProdTopK(s, dir, "import_os")

  /** Fuzzy query END TO END through the engine: "42" at damerau distance 1
    * expands over the dictionary (multi-term: the numeric tokens) into an
    * OR-of-terms node whose per-doc score sums every matched term's BM25 —
    * verified against DuckDB's damerau_levenshtein expansion. */
  val engineFuzzy: (SparkSession, String) => DataFrame = (s, dir) =>
    engineIndex(s, dir)
      .search(FtsQuery("42", editDistance = 1, snippetLines = 0, limit = 10))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))

  /** Regex query end to end: token-level full-match expansion over the
    * dictionary ((mer|sor).* -> {merge, sort}), OR-of-terms scoring. */
  val engineRegex: (SparkSession, String) => DataFrame = (s, dir) =>
    engineIndex(s, dir)
      .search(FtsQuery("(mer|sor).*", useRegex = true, snippetLines = 0,
        limit = 10))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))

  /** QUANTIZED-NORM engine (round-5): the same content-only config with
    * Config.quantizeNorms on — every posting's dl is round-tripped
    * through the Lucene-SmallFloat 1-byte code at build time (the
    * Tantivy 1-byte-fieldnorm regime, SURVEY §7.3 risk 1). The oracle
    * twin reproduces the quantizer in SQL (exact below 32, then 4
    * significant bits), pinning quantized BM25 end to end. */
  private val engineQnormCache =
    new java.util.concurrent.ConcurrentHashMap[String, FtsIndex]()

  private def engineQnormIndex(s: SparkSession, dir: String): FtsIndex =
    engineQnormCache.computeIfAbsent(dir, { _ =>
      val root = java.nio.file.Files
        .createTempDirectory("graft_fts_verify_qnorm").toString
      val corpus = corpusDf(s, dir)
        .withColumn("identifiers", array().cast("array<string>"))
      FtsIndexBuilder.build(s, corpus, root,
        FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 8,
          codeAnalyzers = false, indexRawField = false,
          quantizeNorms = true))
      new FtsIndex(s, root).warm()
    })

  val engineQnorm: (SparkSession, String) => DataFrame = (s, dir) =>
    engineQnormIndex(s, dir)
      .search(FtsQuery("merge", snippetLines = 0, limit = 10))
      .select(
        regexp_extract(col("path"), "file_(\\d+)\\.", 1)
          .cast("long").as("doc_id"),
        round(col("score"), 4).as("score"))

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

  /** OR-of-expanded-terms BM25 (single query node): per-doc sum over every
    * dictionary term selected by `termPred` — the oracle twin of fuzzy and
    * regex expansion. */
  private def expandedOrTopK(termPred: String, k: Int): String =
    s"""$base
       |SELECT doc_id, round(score, 4) AS score FROM (
       |  SELECT p.doc_id,
       |    sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
       |  FROM postings p
       |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
       |  JOIN doclen l USING (doc_id)
       |  CROSS JOIN stats s
       |  WHERE $termPred
       |  GROUP BY 1
       |)
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin

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

  /** BM25 over QUANTIZED doc lengths — the SQL twin of
    * [[graft.index.Fieldnorm.quantize]]: exact below 32 (24 free values +
    * the 3-bit-exact range), then 4 significant bits
    * (v = dl - 24; shift = floor(log2 v) - 3; 24 + ((v>>shift & 7 | 8)
    * << shift)). avgdl stays EXACT (the engine derives it from token
    * totals, which quantization does not touch); only the per-posting dl
    * is quantized — the same asymmetry as Lucene/Tantivy. The shift is
    * clamped so the unused CASE branch is total under eager vectorized
    * evaluation. */
  private def qnormTopK(termsSqlList: String, nTerms: Int, k: Int): String =
    s"""$base,
       |qsh AS (
       |  SELECT doc_id, dl,
       |    greatest(CAST(floor(log2(CAST(greatest(dl - 24, 1) AS DOUBLE)))
       |      AS BIGINT) - 3, 0) AS sh
       |  FROM doclen
       |),
       |qdoclen AS (
       |  SELECT doc_id,
       |    CASE WHEN dl < 32 THEN dl
       |         ELSE 24 + (((((dl - 24) >> sh) & 7) | 8) << sh)
       |    END AS dl
       |  FROM qsh
       |)
       |SELECT doc_id, round(score, 4) AS score FROM (
       |  SELECT p.doc_id,
       |    sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score,
       |    count(*) AS nmatch
       |  FROM postings p
       |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
       |  JOIN qdoclen l USING (doc_id)
       |  CROSS JOIN stats s
       |  WHERE p.term IN ($termsSqlList)
       |  GROUP BY 1
       |) WHERE nmatch = $nTerms
       |ORDER BY score DESC, doc_id
       |LIMIT $k""".stripMargin

  /** DuckDB twin of the PRODUCTION identifiers field: identifiers
    * extracted from content (first-occurrence dedup order preserved via
    * min-occurrence), tokenized raw per id, lowercased base stream with
    * consecutive positions, camel/snake sub-tokens appended (position
    * gaps make them adjacency-inert, so only the base stream carries
    * phrase positions — mirrors Tokenizer.identifierFieldTokens). */
  private val camelSplitSql =
    """regexp_replace(regexp_replace(rt,
      |          '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
      |          '([A-Z])([A-Z][a-z])', '\\1 \\2', 'g')""".stripMargin

  private val identCtes: String =
    s"""idlist AS (
       |  SELECT doc_id,
       |    regexp_extract_all(content, '[a-zA-Z_][a-zA-Z0-9_]*') AS ids0
       |  FROM corpus
       |),
       |idocc AS (
       |  SELECT doc_id, i AS occ, ids0[CAST(i + 1 AS INTEGER)] AS id
       |  FROM (SELECT doc_id, ids0, unnest(range(0, len(ids0))) AS i
       |        FROM idlist)
       |),
       |idfirst AS (
       |  SELECT doc_id, id, min(occ) AS firstocc FROM idocc GROUP BY 1, 2
       |),
       |rawtok AS (
       |  SELECT doc_id, firstocc, j, toks[CAST(j + 1 AS INTEGER)] AS rt
       |  FROM (
       |    SELECT doc_id, firstocc, toks, unnest(range(0, len(toks))) AS j
       |    FROM (SELECT doc_id, firstocc,
       |            list_filter(regexp_split_to_array(id, '[^a-zA-Z0-9]+'),
       |              x -> x <> '' AND length(x) <= 40) AS toks
       |          FROM idfirst)
       |  )
       |),
       |basestream AS (
       |  SELECT doc_id, lower(rt) AS term, rt,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY firstocc, j) - 1 AS pos
       |  FROM rawtok
       |),
       |subs AS (
       |  SELECT doc_id, unnest(parts) AS term FROM (
       |    SELECT doc_id,
       |      list_filter(regexp_split_to_array(lower($camelSplitSql), ' '),
       |        x -> x <> '' AND length(x) <= 40) AS parts,
       |      len(regexp_split_to_array($camelSplitSql, ' ')) AS nparts
       |    FROM basestream
       |  ) WHERE nparts > 1
       |),
       |istream AS (
       |  SELECT doc_id, term FROM basestream
       |  UNION ALL SELECT doc_id, term FROM subs
       |),
       |ipost AS (SELECT doc_id, term, count(*) AS tf FROM istream GROUP BY 1, 2),
       |idl AS (SELECT doc_id, count(*) AS dl FROM istream GROUP BY 1),
       |idfr AS (SELECT term, count(*) AS df FROM ipost GROUP BY 1),
       |istats AS (
       |  SELECT CAST(sum(dl) AS DOUBLE) / (SELECT n_docs FROM stats) AS avgdl
       |  FROM idl
       |)""".stripMargin

  /** content-BM25 + identifiers-BM25 for one exact term, summed per doc
    * (OR across fields), unrounded ordering, top-k. */
  private def prodSingleSql(term: String, k: Int): String =
    s"""$base,
       |$identCtes,
       |cs AS (
       |  SELECT p.doc_id,
       |    ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
       |      * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl)) AS sc
       |  FROM postings p
       |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
       |  JOIN doclen l USING (doc_id)
       |  CROSS JOIN stats s
       |  WHERE p.term = '$term'
       |),
       |isr AS (
       |  SELECT ip.doc_id,
       |    ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
       |      * ip.tf * 2.2 / (ip.tf + 1.2 * (0.25 + 0.75 * il.dl / ist.avgdl)) AS sc
       |  FROM ipost ip
       |  JOIN idfr f USING (term)
       |  JOIN idl il USING (doc_id)
       |  CROSS JOIN stats s CROSS JOIN istats ist
       |  WHERE ip.term = '$term'
       |)
       |SELECT doc_id, round(sc, 4) AS score FROM (
       |  SELECT doc_id, coalesce(cs.sc, 0) + coalesce(isr.sc, 0) AS sc
       |  FROM cs FULL OUTER JOIN isr USING (doc_id)
       |) ORDER BY sc DESC, doc_id
       |LIMIT $k""".stripMargin

  /** Positional phrase (t1 adjacent-then t2) on content + identifiers:
    * tf = phrase frequency, idf = sum of constituent idfs. */
  private def prodPhraseSql(t1: String, t2: String, k: Int): String =
    s"""$base,
       |$identCtes,
       |ctoksp AS (
       |  SELECT doc_id, list_filter(
       |    regexp_split_to_array(lower(content), '[^\\p{L}\\p{N}]+'),
       |    x -> x <> '' AND length(x) <= 40) AS toks
       |  FROM corpus
       |),
       |cdf AS (SELECT term, count(*) AS df FROM postings GROUP BY 1),
       |cph AS (
       |  SELECT doc_id,
       |    len(list_filter(range(0, greatest(len(toks) - 1, 0)),
       |      i -> toks[CAST(i + 1 AS INTEGER)] = '$t1'
       |       AND toks[CAST(i + 2 AS INTEGER)] = '$t2')) AS pf,
       |    len(toks) AS dl
       |  FROM ctoksp
       |),
       |cs AS (
       |  SELECT c.doc_id,
       |    (d1.idf + d2.idf) * c.pf * 2.2 /
       |      (c.pf + 1.2 * (0.25 + 0.75 * c.dl / s.avgdl)) AS sc
       |  FROM cph c
       |  CROSS JOIN stats s
       |  CROSS JOIN (SELECT ln(1 + (s2.n_docs - df + 0.5) / (df + 0.5)) AS idf
       |              FROM cdf, stats s2 WHERE term = '$t1') d1
       |  CROSS JOIN (SELECT ln(1 + (s3.n_docs - df + 0.5) / (df + 0.5)) AS idf
       |              FROM cdf, stats s3 WHERE term = '$t2') d2
       |  WHERE c.pf > 0
       |),
       |iph AS (
       |  SELECT a.doc_id, count(*) AS pf
       |  FROM basestream a JOIN basestream b
       |    ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
       |  WHERE a.term = '$t1' AND b.term = '$t2'
       |  GROUP BY 1
       |),
       |isr AS (
       |  SELECT i.doc_id,
       |    (d1.idf + d2.idf) * i.pf * 2.2 /
       |      (i.pf + 1.2 * (0.25 + 0.75 * il.dl / ist.avgdl)) AS sc
       |  FROM iph i
       |  JOIN idl il USING (doc_id)
       |  CROSS JOIN istats ist
       |  CROSS JOIN (SELECT ln(1 + (s2.n_docs - df + 0.5) / (df + 0.5)) AS idf
       |              FROM idfr, stats s2 WHERE term = '$t1') d1
       |  CROSS JOIN (SELECT ln(1 + (s3.n_docs - df + 0.5) / (df + 0.5)) AS idf
       |              FROM idfr, stats s3 WHERE term = '$t2') d2
       |  WHERE i.pf > 0
       |)
       |SELECT doc_id, round(sc, 4) AS score FROM (
       |  SELECT doc_id, coalesce(cs.sc, 0) + coalesce(isr.sc, 0) AS sc
       |  FROM cs FULL OUTER JOIN isr USING (doc_id)
       |) ORDER BY sc DESC, doc_id
       |LIMIT $k""".stripMargin

  val all: Map[String, String] = Map(
    "fts_engine_prod_single" -> prodSingleSql("merge", 10),
    "fts_engine_prod_phrase" -> prodPhraseSql("import", "os", 10),

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

    "fts_ident_ngrams" ->
      s"""WITH ${CodeCorpus.corpusCteSql},
         |identterms AS (
         |  SELECT DISTINCT doc_id, term FROM (
         |    SELECT doc_id, unnest(list_filter(
         |      list_concat([lower(id)],
         |        regexp_split_to_array(lower(
         |          regexp_replace(regexp_replace(id,
         |            '([a-z0-9])([A-Z])', '\\1 \\2', 'g'),
         |            '([A-Z])([A-Z][a-z])', '\\1 \\2', 'g')),
         |          '[_ ]+')),
         |      x -> x <> '' AND length(x) <= 40)) AS term
         |    FROM (
         |      SELECT doc_id,
         |             unnest(regexp_extract_all(content, '[a-zA-Z_][a-zA-Z0-9_]*')) AS id
         |      FROM corpus
         |    )
         |  )
         |),
         |ng AS (
         |  SELECT DISTINCT doc_id, substring(term, 1, CAST(i AS INTEGER)) AS ng
         |  FROM (SELECT doc_id, term,
         |          unnest(range(3, least(8, length(term) - 1) + 1)) AS i
         |        FROM identterms WHERE length(term) >= 4)
         |)
         |SELECT ng AS term, count(*) AS df FROM ng GROUP BY 1""".stripMargin,

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
    "fts_engine_qnorm" -> qnormTopK("'merge'", 1, 10),
    "fts_engine_limit0" -> bm25TopK("'merge'", 1, 100000),

    "fts_engine_lang" ->
      s"""$base
         |SELECT doc_id, lang, round(sc, 4) AS score FROM (
         |  SELECT sc.doc_id, c.lang, sc.sc
         |  FROM (
         |    SELECT p.doc_id,
         |      sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
         |          * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS sc
         |    FROM postings p
         |    JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
         |    JOIN doclen l USING (doc_id)
         |    CROSS JOIN stats s
         |    WHERE p.term = 'merge'
         |    GROUP BY 1
         |  ) sc JOIN corpus c USING (doc_id)
         |  WHERE c.lang IN ('py', 'js')
         |) ORDER BY sc DESC, doc_id
         |LIMIT 10""".stripMargin,
    "fts_engine_and" -> bm25TopK("'merge', 'sort'", 2, 10),
    "fts_engine_wand" -> bm25TopK("'merge', 'sort'", 2, 10),
    "fts_engine_fuzzy" ->
      expandedOrTopK("damerau_levenshtein(p.term, '42') <= 1", 10),
    "fts_engine_regex" ->
      expandedOrTopK("regexp_full_match(p.term, '(mer|sor).*')", 10),

    // T5 semantic-chunker packing stage: greedy line packing replayed as
    // a per-doc recursive fold (acc carries the running chunk size; a new
    // chunk starts when acc + len + 1 would exceed chunk_size)
    "t5_chunks" ->
      s"""WITH RECURSIVE ${CodeCorpus.corpusCteSql},
         |lin0 AS (
         |  SELECT doc_id, string_split(content, chr(10)) AS ls,
         |         content LIKE '%' || chr(10) AS ends_nl
         |  FROM corpus
         |),
         |lin AS (
         |  SELECT doc_id, ends_nl,
         |    CASE WHEN ends_nl THEN ls[1:len(ls) - 1] ELSE ls END AS ls
         |  FROM lin0
         |),
         |docmeta AS (SELECT doc_id, len(ls) AS nlines, ends_nl FROM lin),
         |ln AS (
         |  SELECT doc_id, CAST(i AS INTEGER) AS ln,
         |         length(ls[CAST(i AS INTEGER)]) AS len
         |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
         |        FROM lin)
         |),
         |pack AS (
         |  SELECT doc_id, ln, 1 AS chunk_start, len + 1 AS acc
         |  FROM ln WHERE ln = 1
         |  UNION ALL
         |  SELECT l.doc_id, l.ln,
         |    CASE WHEN p.acc + l.len + 1 > 150 THEN l.ln
         |         ELSE p.chunk_start END,
         |    CASE WHEN p.acc + l.len + 1 > 150 THEN l.len + 1
         |         ELSE p.acc + l.len + 1 END
         |  FROM pack p JOIN ln l
         |    ON l.doc_id = p.doc_id AND l.ln = p.ln + 1
         |),
         |chunks AS (
         |  SELECT doc_id, chunk_start AS line_start, max(ln) AS line_end,
         |         max(acc) AS acc
         |  FROM pack GROUP BY 1, 2
         |)
         |SELECT c.doc_id,
         |  CAST(row_number() OVER (PARTITION BY c.doc_id
         |         ORDER BY c.line_start) - 1 AS INTEGER) AS chunk_index,
         |  CAST(c.line_start AS INTEGER) AS line_start,
         |  CAST(c.line_end AS INTEGER) AS line_end,
         |  -- joined size = sum(len)+n-1 = acc-1; +1 when a trailing
         |  -- newline is appended (not the file's last chunk, or the file
         |  -- ends with one)
         |  CAST(CASE WHEN c.line_end < d.nlines OR d.ends_nl
         |       THEN c.acc ELSE c.acc - 1 END AS INTEGER) AS size
         |FROM chunks c JOIN docmeta d USING (doc_id)""".stripMargin,
  )
}
