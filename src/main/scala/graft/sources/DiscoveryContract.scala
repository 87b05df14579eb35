package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.CodeCorpus
import graft.functions.PathGlob
import graft.index.IndexBuilder

/** Driver-contract queries + DuckDB oracles for the discovery operators
  * (SURVEY.md §2.1 S2-S8, T4 chunker, T6 language map, A5 stats, A7/Q16
  * per-repo top-k). */
object DiscoveryQueries {

  private def corpus(s: SparkSession, dir: String): DataFrame =
    CodeCorpus.sourceFiles(s, dir)

  /** Non-trivial discovery config for the oracle: only py/js, exclude the
    * src3 tree, max 500 chars. */
  private val OracleExts = Set("py", "js")
  private val OracleExcludeGlob = "**/src3/**"
  private val OracleMaxLen = 500L

  /** Gitignore fixture for the oracle: an unanchored dir pattern, a
    * rooted (leading-'/') pattern, a suffix glob, a `!` negation, plus a
    * NESTED gitignore line prefixed with its directory — every semantic
    * [[Discovery.gitignoreRules]] implements. Evaluated with pathspec's
    * last-match-wins ordering ([[Discovery.gitignoreExcludedColumn]]);
    * the negation is the final matching rule for the paths it covers, so
    * the hand-written oracle SQL's OR-composition states the same set. */
  private val OracleGitignoreRoot =
    "# vendored sources\nsrc2/\n/src/src4\n*.go\n!**/src7/*.go\n"
  private val OracleGitignoreNested = "file_1*.js"

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_discovery" -> ((s, d) =>
      corpus(s, d).where(
        Discovery.extensionFilter(OracleExts) &&
          Discovery.excludePathFilter(Nil, Seq(OracleExcludeGlob)) &&
          Discovery.sizeFilter(OracleMaxLen) && Discovery.textFilter)
        .select("doc_id", "path", "lang")),

    "src_gitignore" -> ((s, d) => {
      val rules = Discovery.gitignoreRules(OracleGitignoreRoot) ++
        Discovery.gitignoreRules(OracleGitignoreNested, "src/src5")
      corpus(s, d)
        .where(!Discovery.gitignoreExcludedColumn(rules))
        .select("doc_id", "path")
    }),

    "src_deleted" -> ((s, d) => {
      val c = corpus(s, d)
      Discovery.deletedFiles(
        indexed = c.where(col("doc_id") < 400),
        current = c.where(col("doc_id") >= 100))
    }),

    "src_modified" -> ((s, d) => {
      val c = corpus(s, d)
      val indexed = c.withColumn("commit",
        when(col("doc_id") % 7 === 0, lit("f" * 40))
          .otherwise(col("commit")))
      Discovery.modifiedSince(current = c, indexed = indexed)
        .select("doc_id", "path")
    }),

    "src_stats" -> ((s, d) => Discovery.fileStats(corpus(s, d))),

    "src_ext_lang" -> ((s, d) =>
      corpus(s, d).select(col("doc_id"), col("lang"),
        Discovery.languageOfExt(col("lang")).as("language"))),

    "src_chunks" -> ((s, d) => {
      val st = s
      import st.implicits._
      corpus(s, d).select("doc_id", "content").as[(Long, String)]
        .flatMap { case (id, content) =>
          Chunker.chunk(content, chunkSize = 120).map(c =>
            (id, c.chunk_index, c.total_chunks, c.size, c.line_start,
              c.line_end, java.security.MessageDigest.getInstance("MD5")
                .digest(c.text.getBytes("UTF-8"))
                .map("%02x".format(_)).mkString))
        }.toDF("doc_id", "chunk_index", "total_chunks", "size",
          "line_start", "line_end", "chunk_md5")
    }),

    "repo_topk" -> ((s, d) => {
      val c = corpus(s, d)
      val toks = IndexBuilder.tokens(c)
      val scored = IndexBuilder.searchAnd(
        IndexBuilder.postings(toks), IndexBuilder.docLens(toks),
        Seq("merge"), Int.MaxValue)
      val w = Window.partitionBy("repo").orderBy(desc("score"), asc("doc_id"))
      scored.join(c.select("doc_id", "repo"), "doc_id")
        .withColumn("rank", row_number().over(w))
        .where(col("rank") <= 3)
        .select("repo", "rank", "doc_id", "score")
    }),

    // per-repo aggregate with the reference's min_score-before-limit
    // semantics (multi_result_aggregator.py:50-59)
    "repo_topk_minscore" -> ((s, d) => {
      val c = corpus(s, d)
      val toks = IndexBuilder.tokens(c)
      val scored = IndexBuilder.searchAnd(
        IndexBuilder.postings(toks), IndexBuilder.docLens(toks),
        Seq("merge"), Int.MaxValue)
      graft.query.MultiRepo.aggregate(
        scored.join(c.select("doc_id", "repo"), "doc_id"),
        limit = 3, minScore = Some(0.40))
        .select("repo", "rank", "doc_id", "score")
    }),
  )

  val oracle: Map[String, String] = {
    val base = CodeCorpus.corpusCteSql
    val exclRegex = PathGlob.toRegex(OracleExcludeGlob)
    Map(
      "src_discovery" ->
        s"""WITH $base
           |SELECT doc_id, path, lang FROM corpus
           |WHERE lang IN ('py', 'js')
           |  AND NOT regexp_matches(path, '$exclRegex')
           |  AND length(content) <= $OracleMaxLen
           |  AND NOT contains(substring(content, 1, 1024), chr(0))""".stripMargin,

      // the oracle re-states the gitwildmatch semantics as hand-written
      // DuckDB regexes (NOT PathGlob output): dir pattern at any depth,
      // root-anchored pattern, suffix glob, nested-prefixed glob; the
      // negation re-includes matching paths
      "src_gitignore" ->
        s"""WITH $base
           |SELECT doc_id, path FROM corpus
           |WHERE NOT (
           |     regexp_matches(path, '(^|/)src2(/|$$)')
           |  OR regexp_matches(path, '^src/src4(/|$$)')
           |  OR regexp_matches(path, '(^|/)[^/]*\\.go$$')
           |  OR regexp_matches(path, '^src/src5/file_1[^/]*\\.js$$')
           |) OR regexp_matches(path, '(^|/)src7/[^/]*\\.go$$')""".stripMargin,

      "src_deleted" ->
        s"""WITH $base
           |SELECT i.repo, i.path
           |FROM (SELECT repo, path FROM corpus WHERE doc_id < 400) i
           |ANTI JOIN (SELECT repo, path FROM corpus WHERE doc_id >= 100) c
           |  USING (repo, path)""".stripMargin,

      "src_modified" ->
        s"""WITH $base
           |SELECT doc_id, path FROM corpus WHERE doc_id % 7 = 0""".stripMargin,

      "src_stats" ->
        s"""WITH $base
           |SELECT list_extract(string_split(path, '.'), -1) AS ext,
           |       count(*) AS n_files,
           |       CAST(sum(length(content)) AS BIGINT) AS total_bytes
           |FROM corpus GROUP BY 1""".stripMargin,

      "src_ext_lang" -> {
        val cases = Discovery.ExtToLanguage
          .map { case (e, l) => s"WHEN '$e' THEN '$l'" }.mkString(" ")
        s"""WITH $base
           |SELECT doc_id, lang, (CASE lang $cases ELSE lang END) AS language
           |FROM corpus""".stripMargin
      },

      "src_chunks" ->
        s"""WITH $base,
           |meta AS (
           |  SELECT doc_id, content, length(content) AS len,
           |    (CASE WHEN length(content) <= 120 THEN 0
           |          ELSE CAST(ceil((length(content) - 120) / 102.0) AS INTEGER)
           |     END) AS k
           |  FROM corpus WHERE trim(content) <> ''
           |)
           |SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
           |  CAST(k + 1 AS INTEGER) AS total_chunks,
           |  CAST(length(substr(content, i * 102 + 1, 120)) AS INTEGER) AS size,
           |  CAST(length(regexp_replace(substr(content, 1, i * 102),
           |    '[^\\n]', '', 'g')) + 1 AS INTEGER) AS line_start,
           |  CAST(length(regexp_replace(substr(content, 1,
           |    i * 102 + length(substr(content, i * 102 + 1, 120))),
           |    '[^\\n]', '', 'g')) + 1 AS INTEGER) AS line_end,
           |  md5(substr(content, i * 102 + 1, 120)) AS chunk_md5
           |FROM (SELECT doc_id, content, k,
           |        unnest(range(0, k + 1)) AS i FROM meta)""".stripMargin,

      "repo_topk" ->
        s"""WITH $base,
           |tokens AS (
           |  SELECT doc_id, unnest(list_filter(
           |    regexp_split_to_array(lower(content), '[^\\p{L}\\p{N}]+'),
           |    x -> x <> '' AND length(x) <= 40)) AS term
           |  FROM corpus
           |),
           |postings AS (SELECT term, doc_id, count(*) AS tf FROM tokens GROUP BY 1, 2),
           |doclen AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY 1),
           |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
           |scored AS (
           |  SELECT p.doc_id,
           |    sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))) AS score
           |  FROM postings p
           |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
           |  JOIN doclen l USING (doc_id)
           |  CROSS JOIN stats s
           |  WHERE p.term IN ('merge')
           |  GROUP BY 1
           |)
           |SELECT repo, CAST(rank AS INTEGER) AS rank, doc_id,
           |       round(score, 4) AS score
           |FROM (
           |  SELECT c.repo, sc.doc_id, sc.score,
           |    row_number() OVER (PARTITION BY c.repo
           |      ORDER BY sc.score DESC, sc.doc_id) AS rank
           |  FROM scored sc JOIN corpus c USING (doc_id)
           |) WHERE rank <= 3""".stripMargin,

      "repo_topk_minscore" ->
        s"""WITH $base,
           |tokens AS (
           |  SELECT doc_id, unnest(list_filter(
           |    regexp_split_to_array(lower(content), '[^\\p{L}\\p{N}]+'),
           |    x -> x <> '' AND length(x) <= 40)) AS term
           |  FROM corpus
           |),
           |postings AS (SELECT term, doc_id, count(*) AS tf FROM tokens GROUP BY 1, 2),
           |doclen AS (SELECT doc_id, count(*) AS dl FROM tokens GROUP BY 1),
           |stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
           |scored AS (
           |  SELECT p.doc_id,
           |    round(sum(ln(1 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           |        * p.tf * 2.2 / (p.tf + 1.2 * (0.25 + 0.75 * l.dl / s.avgdl))), 4) AS score
           |  FROM postings p
           |  JOIN (SELECT term, count(*) AS df FROM postings GROUP BY 1) d USING (term)
           |  JOIN doclen l USING (doc_id)
           |  CROSS JOIN stats s
           |  WHERE p.term IN ('merge')
           |  GROUP BY 1
           |)
           |SELECT repo, CAST(rank AS INTEGER) AS rank, doc_id, score
           |FROM (
           |  SELECT c.repo, sc.doc_id, sc.score,
           |    row_number() OVER (PARTITION BY c.repo
           |      ORDER BY sc.score DESC, sc.doc_id) AS rank
           |  FROM scored sc JOIN corpus c USING (doc_id)
           |  WHERE sc.score >= 0.40
           |) WHERE rank <= 3""".stripMargin,
    )
  }
}
