package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic source-code corpus in the engine's ingest shape
  * `(repo, path, commit, lang, content)` (BASELINE.json input_hint),
  * derived 1:1 from the driver-generated `documents` parquet table so the
  * DuckDB oracle can recompute it exactly (no external data, no RNG).
  *
  * Each document becomes one synthetic source file: the document text is
  * embedded in a code wrapper that adds stopword-grade tokens (`import`,
  * `def`, `return` — df == N, the skew case the north rule calls out) and
  * camelCase / snake_case identifiers for the code-aware analyzers.
  *
  * The same derivation is expressed twice — as DataFrame ops here and as a
  * DuckDB CTE in [[corpusCteSql]] — and the two are compared per-round by
  * the driver's verify harness (row/schema/hash equality).
  */
object CodeCorpus {

  /** lang label -> file extension, mirroring the reference's practice of
    * storing bare extensions as the language field (reference:
    * cli.py:3254-3256, file_chunking_manager.py:680). */
  private val langCases: Seq[(String, String)] =
    Seq("en" -> "py", "es" -> "js", "de" -> "java", "fr" -> "go", "zh" -> "rs")

  /** Read the `documents` table for a scale-factor dir. */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** The ingest table: one source file per document. Columns:
    * (doc_id, repo, path, commit, lang, content). */
  def sourceFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val docs = documents(spark, sfDir)
    val ext = langCases.foldLeft(lit(null): org.apache.spark.sql.Column) {
      case (acc, (l, e)) => when(col("lang") === l, e).otherwise(acc)
    }
    val extCol = coalesce(ext, lit("py"))
    val idStr = col("doc_id").cast("string")
    docs.select(
      col("doc_id"),
      concat(lit("repo_"), (col("doc_id") % 8).cast("string")).as("repo"),
      concat(lit("src/"), col("source"), lit("/file_"), idStr, lit("."), extCol).as("path"),
      concat(md5(idStr), substring(md5(idStr), 1, 8)).as("commit"),
      extCol.as("lang"),
      concat(
        lit("import os\nimport sys\n\ndef handler_"), idStr,
        lit("(request):\n    # "), col("text"),
        lit("\n    value = getUserName(request)\n    return value\n")
      ).as("content")
    )
  }

  /** DuckDB CTE computing the identical corpus (table name `documents`). */
  val corpusCteSql: String = {
    val caseExpr = langCases
      .map { case (l, e) => s"WHEN '$l' THEN '$e'" }
      .mkString("CASE lang ", " ", " ELSE 'py' END")
    s"""corpus AS (
       |  SELECT
       |    doc_id,
       |    'repo_' || CAST(doc_id % 8 AS VARCHAR) AS repo,
       |    'src/' || source || '/file_' || CAST(doc_id AS VARCHAR) || '.' || ($caseExpr) AS path,
       |    md5(CAST(doc_id AS VARCHAR)) || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS "commit",
       |    ($caseExpr) AS lang,
       |    'import os' || chr(10) || 'import sys' || chr(10) || chr(10) ||
       |      'def handler_' || CAST(doc_id AS VARCHAR) || '(request):' || chr(10) ||
       |      '    # ' || text || chr(10) ||
       |      '    value = getUserName(request)' || chr(10) ||
       |      '    return value' || chr(10) AS content
       |  FROM documents
       |)""".stripMargin
  }
}
