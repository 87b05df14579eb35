package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines over
  * `documents(doc_id, text)`: quality scoring, token counting, language
  * identification, and document fingerprinting. All column math (codegen,
  * no UDFs); every query has a DuckDB oracle twin.
  */
object TextAnalysis {
  import PortableHash._

  val EnStop: Seq[String] =
    Seq("the", "a", "of", "and", "is", "to", "in", "it", "that", "for")

  /** Per-language marker sets for the n-gram/stopword-voting language ID. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我"),
  )

  private def words(text: Column): Column =
    filter(split(text, "\\s+"), w => w =!= lit(""))

  /** Quality metrics: length/word/stopword/alpha ratios (rounded).
    * Output: (doc_id, n_chars, n_words, avg_word_len, stopword_ratio,
    * alpha_ratio). */
  def quality(docs: DataFrame): DataFrame = {
    val w = words(col("text"))
    val nWords = size(w)
    val stops = size(filter(w, t => t.isin(EnStop: _*)))
    val alpha = length(regexp_replace(col("text"), "[^\\p{L}\\p{N}]", ""))
    docs.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      round(length(regexp_replace(col("text"), "\\s+", "")) /
        greatest(nWords, lit(1)).cast("double"), 4).as("avg_word_len"),
      round(stops / greatest(nWords, lit(1)).cast("double"), 4)
        .as("stopword_ratio"),
      round(alpha / greatest(length(col("text")), lit(1)).cast("double"), 4)
        .as("alpha_ratio"))
  }

  /** Token counting: whitespace words vs a BPE-ish pre-tokenizer (letter
    * runs, digit runs, single non-alphanumeric marks).
    * Output: (doc_id, ws_tokens, bpe_tokens). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(words(col("text"))).cast("long").as("ws_tokens"),
      size(expr(
        """regexp_extract_all(lower(text), '[\\p{L}]+|[0-9]+|[^\\p{L}0-9\\s]', 0)"""))
        .cast("long").as("bpe_tokens"))

  /** Stopword-voting language ID with deterministic priority tie-break.
    * Output: (doc_id, pred_lang, s_en, s_es, s_de, s_fr, s_zh). */
  def langId(docs: DataFrame): DataFrame = {
    val toks = Dedup.tokensCol(col("text"))
    val scores = LangMarkers.map { case (l, ms) =>
      l -> size(filter(toks, t => t.isin(ms: _*))).cast("long")
    }
    val m = greatest(scores.map(_._2): _*)
    val pred = scores.reverse.foldLeft(lit("und")) { case (acc, (l, s)) =>
      when(s === m && m > 0, lit(l)).otherwise(acc)
    }
    docs.select(
      (col("doc_id") +: (pred.as("pred_lang") +:
        scores.map { case (l, s) => s.as(s"s_$l") })): _*)
  }

  /** Winnowing-style fingerprint: min (and count) of rolling char-8-gram
    * hashes of the lowercased text.
    * Output: (doc_id, fingerprint, n_windows). */
  def fingerprint(docs: DataFrame, gram: Int = 8): DataFrame = {
    val lowered = lower(col("text"))
    val n = length(lowered) - (gram - 1)
    val fp = expr(
      s"""aggregate(
         |  transform(sequence(1, length(lower(text)) - ${gram - 1}),
         |    i -> CAST(conv(substring(md5(substr(lower(text), i, $gram)), 1, 15), 16, 10) AS LONG)),
         |  CAST(null AS LONG), (acc, h) -> least(coalesce(acc, h), h))""".stripMargin)
    docs.select(col("doc_id"),
      when(n >= 1, fp).otherwise(lit(null).cast("long")).as("fingerprint"),
      greatest(n, lit(0)).cast("long").as("n_windows"))
  }
}
