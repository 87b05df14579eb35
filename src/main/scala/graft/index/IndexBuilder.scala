package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DataFrame-level inverted-index pipeline: tokenize -> postings -> global
  * stats -> BM25. Everything here is declarative (Catalyst-optimizable,
  * whole-stage-codegen-able): tokenization is `split`/`lower`/higher-order
  * `filter` on columns, aggregation is hash-agg with automatic map-side
  * partials, and the query path is a broadcast-joined filter over the
  * postings relation.
  *
  * Semantics replicate the reference FTS engine (jsbattig/code-indexer,
  * which delegates to Tantivy 0.25 defaults):
  *   - tokenizer: split on non-alphanumeric Unicode, drop >40 chars,
  *     lowercase (services/tantivy_index_manager.py:99)
  *   - BM25: k1=1.2, b=0.75, idf = ln(1 + (N - df + 0.5)/(df + 0.5))
  *   - multi-term queries AND all terms (Occur.Must,
  *     tantivy_index_manager.py:375-387), score = sum of per-term scores
  *   - deterministic tie-break by doc_id (ours; reference order for equal
  *     scores is unspecified)
  *
  * The binary segment layer (delta-gap varint postings, block-max WAND)
  * builds on top of these relations in [[graft.index.FtsIndexBuilder]].
  */
object IndexBuilder {

  /** Tantivy-default split pattern (same string works in Java regex and
    * DuckDB's RE2 — asserted by the verify harness). */
  final val SplitRe = "[^\\p{L}\\p{N}]+"
  final val MaxTokenLen = 40
  final val K1 = 1.2
  final val B = 0.75

  /** Content-field token stream: (doc_id, term), duplicates preserved. */
  def tokens(corpus: DataFrame): DataFrame =
    corpus.select(
      col("doc_id"),
      explode(tokenArray(col("content"))).as("term"))

  /** Tokenizer as a column expression over a string column. */
  def tokenArray(content: Column): Column =
    filter(split(lower(content), SplitRe),
      t => t =!= lit("") && length(t) <= MaxTokenLen)

  /** Identifier-field token stream: (doc_id, term), deduped per doc (the
    * reference dedups identifiers through a set before indexing, so tf is
    * effectively 1 — we model the field as DISTINCT (doc, term)).
    * Each identifier contributes itself (lowercased) plus camelCase /
    * snake_case sub-tokens (code-aware analyzer, north-star requirement).
    */
  def identifierTokens(corpus: DataFrame): DataFrame = {
    val rawIds = corpus.select(
      col("doc_id"),
      explode(expr(
        "regexp_extract_all(content, '[a-zA-Z_][a-zA-Z0-9_]*', 0)")).as("id"))
    val camelSplit =
      regexp_replace(
        regexp_replace(col("id"), "([a-z0-9])([A-Z])", "$1 $2"),
        "([A-Z])([A-Z][a-z])", "$1 $2")
    rawIds.select(
      col("doc_id"),
      explode(filter(
        array_union(array(lower(col("id"))),
          split(lower(camelSplit), "[_ ]+")),
        t => t =!= lit("") && length(t) <= MaxTokenLen)).as("term"))
      .distinct()
  }

  /** Prefix n-grams (lengths 3-8, proper prefixes only) of the deduped
    * identifier terms, with document frequency — the pipeline-level view
    * of the identifier-n-gram analyzer lane
    * ([[graft.analysis.Tokenizer.identifierFieldTokens]]). */
  def identifierNgramStats(corpus: DataFrame): DataFrame =
    identifierTokens(corpus)
      .where(length(col("term")) >= 4)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(3, least(8, length(term) - 1))," +
          " i -> substring(term, 1, i))")).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Posting relation: (term, doc_id, tf). Hash aggregation; Catalyst
    * inserts the map-side partial aggregate before the shuffle on
    * (term, doc_id), which is exactly the per-partition posting build the
    * north rule describes. */
  def postings(tokens: DataFrame): DataFrame =
    tokens.groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))

  /** Per-document field length: (doc_id, dl). */
  def docLens(tokens: DataFrame): DataFrame =
    tokens.groupBy("doc_id").agg(count(lit(1)).as("dl"))

  /** Term dictionary with document/collection frequency: (term, df, cf). */
  def termStats(postings: DataFrame): DataFrame =
    postings.groupBy("term")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** Corpus-level stats: (n_docs, avgdl). One row. */
  def corpusStats(docLens: DataFrame): DataFrame =
    docLens.agg(count(lit(1)).as("n_docs"), avg("dl").as("avgdl"))

  /** BM25 per-(term, doc) partial score column. */
  def bm25Score(tf: Column, df: Column, dl: Column,
                nDocs: Column, avgdl: Column): Column = {
    val idf = log(lit(1.0) + (nDocs - df + lit(0.5)) / (df + lit(0.5)))
    idf * (tf * lit(K1 + 1.0)) /
      (tf + lit(K1) * (lit(1.0 - B) + lit(B) * dl / avgdl))
  }

  /** AND-of-terms BM25 top-k over the content field.
    *
    * Plan shape (scale notes): `postings` is filtered to the query's term
    * set first — with a segment/Parquet-backed postings table this predicate
    * pushes into the scan, so only the matching posting lists are read. The
    * per-term df relation is tiny (≤ #query terms) and broadcast; docLens
    * joins on doc_id (at scale this is a stored column of the postings
    * segment, avoiding the join — see SegmentWriter); the final top-k is
    * Spark's TakeOrderedAndProject (no global sort).
    */
  def searchAnd(postingsDf: DataFrame, docLensDf: DataFrame,
                terms: Seq[String], k: Int): DataFrame = {
    val uniq = terms.distinct
    val matched = postingsDf.where(col("term").isin(uniq: _*))
    val dfRel = matched.groupBy("term").agg(count(lit(1)).as("df"))
    val stats = corpusStats(docLensDf)
    val scored = matched
      .join(broadcast(dfRel), "term")
      .join(docLensDf, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("tscore",
        bm25Score(col("tf"), col("df"), col("dl"),
          col("n_docs"), col("avgdl")))
    scored.groupBy("doc_id")
      .agg(sum("tscore").as("score"), count(lit(1)).as("nmatch"))
      .where(col("nmatch") === uniq.length)
      .orderBy(desc("score"), asc("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("score"), 4).as("score"))
  }
}
