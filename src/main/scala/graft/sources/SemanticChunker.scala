package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's SEMANTIC text chunker — SURVEY T5 (reference:
  * indexing/chunker.py `TextChunker.chunk_text`, :933-1029). Its
  * observable entry-path algorithm, ported exactly:
  *
  *  1. greedy line packing (`_smart_split_with_lines`, :239-310): lines
  *     pack into a chunk while `size + len(line)+1 <= chunk_size` (the
  *     first line always packs, so a single line longer than chunk_size
  *     becomes its own oversized chunk); the chunk text joins lines with
  *     \n and keeps a trailing \n unless it is the file's final chunk of
  *     a file not ending in \n. No overlap.
  *  2. oversized chunks route through `_fallback_split_with_lines`
  *     (:832-893) which, for a single-line chunk, returns the line
  *     unchanged — but WITHOUT the trailing newline (observable quirk,
  *     preserved).
  *  3. tiny-chunk filtering (:963-1005): a stripped chunk shorter than
  *     100 chars merges into the previous chunk (if the merged text fits
  *     chunk_size and line ranges don't overlap), else into the next
  *     chunk (if it fits), else survives only if it is not a "fragment"
  *     (`_is_fragment`, :1029-1062: bare def/class/docstring delimiters,
  *     or <20 chars with no structural characters).
  *
  * The packing stage (1) is DuckDB-oracled (`t5_chunks`); the filter
  * stages are ScalaTest-verified against reference-derived cases.
  */
object SemanticChunker {

  final case class SChunk(text: String, chunk_index: Int, total_chunks: Int,
                          size: Int, line_start: Int, line_end: Int)

  private final val MinChunkSize = 100 // chunker.py:964

  /** Python str.splitlines for \n-separated text (drops a trailing empty
    * line; the corpus and reference fixtures are \n-only). */
  private[sources] def splitLines(text: String): Array[String] = {
    val parts = text.split("\n", -1)
    if (parts.nonEmpty && parts.last.isEmpty && text.endsWith("\n"))
      parts.dropRight(1)
    else parts
  }

  private[sources] final case class Raw(text: String, lineStart: Int,
                                        lineEnd: Int)

  /** Stage 1: greedy line packing with line tracking
    * (_smart_split_with_lines). */
  private[sources] def rawChunks(text: String, chunkSize: Int): Seq[Raw] = {
    val lines = splitLines(text)
    if (lines.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Raw]
    var i = 0
    while (i < lines.length) {
      val startLine = i + 1
      var size = 0
      var n = 0
      var j = i
      var done = false
      while (!done && j < lines.length) {
        val lineSize = lines(j).length + 1 // +1 for newline (reference :260)
        if (size + lineSize > chunkSize && n > 0) done = true
        else { size += lineSize; n += 1; j += 1 }
      }
      val endLine = startLine + n - 1
      var chunkText = lines.slice(i, i + n).mkString("\n")
      if (endLine < lines.length || text.endsWith("\n")) chunkText += "\n"
      out += Raw(chunkText, startLine, endLine)
      i += n
    }
    out.toSeq
  }

  /** Stage 2: the fallback pass for oversized chunks — for the only shape
    * the packing stage can produce (a single line beyond chunk_size) the
    * reference returns the line unchanged minus the trailing newline
    * (chunker.py:832-880 re-splitlines and rejoins). */
  private def fallback(c: Raw): Raw = {
    val lines = splitLines(c.text)
    if (lines.isEmpty) c
    else Raw(lines.mkString("\n"), c.lineStart,
      c.lineStart + lines.length - 1)
  }

  /** Reference `_is_fragment` (chunker.py:1029-1062). */
  private[sources] def isFragment(text0: String): Boolean = {
    val text = text0.trim
    val patterns = Seq("^\"\"\"$", "^'''$", "^def$", "^class$",
      "^async def$", "^def \\w+$", "^class \\w+$")
    if (patterns.exists(p => text.matches(p))) return true
    text.length < 20 && !"{}()=:;".exists(text.contains(_))
  }

  /** Full entry-path chunking (chunk_text). */
  def chunk(text: String, chunkSize: Int = 1000): Seq[SChunk] = {
    if (text == null || text.trim.isEmpty) return Nil
    val packed = rawChunks(text, chunkSize)
      .map(c => if (c.text.length > chunkSize) fallback(c) else c)

    // tiny-chunk merge/drop (reference iterates with in-place mutation of
    // the NEXT element for merge-forward; replicated with a mutable pass)
    val work = packed.toBuffer
    val kept = scala.collection.mutable.ArrayBuffer.empty[Raw]
    var i = 0
    while (i < work.length) {
      val c = work(i)
      val stripped = c.text.trim
      if (stripped.isEmpty) { /* skip */ }
      else if (stripped.length < MinChunkSize) {
        if (kept.nonEmpty &&
            (kept.last.text + "\n" + stripped).length <= chunkSize &&
            c.lineStart > kept.last.lineEnd) {
          val prev = kept.remove(kept.length - 1)
          kept += Raw(prev.text + "\n" + stripped, prev.lineStart, c.lineEnd)
        } else if (i + 1 < work.length &&
            (stripped + "\n" + work(i + 1).text.trim).length <= chunkSize) {
          val nxt = work(i + 1)
          work(i + 1) = Raw(stripped + "\n" + nxt.text, c.lineStart,
            nxt.lineEnd)
        } else if (!isFragment(stripped)) {
          kept += c
        } // else: dropped fragment
      } else kept += c
      i += 1
    }
    val total = kept.length
    kept.zipWithIndex.map { case (c, idx) =>
      SChunk(c.text, idx, total, c.text.length, c.lineStart, c.lineEnd)
    }.toSeq
  }

  /** Spark-side operator: explode an ingest table into semantic-chunk
    * granularity rows — same output shape as [[ChunkedIngest]] including
    * the reference's chunk-path identifier derivation (whitespace split of
    * the chunk text, file_chunking_manager.py:660-684), feedable to
    * [[graft.index.FtsIndexBuilder]] for a chunk-granularity index. */
  def explode(df: DataFrame, chunkSize: Int = 1000): DataFrame = {
    val chunksU = udf((content: String) =>
      chunk(content, chunkSize).map(c =>
        (c.text, c.text.split("\\s+").filter(_.nonEmpty).toSeq,
          c.line_start, c.line_end)))
    df.withColumn("c", org.apache.spark.sql.functions.explode(
        chunksU(col("content"))))
      .select(col("repo"), col("path"), col("commit"), col("lang"),
        col("c._1").as("content"),
        col("c._2").as("identifiers"),
        col("c._3").cast("long").as("line_start"),
        col("c._4").cast("long").as("line_end"))
  }

  /** The ORACLED packing stage as a DataFrame (one row per raw chunk):
    * (doc_id, chunk_index, line_start, line_end, size). */
  def packingStage(docs: DataFrame, textCol: String,
                   chunkSize: Int): DataFrame = {
    val rawU = udf((text: String) =>
      rawChunks(if (text == null) "" else text, chunkSize)
        .zipWithIndex.map { case (c, i) =>
          (i, c.lineStart, c.lineEnd, c.text.length) })
    docs.select(col("doc_id"),
        org.apache.spark.sql.functions.explode(rawU(col(textCol))).as("c"))
      .select(col("doc_id"), col("c._1").as("chunk_index"),
        col("c._2").as("line_start"), col("c._3").as("line_end"),
        col("c._4").as("size"))
  }
}
