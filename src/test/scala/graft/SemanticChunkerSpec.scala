package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.SemanticChunker

/** SURVEY T5 — semantic chunker behavioral parity. Golden expectations
  * were produced by executing the REFERENCE implementation
  * (indexing/chunker.py TextChunker.chunk_text, chunk_size=150) on the
  * same inputs; tuples are (textLen, chunk_index, total, size,
  * line_start, line_end). */
class SemanticChunkerSpec extends AnyFunSuite {

  private def run(text: String) =
    SemanticChunker.chunk(text, chunkSize = 150)
      .map(c => (c.text.length, c.chunk_index, c.total_chunks, c.size,
        c.line_start, c.line_end))

  test("single chunk keeps the trailing newline") {
    val text = "line one is here\nline two is here\nline three\n"
    assert(run(text) === Seq((45, 0, 1, 45, 1, 3)))
  }

  test("greedy packing: two 61-char lines per chunk at chunk_size 150") {
    val text = ("alpha " * 10 + "\n") * 6
    assert(run(text) === Seq(
      (122, 0, 3, 122, 1, 2), (122, 1, 3, 122, 3, 4), (122, 2, 3, 122, 5, 6)))
  }

  test("oversized line passes through alone (newline dropped); " +
       "surrounding tiny fragments are dropped") {
    val text = "short first line\n" + "x" * 400 + "\nshort last line"
    val out = SemanticChunker.chunk(text, 150)
    assert(out.map(c => (c.text.length, c.chunk_index, c.total_chunks,
      c.size, c.line_start, c.line_end)) === Seq((400, 0, 1, 400, 2, 2)))
    assert(!out.head.text.endsWith("\n"),
      "the fallback pass strips the oversized chunk's trailing newline")
  }

  test("a tiny tail line packs with its predecessor when it fits") {
    val text = ("y" * 120 + "\n") + "tail():\n"
    assert(run(text) === Seq((129, 0, 1, 129, 1, 2)))
  }

  test("bare-keyword fragments survive only inside larger chunks") {
    val text = ("z" * 120 + "\n") * 2 + "def\n"
    assert(run(text) === Seq((121, 0, 2, 121, 1, 1), (125, 1, 2, 125, 2, 3)))
  }

  test("final chunk of a file without trailing newline has none") {
    val text = "aaaa bbbb cccc dddd\neeee ffff"
    val out = SemanticChunker.chunk(text, 150)
    assert(out.map(c => (c.text.length, c.size, c.line_start, c.line_end)) ===
      Seq((29, 29, 1, 2)))
    assert(!out.head.text.endsWith("\n"))
  }

  test("tiny chunk merges forward into the next chunk when it fits") {
    // 29-char head + 120-char line: packing splits them (30+121 > 150)
    // but the merge-forward pass joins them exactly at the cap (150)
    val text = ("m" * 25 + "():\n") + ("w" * 120 + "\n") + ("v" * 120 + "\n")
    assert(run(text) === Seq((150, 0, 2, 150, 1, 2), (121, 1, 2, 121, 3, 3)))
  }

  test("empty and whitespace-only inputs produce no chunks") {
    assert(SemanticChunker.chunk("", 150).isEmpty)
    assert(SemanticChunker.chunk("   \n  \n", 150).isEmpty)
  }

  test("explode feeds a chunk-granularity index end to end") {
    val s = spark
    import s.implicits._
    val longDoc = (1 to 30)
      .map(i => s"def semantic_fn_$i(): return chunk_marker_$i").mkString("\n")
    val df = Seq(("r", "src/sem.py", "c" * 40, "py", longDoc))
      .toDF("repo", "path", "commit", "lang", "content")
    val chunked = SemanticChunker.explode(df, chunkSize = 300)
    val rows = chunked.collect()
    assert(rows.length > 1, "multiple chunks expected")
    // chunk line ranges tile the file without overlap
    val ranges = rows.map(r => (r.getAs[Long]("line_start"),
      r.getAs[Long]("line_end"))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, e1), (s2, _)) => assert(s2 === e1 + 1)
      case _ =>
    }
    val root = TestSpark.tempDir("semchunk")
    graft.index.FtsIndexBuilder.build(spark, chunked, root,
      graft.index.FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4))
    val idx = new graft.query.FtsIndex(spark, root)
    val rs = idx.searchCollected(graft.query.FtsQuery("chunk_marker_25"))
    assert(rs.nonEmpty && rs.head.line === 25) // file-absolute line
  }

  private def spark = TestSpark.spark
}
