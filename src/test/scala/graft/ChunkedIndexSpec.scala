package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.FtsIndexBuilder
import graft.query.{FtsIndex, FtsQuery}
import graft.sources.ChunkedIngest

/** Chunk-granularity indexing: several docs per path sharing the file's
  * path (reference main-build behavior), file-absolute line numbers. */
class ChunkedIndexSpec extends AnyFunSuite {

  private lazy val index: FtsIndex = {
    val spark = TestSpark.spark
    val root = TestSpark.tempDir("chunked")
    val chunked = ChunkedIngest.explode(
      TestSpark.docsDf(Fixtures.corpusB).drop("identifiers"), chunkSize = 120)
    FtsIndexBuilder.build(spark, chunked, root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4,
        codeAnalyzers = false))
    new FtsIndex(spark, root).warm()
  }

  test("files split into several chunk docs sharing the path") {
    val byPath = index.docs.groupBy("path").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byPath.values.exists(_ > 1))
    assert(byPath.keySet === Set("auth.py", "config.py", "utils.py"))
  }

  test("line numbers are file-absolute") {
    // validate_credentials is defined on line 7 of auth.py (past chunk 1)
    val rs = index.searchCollected(FtsQuery("validate_credentials", limit = 0))
    assert(rs.nonEmpty)
    val fileText = Fixtures.corpusB.find(_.path == "auth.py").get.content
    val expectedFirstLine = fileText.split("\n")
      .indexWhere(_.contains("validate_credentials")) + 1
    assert(rs.map(_.line).min === expectedFirstLine)
  }

  test("chunk docs keep the ingest sha + search surface") {
    val rs = index.searchCollected(FtsQuery("DATABASE_URL"))
    assert(rs.nonEmpty && rs.forall(_.path == "config.py"))
    // identifiers field = whitespace split of the chunk text
    val ids = index.searchCollected(FtsQuery("hexdigest"))
    assert(ids.nonEmpty && ids.forall(_.path == "utils.py"))
  }
}
