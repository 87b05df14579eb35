package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.Fixtures
import graft.index.FtsIndexBuilder
import graft.query.{FtsIndex, FtsQuery}

/** The reference query battery over unit corpus A (+ unicode doc), ported
  * from tests/unit/services/test_tantivy_search.py — see FIXTURES.md §4.
  * The index is built in reference-parity mode (codeAnalyzers = false). */
class FtsSearchSpec extends AnyFunSuite {

  private lazy val index: FtsIndex = {
    val spark = TestSpark.spark
    val root = TestSpark.tempDir("ftsidx")
    val df = TestSpark.docsDf(Fixtures.corpusA :+ Fixtures.unicodeDoc)
    FtsIndexBuilder.build(spark, df, root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4,
        codeAnalyzers = false))
    new FtsIndex(spark, root).warm()
  }

  private def search(q: FtsQuery) = index.searchCollected(q)

  test("basic term query returns matches with match_text") {
    val rs = search(FtsQuery("authenticate"))
    assert(rs.nonEmpty)
    assert(rs.forall(_.match_text.toLowerCase.contains("authenticate")))
    val paths = rs.map(_.path).toSet
    assert(paths.contains("src/auth.py") && paths.contains("src/utils.js"))
  }

  test("case-sensitive: CONFIG matches, differs from config") {
    val upper = search(FtsQuery("CONFIG", caseSensitive = true))
    val lower = search(FtsQuery("config", caseSensitive = true))
    assert(upper.nonEmpty)
    assert(upper != lower)
    // true case-preserving index: CONFIG only hits the doc with literal CONFIG
    assert(upper.exists(_.path == "src/config.py"))
  }

  test("case-insensitive: AUTHENTICATE == authenticate doc sets") {
    val u = search(FtsQuery("AUTHENTICATE"))
    val l = search(FtsQuery("authenticate"))
    assert(u.nonEmpty && l.nonEmpty)
    assert(u.map(_.path).toSet.intersect(l.map(_.path).toSet).nonEmpty)
  }

  test("fuzzy d=1 finds typo; exact d=0 rejects it") {
    val fuzzy = search(FtsQuery("authenticat", editDistance = 1))
    assert(fuzzy.nonEmpty)
    assert(fuzzy.exists(_.path == "src/auth.py"))
    assert(search(FtsQuery("authenticat")).isEmpty)
  }

  test("snippets: login_user has snippet, line, column") {
    val rs = search(FtsQuery("login_user", snippetLines = 5))
    assert(rs.nonEmpty)
    val r = rs.head
    assert(r.snippet.nonEmpty && r.line >= 1 && r.column >= 1)
    assert(r.snippet.contains("login_user"))
  }

  test("snippet_lines=0 disables snippets") {
    val rs = search(FtsQuery("authenticate", snippetLines = 0))
    assert(rs.nonEmpty && rs.forall(_.snippet.isEmpty))
  }

  test("language filter (facet path, verbatim values)") {
    val py = search(FtsQuery("authenticate", languages = Seq("python")))
    assert(py.nonEmpty && py.forall(_.language == "python"))
    val js = search(FtsQuery("authenticate", languages = Seq("javascript")))
    assert(js.nonEmpty && js.forall(_.language == "javascript"))
    assert(search(FtsQuery("authenticate", languages = Seq("unknownlang"))).isEmpty)
  }

  test("path filter */tests/* keeps only matching paths") {
    val rs = search(FtsQuery("login", pathFilters = Seq("*/tests/*")))
    assert(rs.forall(_.path.contains("tests")))
    // unanchored variant does match the fixture path
    val rs2 = search(FtsQuery("login", pathFilters = Seq("tests/*")))
    assert(rs2.nonEmpty && rs2.forall(_.path.startsWith("tests/")))
  }

  test("combined language + path filters") {
    val rs = search(FtsQuery("login", languages = Seq("python"),
      pathFilters = Seq("tests/*")))
    assert(rs.forall(r => r.language == "python" && r.path.contains("tests")))
  }

  test("limit caps result count") {
    assert(search(FtsQuery("login", limit = 1)).size <= 1)
    assert(search(FtsQuery("login", limit = 10)).size <= 10)
    val all = search(FtsQuery("login", limit = 10))
    val one = search(FtsQuery("login", limit = 1))
    assert(one.map(_.path) === all.map(_.path).take(1)) // top-k prefix property
  }

  test("multi-word AND: all terms must match") {
    assert(search(FtsQuery("glob pattern")).map(_.path) ===
      Seq("src/pattern_matcher.py"))
    assert(search(FtsQuery("gloc pattern")).isEmpty)
    assert(search(FtsQuery("login nonexistent_xyz123")).isEmpty)
  }

  test("multi-word fuzzy AND") {
    val rs = search(FtsQuery("gloc pattern", editDistance = 1))
    assert(rs.map(_.path) === Seq("src/pattern_matcher.py"))
    assert(search(FtsQuery("gloc nonexistent_xyz", editDistance = 1)).isEmpty)
  }

  test("no match returns empty") {
    assert(search(FtsQuery("nonexistent_term_xyz123")).isEmpty)
  }

  test("unicode: character-based line/column") {
    val rs = search(FtsQuery("function_name"))
    assert(rs.nonEmpty)
    val r = rs.find(_.path == "src/unicode.py").get
    assert(r.line === 2)
    assert(r.column === 5) // "def " is 4 chars; 1-indexed column 5
  }

  test("result row structure") {
    val r = search(FtsQuery("authenticate")).head
    assert(r.path.nonEmpty && r.language.nonEmpty && r.score > 0.0)
    assert(r.snippet_start_line >= 1)
  }

  test("limit=0 returns all matches with snippets off") {
    val rs = search(FtsQuery("def", limit = 0))
    assert(rs.size >= 3) // several fixture docs contain `def`
    assert(rs.forall(_.snippet.isEmpty))
  }

  test("regex: token-level full match, composes with filters") {
    val rs = search(FtsQuery("def", useRegex = true))
    assert(rs.nonEmpty)
    val prefix = search(FtsQuery("login.*", useRegex = true))
    assert(prefix.map(_.path).toSet ===
      Set("src/auth.py", "tests/test_auth.py"))
    val filtered = search(FtsQuery("login.*", useRegex = true,
      pathFilters = Seq("tests/*")))
    assert(filtered.map(_.path) === Seq("tests/test_auth.py"))
  }

  test("invalid regex raises") {
    intercept[IllegalArgumentException] {
      search(FtsQuery("[invalid(", useRegex = true))
    }
  }

  test("parameter validation") {
    intercept[IllegalArgumentException] {
      search(FtsQuery("x", useRegex = true, editDistance = 1))
    }
    intercept[IllegalArgumentException] { search(FtsQuery("x", editDistance = 4)) }
    intercept[IllegalArgumentException] { search(FtsQuery("x", snippetLines = 51)) }
  }

  test("deterministic ordering: score desc, doc_id asc") {
    val rs = search(FtsQuery("def", limit = 0))
    val sorted = rs.sortBy(r => (-r.score, r.doc_id))
    assert(rs === sorted)
  }
}

/** Language include/exclude precedence battery
  * (tests/unit/services/test_tantivy_language_filter.py). */
class FtsLanguageFilterSpec extends AnyFunSuite {

  private lazy val index: FtsIndex = {
    val spark = TestSpark.spark
    val root = TestSpark.tempDir("ftslang")
    FtsIndexBuilder.build(spark, TestSpark.docsDf(Fixtures.corpusLang), root,
      FtsIndexBuilder.Config(nShards = 2, segmentPartitions = 4,
        codeAnalyzers = false))
    new FtsIndex(spark, root).warm()
  }

  test("include by stored value") {
    val py = index.searchCollected(FtsQuery("test", languages = Seq("py")))
    assert(py.nonEmpty && py.forall(_.language == "py"))
    val js = index.searchCollected(FtsQuery("test", languages = Seq("js")))
    assert(js.nonEmpty && js.forall(_.language == "js"))
  }

  test("unknown language matches nothing; empty list unfiltered") {
    assert(index.searchCollected(
      FtsQuery("test", languages = Seq("unknownlang"))).isEmpty)
    val all = index.searchCollected(FtsQuery("test"))
    assert(all.map(_.language).toSet.size >= 3)
    assert(index.searchCollected(FtsQuery("test", languages = Nil)) === all)
  }

  test("exclusion wins over inclusion of the same language") {
    val rs = index.searchCollected(FtsQuery("test",
      languages = Seq("python"), excludeLanguages = Seq("python")))
    assert(rs.isEmpty)
  }

  test("include [python,javascript] exclude [javascript] => python only") {
    val rs = index.searchCollected(FtsQuery("test",
      languages = Seq("python", "javascript"),
      excludeLanguages = Seq("javascript")))
    assert(rs.nonEmpty)
    assert(rs.forall(r => Set("py", "pyw", "pyi").contains(r.language)))
  }

  test("exclude only") {
    val rs = index.searchCollected(FtsQuery("test",
      excludeLanguages = Seq("python")))
    assert(rs.nonEmpty && rs.forall(r => r.language != "py"))
  }
}
