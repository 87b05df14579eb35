package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.query.Snippets

/** SQL function registration + the fuzzy snippet fallback
  * (reference: test_tantivy_fuzzy_snippet.py — a typo'd query must still
  * produce a positioned match via approximate string matching). */
class FunctionsSpec extends AnyFunSuite {

  test("registered SQL functions work through spark.sql") {
    val spark = TestSpark.spark
    graft.functions.GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT graft_tokenize('def login_user(x):') AS t,
        |       graft_damerau('glob', 'gloc', 1) AS d,
        |       graft_glob_match('src/tests/a.py', '*/tests/*') AS g,
        |       round(graft_bm25(2.0, 3, 90, 500, 100.0), 4) AS s,
        |       graft_hamming(graft_simhash60('a b c'),
        |                     graft_simhash60('a b c')) AS h
        |""".stripMargin).collect()(0)
    assert(row.getSeq[String](0) === Seq("def", "login", "user", "x"))
    assert(row.getInt(1) === 1)
    assert(row.getBoolean(2))
    assert(row.getDouble(3) > 0)
    assert(row.getInt(4) === 0)
  }

  test("fuzzy snippet fallback finds approximate match position") {
    val content = "def login():\n    authenticate(user)\n    return ok"
    // literal find fails ("authentcate" is a typo), fuzzy >= 0.6 succeeds
    val m = Snippets.findMatch(content, "authentcate",
      caseSensitive = false, editDistance = 1)
    assert(m.nonEmpty)
    val e = Snippets.extractSnippet(content, m.get.start, 1)
    assert(e.line === 2) // the authenticate line
    assert(m.get.text.toLowerCase.contains("authent"))
  }

  test("ratcliff-obershelp ratio matches difflib semantics") {
    assert(Snippets.ratio("abc", "abc") === 1.0)
    assert(Snippets.ratio("", "") === 1.0)
    assert(Snippets.ratio("abcd", "bcde") === 0.75) // 2*3/(4+4)
    assert(Snippets.ratio("abc", "xyz") === 0.0)
  }
}
