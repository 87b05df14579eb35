package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Tokenizer
import graft.functions.{Distance, PathGlob}
import graft.index.Codec

class TokenizerSpec extends AnyFunSuite {

  /** Deterministic seeded generator (scalacheck-free property loop). */
  private val rnd = new scala.util.Random(42)
  private val alphabet =
    "abcXYZ019 _():\n.é日\t-".toCharArray
  private def randomText(): String =
    Array.fill(rnd.nextInt(60))(alphabet(rnd.nextInt(alphabet.length))).mkString

  test("tantivy-default semantics: split, lowercase, drop >40") {
    assert(Tokenizer.tokenize("def login_user(username):") ===
      Seq("def", "login", "user", "username"))
    assert(Tokenizer.tokenize("Café résumé 日本語") ===
      Seq("café", "résumé", "日本語"))
    val long = "x" * 41
    assert(Tokenizer.tokenize(s"ok $long also") === Seq("ok", "also"))
    assert(Tokenizer.tokenize("") === Nil)
    assert(Tokenizer.tokenize("!!! ---") === Nil)
    assert(Tokenizer.tokenizeRaw("CONFIG_PATH ok") === Seq("CONFIG", "PATH", "ok"))
  }

  test("identifier extraction: first-occurrence dedup, cap") {
    assert(Tokenizer.identifiers("def f(x): return f(x) + g(y)") ===
      Seq("def", "f", "x", "return", "g", "y"))
    assert(Tokenizer.identifiers("9abc _x 9") === Seq("abc", "_x"))
  }

  test("identifier scanner == regex reference (property)") {
    val re = "[a-zA-Z_][a-zA-Z0-9_]*".r
    def reference(text: String): Seq[String] = {
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      val it = re.findAllIn(text)
      while (it.hasNext && seen.size < Tokenizer.MaxIdentifiers)
        seen += it.next()
      seen.toSeq
    }
    (1 to 500).foreach { _ =>
      val t = randomText()
      assert(Tokenizer.identifiers(t) === reference(t), s"text=<$t>")
    }
  }

  test("camelCase / snake_case splitting") {
    assert(Tokenizer.splitIdentifier("getUserName") === Seq("get", "user", "name"))
    assert(Tokenizer.splitIdentifier("HTTPServer") === Seq("http", "server"))
    assert(Tokenizer.splitIdentifier("parseJSON") === Seq("parse", "json"))
    assert(Tokenizer.splitIdentifier("foo_bar2") === Seq("foo", "bar2"))
    assert(Tokenizer.splitIdentifier("snake_case_name") === Seq("snake", "case", "name"))
    assert(Tokenizer.splitIdentifier("x") === Seq("x"))
  }

  test("identifier field stream: reference base + gapped subtokens") {
    // base = tokenize(join(ids)): login_user -> login,user at pos 0,1
    val base = Tokenizer.identifierFieldTokens(Seq("login_user"), codeAnalyzers = false)
    assert(base === Seq(("login", 0), ("user", 1)))
    // camel subtokens appended with gaps, never phrase-adjacent
    val code = Tokenizer.identifierFieldTokens(Seq("getUserName"), codeAnalyzers = true)
    assert(code.head === (("getusername", 0)))
    val subs = code.tail
    assert(subs.map(_._1) === Seq("get", "user", "name"))
    assert(subs.sliding(2).forall { case Seq(a, b) => b._2 - a._2 >= 2; case _ => true })
  }

  test("scala tokenizer == catalyst tokenArray column expression") {
    val s = TestSpark.spark
    import s.implicits._
    import org.apache.spark.sql.functions.col
    val texts = Seq.fill(40)(randomText()) :+ "" :+ "él_día 日本語 x" :+ ("y" * 41)
    val df = texts.map(Tuple1(_)).toDF("content")
      .select(col("content"),
        graft.index.IndexBuilder.tokenArray(col("content")).as("t"))
      .collect()
    df.foreach { row =>
      val text = row.getString(0)
      assert(Tokenizer.tokenize(text) === row.getSeq[String](1),
        s"for input ${text.take(80)}")
    }
  }

  test("codec round-trips") {
    (1 to 50).foreach { _ =>
      val xs = Array.fill(1 + rnd.nextInt(200))(math.abs(rnd.nextLong()) >> 13)
      val sorted = xs.distinct.sorted
      val deltas = Codec.encodeDeltas(sorted)
      assert(Codec.decodeDeltas(deltas, sorted.length).toSeq === sorted.toSeq)
      assert(Codec.decodeVarints(Codec.encodeVarints(xs), xs.length).toSeq === xs.toSeq)
    }
  }

  test("damerau distance: transpositions cost one") {
    assert(Distance.damerauBounded("glob", "gloc", 1) === 1)
    assert(Distance.damerauBounded("abcd", "abdc", 2) === 1) // transposition
    assert(Distance.damerauBounded("authenticate", "authenticat", 1) === 1)
    assert(Distance.damerauBounded("same", "same", 0) === 0)
    assert(Distance.damerauBounded("abc", "xyz", 2) > 2) // early exit
  }

  test("gitwildmatch glob semantics") {
    def m(glob: String, path: String): Boolean =
      path.matches(PathGlob.toRegex(glob))
    assert(m("*/tests/*", "src/tests/test.py"))
    assert(!m("*/tests/*", "src/module.py"))
    assert(!m("*/tests/*", "tests/test_auth.py")) // anchored: needs a leading segment
    assert(m("*.py", "src/deep/auth.py")) // unanchored matches at depth
    assert(m("*.py", "auth.py"))
    assert(!m("*.py", "auth.pyc"))
    assert(m("src/**", "src/a/b/c.py"))
    assert(m("code/src/**/*.java", "code/src/Main.java"))
    assert(m("code/src/**/*.java", "code/src/util/Helper.java"))
    assert(m("src/*", "src/a/b.py")) // dir match implies contents
    assert(!m("", "anything"))
  }
}
