package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PathGlob
import graft.sources.Discovery

/** Gitignore ingestion (reference: indexing/file_finder.py:112-149 —
  * root .gitignore verbatim, ONE nested level with directory prefixing,
  * leading-'/' lines left untouched) feeding the S3 exclude filter. */
class GitignoreSpec extends AnyFunSuite {

  private def spark = TestSpark.spark

  test("leading-slash glob anchors at the path root (gitwildmatch)") {
    val m = PathGlob.anyMatcher(Seq("/dist"))
    assert(m("dist"))
    assert(m("dist/bundle.js"))
    assert(!m("src/dist/bundle.js"), "/dist must not match nested dist")
    // without the slash the same name matches at any depth
    val m2 = PathGlob.anyMatcher(Seq("dist"))
    assert(m2("src/dist/bundle.js"))
  }

  test("gitignorePatterns: comments and blanks skipped, root lines " +
       "verbatim, root negations split out") {
    val body =
      """# build artifacts
        |dist/
        |*.log
        |
        |/coverage
        |!keep.log
        |""".stripMargin
    val (excl, neg) = Discovery.gitignorePatterns(body)
    assert(excl === Seq("dist/", "*.log", "/coverage"))
    assert(neg === Seq("keep.log"))
  }

  test("gitignorePatterns: nested lines get the directory prefix UNLESS " +
       "they start with '/' (reference quirk preserved)") {
    val body =
      """build
        |/generated
        |!cache
        |""".stripMargin
    val (excl, neg) = Discovery.gitignorePatterns(body, "services/api")
    // '/generated' is NOT prefixed (file_finder.py:131-135 only prefixes
    // lines that don't start with '/'), and the nested '!cache' line is
    // prefixed FIRST — 'services/api/!cache' — so it is a literal
    // pattern, not a negation, exactly like the reference's
    // prefix-then-parse
    assert(excl === Seq("services/api/build", "/generated",
      "services/api/!cache"))
    assert(neg === Nil)
  }

  test("gitignoreRulesAll collects root + one-level .gitignore files in " +
       "order, skipping the reference's pruned dirs") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      (".gitignore", "*.log\n!keep.log\n"),
      ("web/.gitignore", "bundle/\n"),
      ("node_modules/.gitignore", "everything\n"), // pruned dir: skipped
      ("a/b/.gitignore", "too_deep\n"), // two levels: never read
      ("src/main.py", "print(1)")).toDF("path", "content")
    val rules = Discovery.gitignoreRulesAll(files)
    assert(rules === Seq(
      Discovery.GitignoreRule("*.log", negation = false),
      Discovery.GitignoreRule("keep.log", negation = true),
      Discovery.GitignoreRule("web/bundle/", negation = false)))
  }

  test("gitignoreExcludedColumn is LAST-match-wins: a later exclude " +
       "overrides an earlier negation (git pathspec semantics)") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      "a.go", "keep.go", "src/app.py").toDF("path")
    // git: `!keep.go` followed by `*.go` — the later *.go line wins, so
    // keep.go IS excluded (the pre-r5 excluded-and-not-negated
    // composition wrongly resurrected it)
    val rules = Discovery.gitignoreRules("!keep.go\n*.go\n")
    val kept = files.where(!Discovery.gitignoreExcludedColumn(rules))
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("src/app.py"))
    // and in the reverse order the negation is last and re-includes
    val rules2 = Discovery.gitignoreRules("*.go\n!keep.go\n")
    val kept2 = files.where(!Discovery.gitignoreExcludedColumn(rules2))
      .collect().map(_.getString(0)).toSet
    assert(kept2 === Set("keep.go", "src/app.py"))
  }

  test("gitignoreExcludedColumn interleaved rules: a/*, !a/keep, a/keep2 " +
       "(the VERDICT r04 divergence case)") {
    val sp = spark
    import sp.implicits._
    val files = Seq("a/x.txt", "a/keep", "a/keep2", "b/y.txt").toDF("path")
    val rules = Discovery.gitignoreRules("a/*\n!a/keep\na/keep2\n")
    val kept = files.where(!Discovery.gitignoreExcludedColumn(rules))
      .collect().map(_.getString(0)).toSet
    // a/keep re-included by the negation; a/keep2 matches the negation?
    // no — `!a/keep` matches only the keep file (dir-or-exact semantics
    // give `a/keep(/.*)?`); a/keep2 is re-excluded by the final line
    // anyway; b/y.txt never matched
    assert(kept === Set("a/keep", "b/y.txt"))
  }

  test("a generated thousand-line gitignore collapses to one CASE WHEN " +
       "per polarity RUN (3 here), not per line — a corpus-sized ignore " +
       "file cannot blow Catalyst's recursion or leave codegen") {
    val sp = spark
    import sp.implicits._
    // 1500 excludes, one negation, 1501 more excludes = 3 polarity runs
    val rules =
      (0 until 1500).map(i => Discovery.GitignoreRule(s"gen$i/*", false)) ++
      Seq(Discovery.GitignoreRule("gen7/keep.go", true)) ++
      (0 until 1500).map(i => Discovery.GitignoreRule(s"more$i/*", false)) :+
      Discovery.GitignoreRule("more3/a.go", false)
    val excluded = Discovery.gitignoreExcludedColumn(rules)
    val whens = "(?i)CASE WHEN".r.findAllIn(excluded.toString).size
    assert(whens === 3,
      s"expected 3 collapsed polarity runs, got $whens CASE WHEN nodes")
    val paths = Seq("gen7/keep.go", "gen7/other.go", "more3/a.go",
      "untouched/x.go", "gen1499/z.py", "more1499/z.py")
    val kept = paths.toDF("path").where(!excluded)
      .collect().map(_.getString(0)).toSet
    // gen7/keep.go: excluded by run 1, re-included by the negation, and
    // no later run matches it — last-match-wins keeps it
    assert(kept === Set("gen7/keep.go", "untouched/x.go"))
  }

  test("excludePathFilter composes gitignore patterns: excludes, " +
       "negation re-includes, defaults still apply") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      "src/app.py", "debug.log", "logs/run.log", "keep.log",
      "web/bundle/x.js", "other/bundle/x.js",
      "node_modules/lib/index.js").toDF("path")
    val kept = files.where(Discovery.excludePathFilter(
        extraGlobs = Seq("*.log", "web/bundle/**"),
        negGlobs = Seq("keep.log")))
      .collect().map(_.getString(0)).toSet
    assert(kept === Set("src/app.py", "keep.log", "other/bundle/x.js"))
  }

  test("seeded fuzz: gitignoreExcludedColumn equals a driver-side " +
       "last-match-wins reference evaluator on random rules and paths") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(20260817L)
    val segs = Seq("src", "a", "b", "keep", "deep", "x1", "y2")
    val exts = Seq("go", "py", "js", "log")
    def randPath(): String =
      (0 until (1 + rnd.nextInt(3))).map(_ => segs(rnd.nextInt(segs.size)))
        .mkString("/") + "." + exts(rnd.nextInt(exts.size))
    def randPattern(): String = {
      val base = rnd.nextInt(5) match {
        case 0 => s"*.${exts(rnd.nextInt(exts.size))}"
        case 1 => segs(rnd.nextInt(segs.size)) + "/"
        case 2 => s"/${segs(rnd.nextInt(segs.size))}"
        case 3 => s"**/${segs(rnd.nextInt(segs.size))}/*"
        case _ => s"${segs(rnd.nextInt(segs.size))}/" +
          s"${segs(rnd.nextInt(segs.size))}*"
      }
      base
    }
    (0 until 25).foreach { round =>
      val rules = (0 until (2 + rnd.nextInt(6))).map(_ =>
        Discovery.GitignoreRule(randPattern(), rnd.nextBoolean()))
      val paths = (0 until 40).map(_ => randPath()).distinct
      // driver-side reference: literal last-match-wins over the rule list
      val matchers = rules.map(r =>
        (PathGlob.anyMatcher(Seq(r.pattern)), r.negation))
      def refExcluded(p: String): Boolean =
        matchers.foldLeft(false) { case (acc, (m, neg)) =>
          if (m(p)) !neg else acc
        }
      val kept = paths.toDF("path")
        .where(!Discovery.gitignoreExcludedColumn(rules))
        .collect().map(_.getString(0)).toSet
      val refKept = paths.filterNot(refExcluded).toSet
      assert(kept === refKept,
        s"round $round diverged for rules=$rules\n" +
          s"column-only=${kept -- refKept} ref-only=${refKept -- kept}")
    }
  }

  test("multi-repo tables: one repo's gitignore rules never filter " +
       "another repo's files") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      ("repoA", ".gitignore", "docs/\n"),
      ("repoA", "docs/guide.md", "x"),
      ("repoA", "src/a.py", "x"),
      ("repoB", "docs/guide.md", "x"), // same path shape, NO gitignore
      ("repoB", "src/b.py", "x")).toDF("repo", "path", "content")
    val kept = files.where(Discovery.gitignoreExcludeFilter(files))
      .select("repo", "path").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(kept === Set(
      ("repoA", ".gitignore"), ("repoA", "src/a.py"),
      ("repoB", "docs/guide.md"), ("repoB", "src/b.py")))
  }

  test("a gitignore negation cannot resurrect a structurally excluded " +
       "dir (defaults are unconditional, like the reference's skip set)") {
    val sp = spark
    import sp.implicits._
    val files = Seq(
      "node_modules/lib/index.js", "src/index.js", "dist/index.js")
      .toDF("path")
    val kept = files.where(Discovery.excludePathFilter(
        extraGlobs = Seq("*.js"),
        negGlobs = Seq("**/index.js"))) // re-includes .js — but NOT under
      .collect().map(_.getString(0)).toSet // the pruned default dirs
    assert(kept === Set("src/index.js"))
  }
}
