package graft.functions

/** Damerau-Levenshtein distance with transpositions costing one edit
  * (optimal string alignment variant) — the fuzzy-query metric of the
  * reference engine, which passes `transposition_cost_one=True`
  * (reference: services/tantivy_index_manager.py:353-374). Spark's
  * built-in `levenshtein` lacks transpositions, so fuzzy expansion uses
  * this helper (and a bounded early-exit since d ≤ 3 always).
  */
object Distance {

  /** OSA Damerau-Levenshtein, early-exiting once the distance must exceed
    * `maxDist` (returns maxDist + 1 in that case). */
  def damerauBounded(a: String, b: String, maxDist: Int): Int = {
    val la = a.length
    val lb = b.length
    if (math.abs(la - lb) > maxDist) return maxDist + 1
    if (la == 0) return lb
    if (lb == 0) return la
    // three rolling rows for OSA
    var prev2 = new Array[Int](lb + 1)
    var prev = new Array[Int](lb + 1)
    var cur = new Array[Int](lb + 1)
    var j = 0
    while (j <= lb) { prev(j) = j; j += 1 }
    var i = 1
    while (i <= la) {
      cur(0) = i
      var rowMin = cur(0)
      var jj = 1
      while (jj <= lb) {
        val cost = if (a.charAt(i - 1) == b.charAt(jj - 1)) 0 else 1
        var d = math.min(math.min(cur(jj - 1) + 1, prev(jj) + 1),
          prev(jj - 1) + cost)
        if (i > 1 && jj > 1 &&
            a.charAt(i - 1) == b.charAt(jj - 2) &&
            a.charAt(i - 2) == b.charAt(jj - 1)) {
          d = math.min(d, prev2(jj - 2) + 1)
        }
        cur(jj) = d
        if (d < rowMin) rowMin = d
        jj += 1
      }
      if (rowMin > maxDist) return maxDist + 1
      val t = prev2; prev2 = prev; prev = cur; cur = t
      i += 1
    }
    prev(lb)
  }

  /** 64-bit character-class bitmap of a string (codepoint & 63 per char).
    * Stored per dictionary term at build time; a NECESSARY condition for
    * damerauBounded(t, w, d) <= d is
    * `bit_count(charMask(t) & ~charMask(w)) <= d` — every edit introduces
    * at most one character class into `t` that `w` lacks (a transposition
    * introduces none). Used as a codegen-able dict prefilter so fuzzy
    * expansion does not run the O(len^2) UDF over the whole dictionary. */
  def charMask(s: String): Long = {
    var m = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      m |= (1L << (cp & 63))
      i += Character.charCount(cp)
    }
    m
  }
}

/** gitwildmatch-style glob -> Java regex compilation, for the reference's
  * path include/exclude filters (reference: services/path_pattern_matcher.py
  * uses pathspec's `gitwildmatch`; patterns like star-slash-tests-slash-star
  * or double-star globs). Compiled once driver-side per query and embedded
  * in an `rlike`/closure predicate.
  *
  * gitwildmatch rules implemented: a pattern containing a slash is anchored
  * at the path root, one without matches at any depth (implicit leading
  * double-star); single star and `?` never cross a slash while double-star
  * crosses segments (leading, trailing, or mid-pattern); `[seq]` and
  * `[!seq]` classes; and a pattern that matches a directory matches
  * everything beneath it.
  */
object PathGlob {

  def toRegex(glob: String): String = {
    val trimmed = glob.trim
    if (trimmed.isEmpty) return "(?!)" // matches nothing
    val noDir = trimmed.stripSuffix("/")
    // gitwildmatch: a leading '/' anchors the pattern at the path root
    // (gitignore "/dist" matches only the top-level dist)
    val rooted = noDir.startsWith("/")
    val p = if (rooted) noDir.drop(1) else noDir
    if (p.isEmpty) return "(?!)"
    val segs = p.split("/", -1).toList
    val anchored = rooted || segs.length > 1
    val sb = new StringBuilder
    sb.append(if (anchored) "^" else "^(?:[^/]+/)*")

    def segRegex(seg: String): String = {
      val out = new StringBuilder
      var i = 0
      while (i < seg.length) {
        seg.charAt(i) match {
          case '*' => out.append("[^/]*")
          case '?' => out.append("[^/]")
          case '[' =>
            val close = seg.indexOf(']', i + 1)
            if (close < 0) { out.append("\\[") }
            else {
              val inner = seg.substring(i + 1, close)
              val body = if (inner.startsWith("!")) "^" + inner.drop(1) else inner
              out.append("[").append(body).append("]")
              i = close
            }
          case c if "\\.(){}+-^$|".indexOf(c) >= 0 => out.append('\\').append(c)
          case c => out.append(c)
        }
        i += 1
      }
      out.toString
    }

    def emit(list: List[String]): Unit = list match {
      case Nil =>
      case "**" :: Nil => sb.append(".*")
      case "**" :: rest => sb.append("(?:[^/]+/)*"); emit(rest)
      case seg :: Nil => sb.append(segRegex(seg))
      case seg :: rest => sb.append(segRegex(seg)).append("/"); emit(rest)
    }
    emit(segs)
    sb.append("(?:/.*)?$")
    sb.toString
  }

  /** Compile a pattern list to one predicate (OR semantics, reference
    * matches_any_pattern). Invalid patterns are skipped like the reference
    * (path_pattern_matcher.py:198-200). */
  def anyMatcher(patterns: Seq[String]): String => Boolean = {
    val compiled = patterns.flatMap { p =>
      try Some(java.util.regex.Pattern.compile(toRegex(p)))
      catch { case _: Exception => None }
    }
    path => compiled.exists(_.matcher(path).matches())
  }

  /** The same OR-of-globs as [[anyMatcher]], as ONE `|`-joined regex for a
    * codegen'd `rlike` predicate (each branch is ^...$-anchored, so
    * rlike's find() semantics equal full match). None when no pattern is
    * valid — matches nothing, like anyMatcher on the same input. */
  def anyRegex(patterns: Seq[String]): Option[String] = {
    val valid = patterns.flatMap { p =>
      val r = toRegex(p)
      try { java.util.regex.Pattern.compile(r); Some(r) }
      catch { case _: Exception => None }
    }
    if (valid.isEmpty) None else Some(valid.map(r => s"(?:$r)").mkString("|"))
  }
}
