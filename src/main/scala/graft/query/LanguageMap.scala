package graft.query

/** Friendly language name -> file-extension set, replicating the reference's
  * LanguageMapper semantics (reference: services/language_mapper.py +
  * utils/yaml_utils.py:10-56): queries say "python", the stored language
  * field holds bare extensions ("py"), unknown names pass through unchanged
  * so they simply match nothing unless the corpus stores that literal label.
  * Resolved driver-side once per query and embedded in an `isin` filter.
  */
object LanguageMap {

  private val table: Map[String, Set[String]] = Map(
    "python" -> Set("py", "pyw", "pyi"),
    "javascript" -> Set("js", "jsx", "mjs", "cjs"),
    "typescript" -> Set("ts", "tsx"),
    "java" -> Set("java"),
    "go" -> Set("go"),
    "rust" -> Set("rs"),
    "c" -> Set("c", "h"),
    "cpp" -> Set("cpp", "cc", "cxx", "hpp", "hh", "hxx"),
    "csharp" -> Set("cs"),
    "ruby" -> Set("rb"),
    "php" -> Set("php"),
    "swift" -> Set("swift"),
    "kotlin" -> Set("kt", "kts"),
    "scala" -> Set("scala", "sc"),
    "shell" -> Set("sh", "bash", "zsh"),
    "html" -> Set("html", "htm"),
    "css" -> Set("css", "scss", "sass", "less"),
    "sql" -> Set("sql"),
    "yaml" -> Set("yaml", "yml"),
    "json" -> Set("json"),
    "xml" -> Set("xml"),
    "markdown" -> Set("md", "markdown"),
    "perl" -> Set("pl", "pm"),
    "lua" -> Set("lua"),
    "r" -> Set("r"),
    "haskell" -> Set("hs"),
    "elixir" -> Set("ex", "exs"),
  )

  /** Expand one name to its extensions; unknown names pass through
    * (reference behavior: unknown language filters match nothing real). */
  def extensions(name: String): Set[String] = {
    val n = name.toLowerCase(java.util.Locale.ROOT)
    table.getOrElse(n, Set(n))
  }

  def extensions(names: Seq[String]): Set[String] =
    names.iterator.flatMap(extensions).toSet
}
