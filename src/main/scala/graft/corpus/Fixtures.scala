package graft.corpus

/** Literal test corpora mirroring the reference's FTS unit/e2e fixtures
  * (FIXTURES.md; reference: tests/unit/services/test_tantivy_search.py:33-72
  * and :430-444, tests/unit/services/test_tantivy_language_filter.py:28-97,
  * tests/e2e/test_fts_query_e2e.py:30-68). Used by the ScalaTest oracle
  * suite to assert reference-identical query behavior.
  */
object Fixtures {

  final case class Doc(repo: String, path: String, commit: String,
                       lang: String, content: String,
                       identifiers: Seq[String])

  private val C = "a" * 40

  /** Unit corpus A — the 4+1 doc sample set (test_tantivy_search.py). */
  val corpusA: Seq[Doc] = Seq(
    Doc("test_repo", "src/auth.py", C, "python",
      "def login_user(username, password):\n    authenticate(username, password)\n    return session",
      Seq("login_user", "authenticate", "session")),
    Doc("test_repo", "src/config.py", C, "python",
      "CONFIG_PATH = '/etc/app/config'\nclass Configuration:\n    pass",
      Seq("CONFIG_PATH", "Configuration")),
    Doc("test_repo", "tests/test_auth.py", C, "python",
      "def test_login():\n    user = login_user('test', 'pass')\n    assert user is not None",
      Seq("test_login", "login_user")),
    Doc("test_repo", "src/utils.js", C, "javascript",
      "function authenticate(user, pass) {\n  return validateCredentials(user, pass);\n}",
      Seq("authenticate", "validateCredentials")),
    Doc("test_repo", "src/pattern_matcher.py", C, "python",
      "def match_glob_pattern(pattern):\n    return glob.glob(pattern)",
      Seq("match_glob_pattern", "glob")),
  )

  /** Unicode fixture (test_tantivy_search.py:319-330): asserts line=2 and
    * character-based (not byte) column for `function_name`. */
  val unicodeDoc: Doc =
    Doc("test_repo", "src/unicode.py", C, "python",
      "# Café résumé\ndef function_name():\n    return '日本語'",
      Seq("function_name"))

  /** Language-filter corpus (test_tantivy_language_filter.py:28-97):
    * stored language = bare extension. */
  val corpusLang: Seq[Doc] = Seq(
    Doc("test_repo", "src/main.py", C, "py",
      "def test_function(): pass", Seq("test_function")),
    Doc("test_repo", "src/utils.py", C, "py",
      "class TestClass: pass", Seq("TestClass")),
    Doc("test_repo", "src/app.js", C, "js",
      "function test() { return 42; }", Seq("test")),
    Doc("test_repo", "src/component.tsx", C, "tsx",
      "const TestComponent = () => <div>Test</div>;", Seq("TestComponent")),
    Doc("test_repo", "src/Main.java", C, "java",
      "public class Main { public static void test() {} }",
      Seq("Main", "test")),
  )

  /** E2E corpus B — 3 whole files (test_fts_query_e2e.py:30-68), indexed
    * per-file with identifiers=["test"] like the e2e harness (:83-96). */
  val corpusB: Seq[Doc] = Seq(
    Doc("test_repo", "auth.py", C, "python",
      """def authenticate_user(username, password):
        |    '''Authenticate a user with username and password.'''
        |    if not username or not password:
        |        raise ValueError("Username and password required")
        |    return validate_credentials(username, password)
        |
        |def validate_credentials(username, password):
        |    '''Validate user credentials against database.'''
        |    return username == "admin" and password == "secret"
        |""".stripMargin, Seq("test")),
    Doc("test_repo", "config.py", C, "python",
      """CONFIG_PATH = "/etc/app/config.json"
        |DATABASE_URL = "postgresql://localhost:5432/mydb"
        |
        |class Configuration:
        |    def __init__(self):
        |        self.debug = False
        |        self.port = 8080
        |""".stripMargin, Seq("test")),
    Doc("test_repo", "utils.py", C, "python",
      """import hashlib
        |
        |def calculate_hash(data):
        |    '''Calculate SHA256 hash of data.'''
        |    return hashlib.sha256(data.encode()).hexdigest()
        |
        |def format_timestamp(ts):
        |    '''Format timestamp to ISO format.'''
        |    return ts.isoformat()
        |""".stripMargin, Seq("test")),
  )
}
