package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL-surface registration: expose the engine's scalar helpers as Spark
  * SQL functions so `spark.sql(...)` users get the same primitives the
  * Dataset API uses (tokenizer, Damerau-Levenshtein, SimHash, glob match,
  * BM25 term weight). */
object GraftFunctions {

  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_tokenize",
      (s: String) => graft.analysis.Tokenizer.tokenize(s))
    spark.udf.register("graft_identifiers",
      (s: String) => graft.analysis.Tokenizer.identifiers(s))
    spark.udf.register("graft_split_ident",
      (s: String) => graft.analysis.Tokenizer.splitIdentifier(s))
    spark.udf.register("graft_damerau",
      (a: String, b: String, max: Int) =>
        Distance.damerauBounded(a, b, max))
    spark.udf.register("graft_simhash60",
      (s: String) => graft.ops.Dedup.simhash60(
        graft.analysis.Tokenizer.tokenize(s)))
    spark.udf.register("graft_hamming",
      (a: Long, b: Long) => graft.ops.Dedup.hamming(a, b))
    spark.udf.register("graft_glob_match",
      (path: String, glob: String) =>
        path.matches(PathGlob.toRegex(glob)))
    spark.udf.register("graft_bm25",
      (tf: Double, df: Long, dl: Long, n: Long, avgdl: Double) => {
        import graft.index.IndexBuilder.{K1, B}
        val idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))
      })
  }
}
