package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract wiring for the training-data-pipeline operators:
  * Spark query per op + DuckDB oracle twin (same tables, same hashes). */
object OpsQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")
  private def emb(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/embeddings.parquet")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dd_exact" -> ((s, d) => Dedup.exact(docs(s, d))),
    "dd_minhash" -> ((s, d) => Dedup.minhashSignatures(docs(s, d))),
    "dd_lsh_pairs" -> ((s, d) => Dedup.lshCandidatePairs(docs(s, d))),
    "dd_jaccard" -> ((s, d) => {
      val dd = docs(s, d)
      Dedup.jaccard(dd, Dedup.lshCandidatePairs(dd))
    }),
    "dd_simhash_neardups" -> ((s, d) =>
      Dedup.simhashNearDups(docs(s, d), maxDist = 3)),
    // embedding-cosine near-dups via multi-band RH-LSH: the fixture has no
    // natural near pairs (max pairwise cosine ~0.51), so the contract
    // query plants them — a float-scaled copy of each of the first 20
    // vectors (scaling preserves every hyperplane sign, and a single
    // float multiply is exact through double arithmetic, so the DuckDB
    // twin reproduces the buckets and sims bit-exactly)
    "dd_embedding_neardups" -> ((s, d) => {
      val e = emb(s, d)
      val dup = e.where(col("vec_id") < 20)
        .select((col("vec_id") + 10000).as("vec_id"),
          transform(col("embedding"), x => x * lit(1.01f)).as("embedding"),
          col("label"))
      Dedup.embeddingNearDups(e.unionByName(dup), threshold = 0.9)
    }),
    "ta_quality" -> ((s, d) => TextAnalysis.quality(docs(s, d))),
    "ta_tokens" -> ((s, d) => TextAnalysis.tokenCounts(docs(s, d))),
    "ta_langid" -> ((s, d) => TextAnalysis.langId(docs(s, d))),
    "ta_fingerprint" -> ((s, d) => TextAnalysis.fingerprint(docs(s, d))),
    "ann_topk" -> ((s, d) => Ann.bruteForceTopK(emb(s, d), 5, 5)),
    // the reference's --min-score semantic threshold (cli.py:4236): same
    // exact scan, hits below the cosine floor dropped BEFORE the k-cap —
    // at 0.3 the fixture's queries keep 1-7 neighbors each, so both the
    // floor and the cap are exercised
    "ann_minscore" -> ((s, d) =>
      Ann.bruteForceTopK(emb(s, d), 5, 5, minScore = Some(0.3))),
    // hybrid search's semantic half (SURVEY Q15): literal-query-vector
    // cosine top-k; the FTS half is the DuckDB-oracled engine itself
    "hybrid_semantic" -> ((s, d) => {
      val e = emb(s, d)
      val qv = e.where(col("vec_id") === 0)
        .select("embedding").collect()(0).getSeq[Float](0).toArray
      val st = s
      import st.implicits._
      graft.query.Hybrid.semanticTopK(e, qv, 10)
        .map(h => (h.vec_id, h.sim)).toDF("vec_id", "sim")
    }),
    "ann_lsh_topk" -> ((s, d) => Ann.lshTopK(emb(s, d), 5, 5)),
    "ann_ivf_topk" -> ((s, d) => Ann.ivfTopK(emb(s, d), 5, 5)),
    // multimodal feature extraction, one row per (media, feature index),
    // split per kind so each decode kernel gets its own hard DuckDB oracle
    // (image: real PNG decode; audio: real RIFF/WAVE parse; video: real
    // YUV4MPEG2 demux — all three deterministic integer math whose
    // float32 outputs the oracle reproduces bit-exactly)
    "mm_image_features" -> ((s, d) => mmKind(s, d, "image")),
    "mm_audio_features" -> ((s, d) => mmKind(s, d, "audio")),
    "mm_video_features" -> ((s, d) => mmKind(s, d, "video")),
  )

  private def mmKind(s: SparkSession, d: String, kind: String): DataFrame = {
    val st = s
    import st.implicits._
    Multimodal.extractFeatures(Multimodal.syntheticMedia(s, d, 32))
      .filter(_.kind == kind)
      .flatMap(f => f.features.zipWithIndex.map { case (v, i) =>
        (f.media_id, i, v.toDouble) })
      .toDF("media_id", "fidx", "val")
  }
}

object OpsOracle {

  private val tokensSql =
    """list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
      |            x -> x <> '' AND length(x) <= 40)""".stripMargin

  private val shinglesCte =
    s"""sh AS (
       |  SELECT DISTINCT doc_id,
       |    unnest(list_transform(range(0, greatest(len(toks) - 2, 0)),
       |      i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingle
       |  FROM (SELECT doc_id, $tokensSql AS toks FROM documents)
       |  WHERE len(toks) >= 3
       |)""".stripMargin

  private def h64(expr: String): String = PortableHash.hash64Sql(expr)

  private val sigCte =
    s"""sig AS (
       |  SELECT doc_id, CAST(seed AS INTEGER) AS seed,
       |         min(${h64("shingle || '#' || CAST(seed AS VARCHAR)")}) AS minhash
       |  FROM sh CROSS JOIN (SELECT unnest(range(0, ${Dedup.NumSeeds})) AS seed)
       |  GROUP BY 1, 2
       |)""".stripMargin

  private val bandCte =
    s"""band AS (
       |  SELECT doc_id, CAST(floor(seed / ${Dedup.BandRows}) AS INTEGER) AS band,
       |         md5(string_agg(CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR), '_'
       |             ORDER BY CAST(seed AS VARCHAR) || ':' || CAST(minhash AS VARCHAR))) AS bkey
       |  FROM sig GROUP BY 1, 2
       |)""".stripMargin

  private val pairsCte =
    """pairs AS (
      |  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      |  FROM band l JOIN band r
      |    ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
      |)""".stripMargin

  private def cosSql(a: String, b: String): String =
    s"""(list_dot_product($a, $b) /
       | (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))))""".stripMargin

  /** Literal DuckDB list for one hyperplane's +-1 components. */
  private def planeList(p: Int): String =
    Ann.signMatrix(p).map(v => if (v > 0) "1.0" else "-1.0")
      .mkString("[", ", ", "]")

  /** Same, from the first-n sign matrix (multi-band LSH twin). */
  private def planeListN(m: Array[Array[Double]], p: Int): String =
    m(p).map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")

  /** DuckDB twin of [[Dedup.embeddingNearDups]] over the planted-dup
    * input: 4 bands x 6 planes band keys, equi-join on (band, bkey),
    * cosine >= 0.9 on rounded sims. */
  private val ddEmbeddingSql: String = {
    val nBands = 4; val ppb = 6
    val m = Ann.signMatrixN(nBands * ppb)
    val bandSelects = (0 until nBands).map { q =>
      val bits = (0 until ppb).map { j =>
        s"(CASE WHEN list_dot_product(de, ${planeListN(m, q * ppb + j)}) >= 0 THEN ${1L << j} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id, de, $q AS q, ($bits) AS qv FROM aug"
    }.mkString("\n  UNION ALL ")
    s"""WITH aug AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings
       |  UNION ALL
       |  SELECT vec_id + 10000,
       |    CAST(list_transform(CAST(embedding AS REAL[]),
       |      x -> CAST(x * CAST(1.01 AS REAL) AS REAL)) AS DOUBLE[])
       |  FROM embeddings WHERE vec_id < 20
       |),
       |bands AS (
       |  $bandSelects
       |)
       |SELECT DISTINCT l.vec_id AS a, r.vec_id AS b,
       |  round(${cosSql("l.de", "r.de")}, 4) AS sim
       |FROM bands l JOIN bands r ON l.q = r.q AND l.qv = r.qv
       |  AND l.vec_id < r.vec_id
       |WHERE round(${cosSql("l.de", "r.de")}, 4) >= 0.9""".stripMargin
  }

  private val bucketExpr: String =
    (0 until Ann.NumPlanes).map { p =>
      s"(CASE WHEN list_dot_product(de, ${planeList(p)}) >= 0 THEN ${1L << p} ELSE 0 END)"
    }.mkString(" + ")

  /** DuckDB twin of [[Dedup.simhashNearDups]]: same 60-bit simhash (the
    * portable md5 hash votes +-tf per bit), same [[Dedup.bandSpec]]
    * banding, hamming via bit_count(xor). */
  private def simhashSql(maxDist: Int): String = {
    val bands = Dedup.bandSpec(maxDist).zipWithIndex.map { case ((off, w), bi) =>
      s"SELECT doc_id, sh, $bi AS q, (sh >> $off) & ${(1L << w) - 1} AS qv FROM sh"
    }.mkString("\n  UNION ALL ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest($tokensSql) AS t FROM documents
       |),
       |tf AS (SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2),
       |votes AS (
       |  SELECT doc_id, i,
       |    sum(CASE WHEN (${h64("t")} >> i) & 1 = 1 THEN tf ELSE -tf END) AS v
       |  FROM tf CROSS JOIN (SELECT unnest(range(0, ${Dedup.SimhashBits})) AS i)
       |  GROUP BY 1, 2
       |),
       |shx AS (
       |  SELECT doc_id,
       |    CAST(sum(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << i)
       |             ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS sh
       |  FROM votes GROUP BY 1
       |),
       |sh AS (
       |  SELECT d.doc_id, coalesce(s.sh, 0) AS sh
       |  FROM (SELECT DISTINCT doc_id FROM documents) d
       |  LEFT JOIN shx s USING (doc_id)
       |),
       |bands AS (
       |  $bands
       |)
       |SELECT DISTINCT l.doc_id AS a, r.doc_id AS b,
       |  CAST(bit_count(xor(l.sh, r.sh)) AS INTEGER) AS dist
       |FROM bands l JOIN bands r ON l.q = r.q AND l.qv = r.qv
       |  AND l.doc_id < r.doc_id
       |WHERE bit_count(xor(l.sh, r.sh)) <= $maxDist""".stripMargin
  }

  // ---- multimodal kernels: DuckDB twins of the xorshift64 media synth +
  // decode pipeline (ops/Multimodal.scala). Java's 64-bit wrap semantics
  // are reproduced on UBIGINT: left-shift-with-wrap = (h % 2^(64-k)) * 2^k,
  // unsigned right shift = // 2^k, xor = xor(); the FNV rolling hash wraps
  // through HUGEINT. Every feature derives from EXACT integer aggregates
  // with one final double expression + float32 cast, so the comparison is
  // bit-exact, not tolerance-based. --------------------------------------

  private def ub(x: Any): String = s"CAST($x AS UBIGINT)"

  /** xorshift64 step applied to column `s`. */
  private val xsExpr: String = {
    val x1 = s"xor(s, (s % ${ub(1L << 51)}) * ${ub(1L << 13)})"
    val x2 = s"xor(X1, X1 // ${ub(128)})".replace("X1", x1)
    s"xor(X2, (X2 % ${ub(1L << 47)}) * ${ub(1L << 17)})".replace("X2", x2)
  }

  private val seedExpr =
    "CAST('0x' || substring(sha256(text), 1, 16) AS UBIGINT)"

  private val mmImageSql: String =
    s"""WITH RECURSIVE media AS (
       |  SELECT doc_id AS media_id, $seedExpr AS seed FROM documents
       |  WHERE doc_id < 32 AND doc_id % 3 = 0
       |),
       |st AS (
       |  SELECT media_id, 0 AS i, seed AS s FROM media
       |  UNION ALL
       |  SELECT media_id, i + 1, $xsExpr FROM st WHERE i < 4096
       |),
       |pix AS (
       |  SELECT media_id, i - 1 AS pi, CAST(s % 16777216 AS BIGINT) AS rgb
       |  FROM st WHERE i >= 1
       |),
       |cell AS (
       |  SELECT media_id,
       |    CAST((pi // 64) // 12 AS INTEGER) AS gy,
       |    CAST((pi % 64) // 12 AS INTEGER) AS gx,
       |    sum(((rgb // 65536) % 256) * 299 + ((rgb // 256) % 256) * 587
       |        + (rgb % 256) * 114) AS s1000,
       |    count(*) AS cnt
       |  FROM pix
       |  WHERE (pi % 64) < 60 AND (pi // 64) < 60
       |  GROUP BY 1, 2, 3
       |),
       |cellfeat AS (
       |  SELECT media_id, 2 + gy * 5 + gx AS fidx,
       |    CAST(CAST(CAST(s1000 AS DOUBLE) / (1000.0 * cnt) AS FLOAT) AS DOUBLE) AS val
       |  FROM cell
       |),
       |dims AS (
       |  SELECT media_id, 0 AS fidx, CAST(64.0 AS DOUBLE) AS val FROM media
       |  UNION ALL SELECT media_id, 1, 64.0 FROM media
       |),
       |zeros AS (
       |  SELECT media_id, CAST(unnest(range(27, 32)) AS INTEGER) AS fidx,
       |         CAST(0.0 AS DOUBLE) AS val
       |  FROM media
       |)
       |SELECT media_id, CAST(fidx AS INTEGER) AS fidx, val
       |FROM (SELECT * FROM dims UNION ALL SELECT * FROM cellfeat
       |      UNION ALL SELECT * FROM zeros)""".stripMargin

  private val mmAudioSql: String =
    s"""WITH RECURSIVE media AS (
       |  SELECT doc_id AS media_id, $seedExpr AS seed FROM documents
       |  WHERE doc_id < 32 AND doc_id % 3 = 1
       |),
       |st AS (
       |  SELECT media_id, 0 AS i, seed AS s FROM media
       |  UNION ALL
       |  SELECT media_id, i + 1, $xsExpr FROM st WHERE i < 4000
       |),
       |smp AS (
       |  SELECT media_id, i - 1 AS si,
       |    CASE WHEN CAST(s % 65536 AS BIGINT) >= 32768
       |         THEN CAST(s % 65536 AS BIGINT) - 65536
       |         ELSE CAST(s % 65536 AS BIGINT) END AS v
       |  FROM st WHERE i >= 1
       |),
       |gagg AS (
       |  SELECT media_id, sum(v * v) AS sq FROM smp GROUP BY 1
       |),
       |win AS (
       |  SELECT media_id, CAST(si // 285 AS INTEGER) AS w, v,
       |    lag(v, 1, 0) OVER (PARTITION BY media_id, si // 285 ORDER BY si) AS prev
       |  FROM smp WHERE si < 3990
       |),
       |winagg AS (
       |  SELECT media_id, w, sum(v * v) AS sq,
       |    sum(CASE WHEN (v < 0 AND prev >= 0) OR (v >= 0 AND prev < 0)
       |        THEN 1 ELSE 0 END) AS zc
       |  FROM win GROUP BY 1, 2
       |),
       |feats AS (
       |  SELECT media_id, 0 AS fidx, CAST(16000.0 AS DOUBLE) AS val FROM media
       |  UNION ALL SELECT media_id, 1, 4000.0 FROM media
       |  UNION ALL SELECT media_id, 2,
       |    CAST(CAST(sqrt(CAST(sq AS DOUBLE) / 4000) / 32768.0 AS FLOAT) AS DOUBLE)
       |    FROM gagg
       |  UNION ALL SELECT media_id, 3 + 2 * w,
       |    CAST(CAST(sqrt(CAST(sq AS DOUBLE) / 285) / 32768.0 AS FLOAT) AS DOUBLE)
       |    FROM winagg
       |  UNION ALL SELECT media_id, 4 + 2 * w,
       |    CAST(CAST(CAST(zc AS FLOAT) / CAST(285 AS FLOAT) AS FLOAT) AS DOUBLE)
       |    FROM winagg
       |  UNION ALL SELECT media_id, 31, 0.0 FROM media
       |)
       |SELECT media_id, CAST(fidx AS INTEGER) AS fidx, val FROM feats""".stripMargin

  /** Twin of the REAL Y4M kernel: replay the xorshift byte stream that
    * fills 6 frames of 32x32 C420 (1536 plane bytes per frame, of which
    * the first 1024 are the Y plane), sum each frame's unsigned Y bytes
    * exactly, one double division + float32 cast per frame. */
  private val mmVideoSql: String =
    s"""WITH RECURSIVE media AS (
       |  SELECT doc_id AS media_id, $seedExpr AS seed FROM documents
       |  WHERE doc_id < 32 AND doc_id % 3 = 2
       |),
       |st AS (
       |  SELECT media_id, 0 AS i, seed AS s FROM media
       |  UNION ALL
       |  SELECT media_id, i + 1, $xsExpr FROM st WHERE i < 9216
       |),
       |luma AS (
       |  SELECT media_id, CAST((i - 1) // 1536 AS INTEGER) AS f,
       |         CAST(s % 256 AS BIGINT) AS y
       |  FROM st WHERE i >= 1 AND ((i - 1) % 1536) < 1024
       |),
       |fr AS (
       |  SELECT media_id, f, sum(y) AS sy FROM luma GROUP BY 1, 2
       |),
       |feats AS (
       |  SELECT media_id, 0 AS fidx, CAST(32.0 AS DOUBLE) AS val FROM media
       |  UNION ALL SELECT media_id, 1, 32.0 FROM media
       |  UNION ALL SELECT media_id, 2, 6.0 FROM media
       |  UNION ALL SELECT media_id, 3 + f,
       |    CAST(CAST(CAST(sy AS DOUBLE) / 1024.0 AS FLOAT) AS DOUBLE)
       |    FROM fr
       |  UNION ALL SELECT media_id, CAST(unnest(range(9, 32)) AS INTEGER),
       |    CAST(0.0 AS DOUBLE) FROM media
       |)
       |SELECT media_id, CAST(fidx AS INTEGER) AS fidx, val FROM feats""".stripMargin

  val all: Map[String, String] = Map(
    "mm_image_features" -> mmImageSql,
    "mm_audio_features" -> mmAudioSql,
    "mm_video_features" -> mmVideoSql,
    "dd_simhash_neardups" -> simhashSql(3),
    "dd_embedding_neardups" -> ddEmbeddingSql,

    "ann_ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
         |           FROM embeddings),
         |c AS (SELECT vec_id AS cell, de AS ce FROM e WHERE vec_id < 16),
         |a AS (
         |  SELECT vec_id, de, cell FROM (
         |    SELECT e.vec_id, e.de, c.cell,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY ${cosSql("e.de", "c.ce")} DESC, c.cell) AS rn
         |    FROM e CROSS JOIN c
         |  ) WHERE rn = 1
         |),
         |p AS (
         |  SELECT query_id, qe, cell FROM (
         |    SELECT q.vec_id AS query_id, q.de AS qe, c.cell,
         |      row_number() OVER (PARTITION BY q.vec_id
         |        ORDER BY ${cosSql("q.de", "c.ce")} DESC, c.cell) AS rn
         |    FROM e q CROSS JOIN c WHERE q.vec_id < 5
         |  ) WHERE rn <= 4
         |),
         |scored AS (
         |  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id,
         |    round(${cosSql("p.qe", "a.de")}, 4) AS sim
         |  FROM p JOIN a USING (cell) WHERE a.vec_id <> p.query_id
         |)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, neighbor_id) AS rank FROM scored
         |) WHERE rank <= 5""".stripMargin,

    "dd_exact" ->
      """WITH h AS (SELECT doc_id, md5(text) AS h FROM documents),
        |k AS (SELECT h, min(doc_id) AS keeper FROM h GROUP BY 1)
        |SELECT doc_id, keeper, doc_id <> keeper AS is_dup
        |FROM h JOIN k USING (h)""".stripMargin,

    "dd_minhash" ->
      s"WITH $shinglesCte, $sigCte\nSELECT doc_id, seed, minhash FROM sig",

    "dd_lsh_pairs" ->
      s"WITH $shinglesCte, $sigCte, $bandCte, $pairsCte\nSELECT a, b FROM pairs",

    "dd_jaccard" ->
      s"""WITH $shinglesCte, $sigCte, $bandCte, $pairsCte,
         |common AS (
         |  SELECT p.a, p.b, count(*) AS common
         |  FROM pairs p
         |  JOIN sh sa ON sa.doc_id = p.a
         |  JOIN sh sb ON sb.doc_id = p.b AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2
         |),
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
         |SELECT p.a, p.b,
         |  round(coalesce(c.common, 0) /
         |        (na.n + nb.n - coalesce(c.common, 0)), 4) AS jaccard
         |FROM pairs p
         |LEFT JOIN common c ON c.a = p.a AND c.b = p.b
         |JOIN sizes na ON na.doc_id = p.a
         |JOIN sizes nb ON nb.doc_id = p.b""".stripMargin,

    "ta_quality" ->
      s"""SELECT doc_id, n_chars, n_words,
         |  round(nosp / greatest(n_words, 1), 4) AS avg_word_len,
         |  round(stops / greatest(n_words, 1), 4) AS stopword_ratio,
         |  round(alpha / greatest(n_chars, 1), 4) AS alpha_ratio
         |FROM (
         |  SELECT doc_id,
         |    length(text) AS n_chars,
         |    CAST(len(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> '')) AS BIGINT) AS n_words,
         |    length(regexp_replace(text, '\\s+', '', 'g')) AS nosp,
         |    CAST(len(list_filter(list_filter(regexp_split_to_array(text, '\\s+'), w -> w <> ''),
         |        w -> list_contains(${TextAnalysis.EnStop.map(s => s"'$s'").mkString("[", ", ", "]")}, w))) AS BIGINT) AS stops,
         |    length(regexp_replace(text, '[^\\p{L}\\p{N}]', '', 'g')) AS alpha
         |  FROM documents
         |)""".stripMargin,

    "ta_tokens" ->
      """SELECT doc_id,
        |  CAST(len(list_filter(regexp_split_to_array(text, '\s+'), w -> w <> '')) AS BIGINT) AS ws_tokens,
        |  CAST(len(regexp_extract_all(lower(text), '[\p{L}]+|[0-9]+|[^\p{L}0-9\s]')) AS BIGINT) AS bpe_tokens
        |FROM documents""".stripMargin,

    "ta_langid" -> {
      val scoreExprs = TextAnalysis.LangMarkers.map { case (l, ms) =>
        val list = ms.map(m => s"'$m'").mkString("[", ", ", "]")
        s"CAST(len(list_filter(toks, t -> list_contains($list, t))) AS BIGINT) AS s_$l"
      }.mkString(",\n    ")
      val langs = TextAnalysis.LangMarkers.map(_._1)
      val m = s"greatest(${langs.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langs.map(l => s"WHEN s_$l = m THEN '$l'")
        .mkString("CASE WHEN m = 0 THEN 'und' ", " ", " ELSE 'und' END")
      s"""SELECT doc_id, $caseExpr AS pred_lang,
         |  ${langs.map(l => s"s_$l").mkString(", ")}
         |FROM (
         |  SELECT *, $m AS m FROM (
         |    SELECT doc_id,
         |    $scoreExprs
         |    FROM (SELECT doc_id, $tokensSql AS toks FROM documents)
         |  )
         |)""".stripMargin
    },

    "ta_fingerprint" ->
      s"""SELECT doc_id,
         |  CASE WHEN length(text) >= 8 THEN
         |    list_min(list_transform(range(1, length(text) - 6),
         |      i -> ${h64("substr(lower(text), CAST(i AS INTEGER), 8)")}))
         |  ELSE NULL END AS fingerprint,
         |  greatest(length(text) - 7, 0) AS n_windows
         |FROM documents""".stripMargin,

    "hybrid_semantic" ->
      s"""WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id = 0)
         |SELECT e.vec_id,
         |  round(${cosSql("q.qe", "CAST(e.embedding AS DOUBLE[])")}, 4) AS sim
         |FROM embeddings e CROSS JOIN q
         |ORDER BY sim DESC, e.vec_id
         |LIMIT 10""".stripMargin,

    "ann_topk" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(${cosSql("q.qe", "CAST(e.embedding AS DOUBLE[])")}, 4) AS sim
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id
         |)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, neighbor_id) AS rank FROM scored
         |) WHERE rank <= 5""".stripMargin,

    "ann_minscore" ->
      s"""WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
         |           FROM embeddings WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, e.vec_id AS neighbor_id,
         |    round(${cosSql("q.qe", "CAST(e.embedding AS DOUBLE[])")}, 4) AS sim
         |  FROM q, embeddings e WHERE e.vec_id <> q.query_id
         |)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, neighbor_id) AS rank
         |  FROM scored WHERE NOT isnan(sim) AND sim >= 0.3
         |) WHERE rank <= 5""".stripMargin,

    "ann_lsh_topk" ->
      s"""WITH b AS (
         |  SELECT vec_id, de, ($bucketExpr) AS bucket
         |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings)
         |),
         |q AS (SELECT vec_id AS query_id, de AS qe, bucket FROM b WHERE vec_id < 5),
         |scored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    round(${cosSql("q.qe", "c.de")}, 4) AS sim
         |  FROM q JOIN b c USING (bucket) WHERE c.vec_id <> q.query_id
         |)
         |SELECT query_id, CAST(rank AS INTEGER) AS rank, neighbor_id, sim FROM (
         |  SELECT *, row_number() OVER (PARTITION BY query_id
         |    ORDER BY sim DESC, neighbor_id) AS rank FROM scored
         |) WHERE rank <= 5""".stripMargin,
  )
}
