package graft.query

import org.apache.spark.sql.functions._

import graft.functions.PathGlob
import graft.index.FtsSchema._

/** Driver-side warm-query cache — the reference daemon's in-process warm
  * index analog (daemon/cache.py:82-383 "5-50x speedup for repeated
  * queries"; server/cache/fts_index_cache.py TTL/size-bounded cache). The
  * reference serves EVERY query shape from that warm cache; this layer
  * does the same for exact, fuzzy, regex, phrase, language/path-filtered
  * AND line-range-filtered queries — every reference query shape.
  *
  * The cluster-side [[FtsIndex]] is the source of truth; this layer keeps
  * LRUs of QUERY-TOUCHED state on the driver:
  *   - posting blocks per (field, term) — loaded by ONE pruned Spark job on
  *     first use (Parquet term-predicate pushdown keeps that job tiny);
  *   - df per (field, term) from the dictionary — consulted BEFORE any
  *     block fetch: a term whose posting list exceeds `maxDfCached`
  *     (stopword-grade, df ~ N) is never collected to the driver; the
  *     whole query routes to the cluster WAND path instead. This is what
  *     makes the cache safe against a 100 TB index — the df lookup is a
  *     dictionary point query, and only bounded posting lists ever land in
  *     driver memory.
  *   - fuzzy/regex dictionary expansions per alternative;
  *   - doc metadata (repo/path/lang) and doc content rows by doc_id.
  *
  * Subsequent queries whose state is hot answer entirely on the driver —
  * block-max WAND (or the exact phrase scorer) over cached blocks, zero
  * Spark jobs — in single-digit milliseconds.
  *
  * LIVE DELTAS: the cache keeps serving while delta generations exist —
  * the streaming regime, where the reference daemon never drops its warm
  * index (daemon/cache.py:82-383). The snapshot's delta-sized dead-doc set
  * ([[FtsIndex.deadDocs]]) filters tombstoned docs out of every driver
  * scorer; segments/dict/N/avgdl are already delta-merged by [[FtsIndex]].
  * Only a dead set past its driver budget falls back to the cluster.
  *
  * Filtered queries run WAND with an over-pull, then apply the reference's
  * filter precedence (lang-excl, lang-incl, path-excl, path-incl —
  * tantivy_index_manager.py:642-678) driver-side and re-pull with a larger
  * k until k results survive or the match stream is exhausted — EXACT
  * filter-then-top-k semantics (the reference's own daemon overfetches x3
  * and accepts recall loss; we grow until exact, and fall back to the
  * cluster beyond `maxOverpull` candidates — checked up front too, so a
  * limit=0 filtered query never collects 3x100000 candidate rows).
  *
  * Concurrency: each LRU has its own monitor, held only around map
  * get/put — never across a Spark job (miss population runs unlocked;
  * a racing duplicate fetch is idempotent). Concurrent hot queries
  * therefore proceed in parallel instead of serializing through one
  * coarse lock (the reference daemon's RW-lock shape, daemon/cache.py).
  *
  * The cache is pinned to one index snapshot ([[FtsIndex.fingerprint]]);
  * pair it with [[ReloadingFtsIndex]] to swap after upserts.
  */
class FtsQueryCache(private[query] val idx: FtsIndex, maxTerms: Int = 4096,
                    maxDocs: Int = 16384, maxDfCached: Long = 262144,
                    maxOverpull: Int = 16384,
                    /** bound on a single QUERY's total posting volume and
                      * expanded term count — a broad regex/fuzzy expansion
                      * whose terms are individually small can still sum to
                      * the whole index. */
                    maxQueryDf: Long = 1 << 20,
                    maxQueryTerms: Int = 1024,
                    /** the retiring snapshot's cache: state keyed by
                      * IMMUTABLE data (base posting blocks, doc rows —
                      * doc_ids are never reused across generations)
                      * carries over when the version dir is unchanged, so
                      * a delta append/fold doesn't cold-start the daemon.
                      * df/expansions/delta blocks are per-snapshot and
                      * start fresh. */
                    inheritFrom: Option[FtsQueryCache] = None) {
  import FtsIndex._

  private def lru[K, V](cap: Int) = graft.util.Lru[K, V](cap)

  // hit-ratio statistics (the reference cache exposes the same counters,
  // server/cache/fts_index_cache.py "hit-ratio stats"): how many searches
  // were answered entirely on the driver vs routed to the cluster, and
  // the posting-block LRU's hit ratio — LongAdders, so the hot path pays
  // one striped increment, never a lock
  private val warmServed = new java.util.concurrent.atomic.LongAdder
  private val clusterRouted = new java.util.concurrent.atomic.LongAdder
  private val blockHits = new java.util.concurrent.atomic.LongAdder
  private val blockMisses = new java.util.concurrent.atomic.LongAdder

  def stats: FtsQueryCache.CacheStats = FtsQueryCache.CacheStats(
    warmServed.sum(), clusterRouted.sum(), blockHits.sum(), blockMisses.sum())

  /** ONLY the inherited map references are captured — never the previous
    * cache object itself, which would pin its FtsIndex snapshot (dead
    * set, delta blocks, plans) and recursively every predecessor across
    * a long streaming session. */
  private val inheritedState = inheritFrom
    .filter(_.idx.versionDir == idx.versionDir)
    .map(p => (p.baseBlocks, p.metaRows, p.contentRows))

  /** Whether this cache inherited the previous snapshot's immutable state
    * (reload-without-cold-start spec hook). */
  private[graft] val inheritedFromPrev: Boolean = inheritedState.isDefined

  /** LRU (field, term) -> BASE posting blocks (shard < GenBase), sorted by
    * (shard, first_doc). Base segments are immutable for the lifetime of
    * a version dir — inherited across snapshot reloads. */
  private val baseBlocks
      : java.util.LinkedHashMap[(String, String), Array[SegmentBlock]] =
    inheritedState.map(_._1)
      .getOrElse(lru[(String, String), Array[SegmentBlock]](maxTerms))

  /** LRU (field, term) -> DELTA posting blocks (shard >= GenBase) of THIS
    * snapshot's generation list — never inherited. */
  private val deltaBlocks = lru[(String, String), Array[SegmentBlock]](maxTerms)

  /** LRU (field, term) -> df from the dictionary (the block-fetch gate);
    * per-snapshot: every delta generation shifts df. */
  private val termDfs = lru[(String, String), Long](maxTerms * 4)

  /** LRU fuzzy/regex alternative -> expanded term list; per-snapshot (a
    * delta can add dictionary terms that match a pattern). */
  private val expansions = lru[FieldQ, Seq[TermQ]](256)

  /** LRU doc_id -> (repo, path, lang, line_start, line_end) — the filter
    * columns plus the chunk line range (1 / Long.MaxValue for whole-file
    * docs, so the line-overlap checks hold uniformly). Rows are
    * immutable per doc_id (ids are never reused): inherited. Dead docs
    * never reach these lookups — every scorer filters tombstones first. */
  private val metaRows
      : java.util.LinkedHashMap[Long, (String, String, String, Int, Long)] =
    inheritedState.map(_._2)
      .getOrElse(lru[Long, (String, String, String, Int, Long)](maxDocs * 4))

  /** LRU doc_id -> content — fetched only for FINAL top-k rows; immutable
    * per doc_id: inherited. */
  private val contentRows: java.util.LinkedHashMap[Long, String] =
    inheritedState.map(_._3).getOrElse(lru[Long, String](maxDocs))

  /** One term's fully DECODED postings for the phrase scorer: doc ->
    * (tf, dl, positions), PLUS the sorted doc-id array (the primitive
    * view of the keys, for candidate merges without Set boxing — derived
    * once at decode time, so it can never go incoherent with the map).
    * `weight` is a byte estimate precomputed at decode (per-posting map
    * overhead + position ints) so LRU eviction never re-walks entries. */
  private final case class Decoded(
      postings: Map[Long, (Long, Long, Array[Int])],
      docsSorted: Array[Long], weight: Long)

  private object Decoded {
    val empty = Decoded(Map.empty, Array.emptyLongArray, 0L)
  }

  /** Weight-bounded LRU (field, term) -> [[Decoded]]: hot phrase queries
    * skip the per-query varint + position decode, which dominates warm
    * phrase latency when the phrase terms are stopword-grade. Entries are
    * df-gated by construction (the caller only reaches the phrase path
    * through the df budgets); the BYTE budget (not an entry count) bounds
    * worst-case driver retention even when every entry is a near-gate
    * term. Per-snapshot (delta blocks are merged into the decode). */
  private val decodedFts =
    new graft.util.WeightedLru[(String, String), Decoded](256L << 20,
      _.weight)

  /** One phrase's alignment, columnar: sorted doc ids + parallel phrase-tf
    * and doc-length arrays — primitive arrays so the hot scoring loop
    * never boxes a doc id or allocates per candidate. */
  private final case class PhraseAlign(docs: Array[Long], pf: Array[Int],
                                       dl: Array[Long])

  /** Weight-bounded LRU (field, terms) -> the phrase's ALIGNMENT (docs
    * where the terms appear at consecutive positions, with phrase tf and
    * dl). The position-adjacency sweep over two stopword-grade posting
    * lists is what dominates hot phrase latency once decodes are cached —
    * aligning once per (phrase, snapshot) turns repeat phrase queries into
    * pure per-candidate arithmetic. Per-snapshot, like [[decodedFts]];
    * byte-bounded (20 B per aligned doc across the three columns). */
  private val phraseAligns =
    new graft.util.WeightedLru[(String, List[String]), PhraseAlign](
      64L << 20, a => a.docs.length * 20L)

  private def mergeUnion(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) { out(k) = x; i += 1 }
      else if (y < x) { out(k) = y; j += 1 }
      else { out(k) = x; i += 1; j += 1 }
      k += 1
    }
    while (i < a.length) { out(k) = a(i); i += 1; k += 1 }
    while (j < b.length) { out(k) = b(j); j += 1; k += 1 }
    java.util.Arrays.copyOf(out, k)
  }

  private def mergeIntersect(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty || b.isEmpty) return Array.emptyLongArray
    val out = new Array[Long](math.min(a.length, b.length))
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val x = a(i); val y = b(j)
      if (x < y) i += 1
      else if (y < x) j += 1
      else { out(k) = x; k += 1; i += 1; j += 1 }
    }
    java.util.Arrays.copyOf(out, k)
  }

  /** The snapshot's tombstone filter (delta-sized, loaded once, by ONE
    * Spark job on first use). None = too large for the driver budget. */
  private lazy val deadSet: Option[Wand.DeadSet] =
    idx.deadDocs.map(ids => new Wand.DeadSet(ids)) // sorted by construction

  /** df per (field, term), dictionary-backed; ONE Spark job for all misses
    * (run OUTSIDE the lock). */
  private def dfsFor(fts: Seq[(String, String)])
      : Map[(String, String), Long] = {
    val hits = termDfs.synchronized {
      fts.flatMap(ft => Option(termDfs.get(ft)).map(ft -> _.toLong)).toMap
    }
    val missing = fts.filterNot(hits.contains)
    if (missing.isEmpty) return hits
    val pred = FtsIndex.orAll(missing.map { case (f, t) =>
      col("field") === f && col("term") === t
    })
    val got = idx.dict.where(pred).select("field", "term", "df").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val withZeros = missing.map(ft => ft -> got.getOrElse(ft, 0L)).toMap
    termDfs.synchronized {
      withZeros.foreach { case (ft, df) => termDfs.put(ft, df) }
    }
    hits ++ withZeros
  }

  /** Fetch-or-load blocks for (field, term) pairs; ONE Spark job for all
    * misses together (outside the lock). Callers must have df-gated the
    * pairs already. The returned map is built from hits + freshly fetched
    * rows directly — correctness never depends on what survives the LRU.
    *
    * Base and delta parts cache separately: after a snapshot reload the
    * inherited base part is already hot, and only the (tiny) delta part
    * of each term is fetched — pruned to `shard >= GenBase` so the scan
    * skips every base segment file. */
  private def blocksFor(fts: Seq[(String, String)])
      : Map[(String, String), Array[SegmentBlock]] = {
    val genBase = graft.index.FtsDeltas.GenBase
    val hasDeltas = idx.hasDeltas
    val baseHits = baseBlocks.synchronized {
      fts.flatMap(ft => Option(baseBlocks.get(ft)).map(ft -> _)).toMap
    }
    val deltaHits: Map[(String, String), Array[SegmentBlock]] =
      if (!hasDeltas) fts.map(_ -> Array.empty[SegmentBlock]).toMap
      else deltaBlocks.synchronized {
        fts.flatMap(ft => Option(deltaBlocks.get(ft)).map(ft -> _)).toMap
      }
    val fullMiss = fts.filterNot(baseHits.contains)
    val deltaMiss =
      fts.filter(ft => baseHits.contains(ft) && !deltaHits.contains(ft))
    // base and delta lookups count as SEPARATE events: a base-hot /
    // delta-cold term after a snapshot reload (the inheritance case) is
    // one hit + one miss, not a full miss — otherwise the ratio reads
    // 0.0 for queries that skipped every base-block Spark fetch
    if (hasDeltas) {
      blockHits.add(baseHits.size + deltaHits.size)
      blockMisses.add(
        fullMiss.size + deltaMiss.size +
          fullMiss.count(ft => !deltaHits.contains(ft)))
    } else {
      blockHits.add(baseHits.size)
      blockMisses.add(fullMiss.size)
    }
    val (fetchedBase, fetchedDelta) =
      if (fullMiss.isEmpty && deltaMiss.isEmpty)
        (Map.empty[(String, String), Array[SegmentBlock]],
          Map.empty[(String, String), Array[SegmentBlock]])
      else {
        val preds =
          fullMiss.map { case (f, t) =>
            // a base-miss term whose DELTA part is already cached only
            // needs the base segments — without the shard bound the fetch
            // re-reads the delta segments and the fetched delta part is
            // discarded at assembly (deltaHits wins below) — ADVICE r05 #3
            if (hasDeltas && deltaHits.contains((f, t)))
              col("field") === f && col("term") === t &&
                col("shard") < genBase
            else col("field") === f && col("term") === t
          } ++ deltaMiss.map { case (f, t) =>
            col("field") === f && col("term") === t &&
              col("shard") >= genBase
          }
        val got = idx.segments.where(FtsIndex.orAll(preds)).collect()
          .groupBy(b => (b.field, b.term))
        def part(ft: (String, String), delta: Boolean) =
          got.getOrElse(ft, Array.empty[SegmentBlock])
            .filter(b => (b.shard >= genBase) == delta)
            .sortBy(b => (b.shard, b.first_doc))
        val fb = fullMiss.map(ft => ft -> part(ft, delta = false)).toMap
        val fd = (fullMiss ++ deltaMiss)
          .map(ft => ft -> part(ft, delta = true)).toMap
        baseBlocks.synchronized {
          fb.foreach { case (ft, bl) => baseBlocks.put(ft, bl) }
        }
        if (hasDeltas) deltaBlocks.synchronized {
          fd.foreach { case (ft, bl) => deltaBlocks.put(ft, bl) }
        }
        (fb, fd)
      }
    fts.map { ft =>
      val b = baseHits.getOrElse(ft,
        fetchedBase.getOrElse(ft, Array.empty[SegmentBlock]))
      val d = deltaHits.getOrElse(ft,
        fetchedDelta.getOrElse(ft, Array.empty[SegmentBlock]))
      ft -> (if (d.isEmpty) b else b ++ d)
    }.toMap
  }

  private def metaFor(ids: Seq[Long])
      : Map[Long, (String, String, String, Int, Long)] = {
    val hits = metaRows.synchronized {
      ids.flatMap(id => Option(metaRows.get(id)).map(id -> _)).toMap
    }
    val missing = ids.filterNot(hits.contains)
    if (missing.isEmpty) return hits
    val docs = idx.effectiveDocs
    val chunked = docs.columns.contains("line_start")
    val lsCol =
      if (chunked) coalesce(col("line_start"), lit(1)).cast("int")
      else lit(1)
    val leCol =
      if (chunked) coalesce(col("line_end"), lit(Long.MaxValue)).cast("long")
      else lit(Long.MaxValue)
    val got = docs.where(col("doc_id").isin(missing: _*))
      .select(col("doc_id"), col("repo"), col("path"), col("lang"),
        lsCol.as("ls"), leCol.as("le")).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getString(3), r.getInt(4),
          r.getLong(5))).toMap
    metaRows.synchronized {
      got.foreach { case (id, row) => metaRows.put(id, row) }
    }
    hits ++ got
  }

  /** Meta AND content rows for the FINAL top-k ids in ONE pruned job
    * (they were two identical isin scans over the doc store — the cold
    * path paid two jobs where one carries both column sets). Ids missing
    * from EITHER cache are fetched together; both LRUs are populated. */
  private def rowsFor(ids: Seq[Long])
      : (Map[Long, (String, String, String, Int, Long)], Map[Long, String]) = {
    val metaHits = metaRows.synchronized {
      ids.flatMap(id => Option(metaRows.get(id)).map(id -> _)).toMap
    }
    val contentHits = contentRows.synchronized {
      ids.flatMap(id => Option(contentRows.get(id)).map(id -> _)).toMap
    }
    val missing = ids.filter(id =>
      !metaHits.contains(id) || !contentHits.contains(id)).distinct
    if (missing.isEmpty) return (metaHits, contentHits)
    val docs = idx.effectiveDocs
    val chunked = docs.columns.contains("line_start")
    val lsCol =
      if (chunked) coalesce(col("line_start"), lit(1)).cast("int")
      else lit(1)
    val leCol =
      if (chunked) coalesce(col("line_end"), lit(Long.MaxValue)).cast("long")
      else lit(Long.MaxValue)
    val got = docs.where(col("doc_id").isin(missing: _*))
      .select(col("doc_id"), col("repo"), col("path"), col("lang"),
        lsCol.as("ls"), leCol.as("le"), col("content")).collect()
    val gotMeta = got.map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2), r.getString(3), r.getInt(4),
        r.getLong(5))).toMap
    val gotContent = got.map(r => r.getLong(0) -> r.getString(6)).toMap
    metaRows.synchronized {
      gotMeta.foreach { case (id, row) => metaRows.put(id, row) }
    }
    contentRows.synchronized {
      gotContent.foreach { case (id, c) => contentRows.put(id, c) }
    }
    (metaHits ++ gotMeta, contentHits ++ gotContent)
  }

  /** Expand fuzzy/regex alternatives, LRU-cached; cluster dict job on miss
    * (via [[FtsIndex.expandAlts]] — the same expansion the cluster path
    * runs, so results are identical by construction). The per-call map is
    * built from LRU hits + the expandAlts return value directly — the LRU
    * is only a cache, never the source of truth (a query with more
    * alternatives than the LRU capacity must not read back its own
    * evictions — ADVICE r03 #4). */
  private def expandLocal(nodes: Seq[Node]): Seq[Node] = {
    val dyn = nodes.flatMap(_.alts).collect {
      case f: FuzzyQ => f: FieldQ
      case r: RegexQ => r: FieldQ
    }.distinct
    if (dyn.isEmpty) return nodes
    val hits = expansions.synchronized {
      dyn.flatMap(a => Option(expansions.get(a)).map(a -> _)).toMap
    }
    val missing = dyn.filterNot(hits.contains)
    val fresh: Map[FieldQ, Seq[TermQ]] =
      if (missing.isEmpty) Map.empty
      else {
        // the expansion job scans exactly the dict rows whose dfs the
        // block-fetch gate needs next — seed the df LRU from the same
        // job instead of running a second dictionary job per cold
        // fuzzy/regex query
        val (exp, dfs) = idx.expandAltsDf(missing)
        termDfs.synchronized {
          dfs.foreach { case (ft, df) => termDfs.put(ft, df) }
        }
        exp
      }
    if (fresh.nonEmpty) expansions.synchronized {
      fresh.foreach { case (a, ts) => expansions.put(a, ts) }
    }
    val all = hits ++ fresh
    nodes.map { nd =>
      Node(nd.alts.flatMap {
        case a: FuzzyQ => all(a)
        case a: RegexQ => all(a)
        case a => Seq(a)
      })
    }
  }

  /** The reference's post-filter precedence (Q5-Q8) plus the chunk
    * line-range overlap (Q9 note), driver-side mirror of FtsIndex.search's
    * filtered branch (incl. the facet-vs-extension expansion quirk).
    * Whole-file docs carry (ls=1, le=Long.MaxValue), making the overlap
    * checks uniform. */
  private def passesFilters(q: FtsQuery, lang: String,
                            pathMatch: String => Boolean,
                            pathExcl: String => Boolean,
                            path: String, ls: Int, le: Long): Boolean = {
    if (q.excludeLanguages.nonEmpty) {
      val excl = LanguageMap.extensions(q.excludeLanguages)
      if (excl.contains(lang)) return false
      if (q.languages.nonEmpty &&
          !LanguageMap.extensions(q.languages).contains(lang)) return false
    } else if (q.languages.nonEmpty && !q.languages.contains(lang))
      return false
    if (q.excludePathFilters.nonEmpty && pathExcl(path)) return false
    if (q.pathFilters.nonEmpty && !pathMatch(path)) return false
    if (q.minLine.exists(m => le < m)) return false
    if (q.maxLine.exists(m => ls > m)) return false
    true
  }

  /** Route a query to the cluster WAND path (which falls back further),
    * counting the fallback for [[stats]]. */
  private def routeCluster(q: FtsQuery): Seq[SearchResult] = {
    clusterRouted.increment()
    idx.searchWand(q)
  }

  /** Warm top-k search over cached state; see class doc for the supported
    * shapes. Falls back to [[FtsIndex.searchWand]] (which falls back
    * further) whenever a shape or budget rules the driver path out. */
  def search(q: FtsQuery): Seq[SearchResult] = {
    val out = searchDriver(q)
    if (out != null) { warmServed.increment(); out }
    else routeCluster(q)
  }

  /** The driver-side path; null = route to the cluster (the counters and
    * the single fallback call site live in [[search]]). */
  private def searchDriver(q: FtsQuery): Seq[SearchResult] = {
    idx.validate(q)
    // live deltas: keep serving warm, filtering tombstoned docs out of
    // every scorer below; only an oversized dead set leaves the driver
    val dead: Wand.DeadSet = deadSet match {
      case Some(d) => d
      case None => return null
    }
    val nodes = expandLocal(buildNodes(q))
    if (nodes.isEmpty) return Nil
    if (nodes.exists(_.alts.isEmpty)) return Nil // AND: unmatched word
    val fts = nodes.flatMap(_.alts.flatMap {
      case TermQ(f, t) => Seq((f, t))
      case PhraseQ(f, ts) => ts.map((f, _))
      case _ => Nil
    }).distinct

    // the block-fetch gates: a stopword-grade term, a too-broad expansion
    // (e.g. regex ".*"), or a query whose SUMMED posting volume exceeds
    // the budget routes to the cluster — nothing index-sized is ever
    // collected to the driver
    if (fts.size > maxQueryTerms) return null
    val dfs = dfsFor(fts)
    if (dfs.valuesIterator.exists(_ > maxDfCached) ||
        dfs.valuesIterator.sum > maxQueryDf) return null

    val k = if (q.limit == 0) 100000 else q.limit
    val snippetLines = if (q.limit == 0) 0 else q.snippetLines
    val blocks = blocksFor(fts)
    val idfs = dfs.map { case (ft, df) => ft -> FtsIndex.idfOf(idx.nDocs, df) }
    val hasPhrase = nodes.exists(_.alts.exists(_.isInstanceOf[PhraseQ]))

    // full sorted match list for phrase shapes (exhaustive over the small,
    // df-gated posting sets) — computed ONCE even across overpull rounds;
    // lazy WAND pulls otherwise
    lazy val phraseMatches: Seq[Wand.Scored] =
      scorePhraseLocal(nodes, blocks, idfs, dead)
    def pullTopK(kk: Int): (Seq[Wand.Scored], Boolean) =
      if (hasPhrase) {
        val all = phraseMatches
        (all.take(kk), all.size <= kk)
      } else {
        val groupSpec = nodes.map(_.alts.collect { case TermQ(f, t) => (f, t) })
        val got = wandLocal(groupSpec, blocks, idfs, kk, dead)
        (got, got.size < kk)
      }

    val top: Seq[Wand.Scored] =
      if (!q.hasFilters) pullTopK(k)._1
      else {
        // the documented contract: beyond maxOverpull candidates the query
        // belongs on the cluster — checked BEFORE the first pull too, so a
        // filtered limit=0 query (k=100000) never collects 3k candidates'
        // metadata through the driver (ADVICE r03 #3)
        if (math.max(3 * k, 30) > maxOverpull) return null
        val pathMatch = PathGlob.anyMatcher(q.pathFilters)
        val pathExcl = PathGlob.anyMatcher(q.excludePathFilters)
        var kk = math.max(3 * k, 30)
        var out: Option[Seq[Wand.Scored]] = None
        while (out.isEmpty) {
          val (cands, exhausted) = pullTopK(kk)
          val meta = metaFor(cands.map(_.doc))
          val kept = cands.filter { s =>
            meta.get(s.doc).exists { case (_, path, lang, ls, le) =>
              passesFilters(q, lang, pathMatch, pathExcl, path, ls, le)
            }
          }
          if (kept.size >= k || exhausted) out = Some(kept.take(k))
          else if (kk >= maxOverpull) return null
          else kk *= 4
        }
        out.get
      }
    if (top.isEmpty) return Nil

    val (meta, content) = rowsFor(top.map(_.doc))
    top.flatMap { s =>
      meta.get(s.doc).map { case (repo, path, lang, ls, _) =>
        val c = content.getOrElse(s.doc, "")
        val m =
          if (q.useRegex) {
            val flags =
              if (q.caseSensitive) 0
              else java.util.regex.Pattern.CASE_INSENSITIVE
            Snippets.findRegexMatch(c,
              java.util.regex.Pattern.compile(q.text, flags))
          } else Snippets.findMatch(c, q.text, q.caseSensitive, q.editDistance)
        m match {
          case Some(mm) =>
            // chunk docs report FILE-absolute lines, like search()
            val e = Snippets.extractSnippet(c, mm.start, snippetLines)
            SearchResult(s.doc, repo, path, e.line + ls - 1, e.column,
              mm.text, e.snippet, e.snippetStartLine + ls - 1, lang, s.score)
          case None =>
            SearchResult(s.doc, repo, path, ls, 1, q.text, "", ls, lang,
              s.score)
        }
      }
    }.sortBy(r => (-r.score, r.doc_id))
  }

  /** Driver WAND over cached blocks: shards run sequentially so the θ
    * floor carries across them — the cross-shard pruning the distributed
    * path cannot do (nextDown keeps exact-score ties alive for the doc_id
    * tie-break). */
  private def wandLocal(groupSpec: Seq[Seq[(String, String)]],
                        blocks: Map[(String, String), Array[SegmentBlock]],
                        idfs: Map[(String, String), Double],
                        k: Int, dead: Wand.DeadSet): Seq[Wand.Scored] = {
    val shards = blocks.values.flatten.map(_.shard).toSeq.distinct.sorted
    val collected = scala.collection.mutable.ArrayBuffer.empty[Wand.Scored]
    var floor = 0.0
    shards.foreach { sh =>
      val groups = groupSpec.map(_.flatMap { ft =>
        val bl = blocks(ft).filter(_.shard == sh)
        if (bl.isEmpty) None
        else Some((bl, idfs(ft), idx.avgdl(ft._1)))
      })
      if (!groups.exists(_.isEmpty)) {
        collected ++= Wand.topKShard(groups, k, floor, dead)._1
        if (collected.size >= k) {
          val kth = collected.sortBy(s => (-s.score, s.doc)).apply(k - 1)
          floor = Math.nextDown(kth.score)
        }
      }
    }
    collected.sortBy(s => (-s.score, s.doc)).take(k).toSeq
  }

  /** Exhaustive driver scorer for phrase-bearing queries: decode the
    * (df-gated) posting lists WITH positions and evaluate candidates with
    * a HAND-ROLLED cursor loop (per-alt BM25 accumulation over sorted
    * doc-id cursors) — NOT [[FtsIndex.scoreDoc]]; equivalence with the
    * cluster scorer is pinned by the differential fuzz battery in
    * FtsRound5Spec, so a semantics change to scoreDoc (idf sum, NaN
    * handling, tie-breaks) must be mirrored here BY HAND and will show
    * up as a fuzz failure if it isn't. Returns ALL (alive) matches
    * sorted (score desc, doc asc). */
  private def scorePhraseLocal(nodes: Seq[Node],
                               blocks: Map[(String, String), Array[SegmentBlock]],
                               idfs: Map[(String, String), Double],
                               dead: Wand.DeadSet)
      : Seq[Wand.Scored] = {
    import graft.index.Codec
    // decode each (field, term)'s postings into doc -> (tf, dl, positions)
    // (or reuse the LRU'd decode — identical by determinism of the codec)
    val byFt: Map[(String, String), Decoded] =
      blocks.map { case (ft, bls) =>
        val cached = decodedFts.synchronized(Option(decodedFts.get(ft)))
        ft -> cached.getOrElse {
          val m = scala.collection.mutable.LongMap
            .empty[(Long, Long, Array[Int])]
          var posInts = 0L
          bls.foreach { b =>
            val docs = Codec.decodeDeltas(b.doc_bytes, b.n)
            val tfs = Codec.decodeVarints(b.tf_bytes, b.n)
            val dls = Codec.decodeVarints(b.dl_bytes, b.n)
            val pr = new Codec.VarIntReader(b.pos_bytes)
            var i = 0
            while (i < b.n) {
              m.put(docs(i), (tfs(i), dls(i), pr.readDeltaList(tfs(i).toInt)))
              posInts += tfs(i)
              i += 1
            }
          }
          val sorted = m.keysIterator.toArray
          java.util.Arrays.sort(sorted)
          // ~80 B/posting: immutable-map node + key + value tuple + array
          // headers; positions 4 B each — an estimate, bounded upstream
          val d = Decoded(m.toMap, sorted, m.size * 80L + posInts * 4L)
          decodedFts.synchronized(decodedFts.put(ft, d))
          d
        }
      }
    val avgdl = Map(FieldContent -> idx.avgdl(FieldContent),
      FieldRaw -> idx.avgdl(FieldRaw), FieldIdent -> idx.avgdl(FieldIdent))
    // the cluster scoreDoc's own primitive (FtsIndex.bm25Of) — the warm
    // path can never drift from the cluster path's formula; idfs arrives
    // precomputed by the caller (searchDriver's one map from the dfs job)
    def bm25(tf: Double, dl: Long, field: String, idfV: Double): Double =
      FtsIndex.bm25Of(tf, dl, avgdl(field), idfV)

    // align each distinct phrase ONCE per (phrase, snapshot), LRU'd:
    // sorted (doc, phrase tf, dl) columns for exactly the docs where the
    // terms are adjacent — identical to scoreDoc's per-doc phraseFreq by
    // the codec's determinism, but never recomputed on a hot repeat
    val phrases = nodes.flatMap(_.alts).collect {
      case p: PhraseQ => p }.distinct
    val alignOf: Map[PhraseQ, PhraseAlign] = phrases.map { pq =>
      val key = (pq.field, pq.terms.toList)
      val cached = phraseAligns.synchronized(Option(phraseAligns.get(key)))
      val m = cached.getOrElse {
        val maps =
          pq.terms.map(t => byFt.getOrElse((pq.field, t), Decoded.empty).postings)
        val docsB = Array.newBuilder[Long]
        val pfB = Array.newBuilder[Int]
        val dlB = Array.newBuilder[Long]
        if (maps.nonEmpty && maps.forall(_.nonEmpty)) {
          val cands = pq.terms
            .map(t => byFt.getOrElse((pq.field, t), Decoded.empty).docsSorted)
            .reduce(mergeIntersect) // ascending, so the columns come out sorted
          cands.foreach { doc =>
            val pf = FtsIndex.phraseFreq(maps.map(_(doc)._3))
            if (pf > 0) {
              docsB += doc; pfB += pf; dlB += maps.head(doc)._2
            }
          }
        }
        val out = PhraseAlign(docsB.result(), pfB.result(), dlB.result())
        phraseAligns.synchronized(phraseAligns.put(key, out))
        out
      }
      pq -> m
    }.toMap

    // candidate docs as ONE sorted primitive array: per node, merge-union
    // of alt doc arrays; across nodes, merge-intersect — no Set boxing
    def altDocsArr(a: FieldQ): Array[Long] = a match {
      case TermQ(f, t) => byFt.getOrElse((f, t), Decoded.empty).docsSorted
      // aligned docs only — a co-occurring-but-unaligned doc can never
      // match the phrase alt (scoreDoc returned NaN for those)
      case pq: PhraseQ => alignOf(pq).docs
      case _ => Array.emptyLongArray
    }
    val candidates = nodes.map(n => n.alts.map(altDocsArr).reduce(mergeUnion))
      .reduceOption(mergeIntersect).getOrElse(Array.emptyLongArray)

    // per-node alt cursors: candidates ascend, so each phrase alt keeps a
    // RUNNING POINTER into its sorted alignment columns (one compare per
    // candidate instead of a binary search); term alts stay map lookups
    // (rare in phrase-bearing queries)
    final class PhraseCursor(val al: PhraseAlign, val field: String,
                             val idfSum: Double) { var p = 0 }
    val nodePhrase: Array[Array[PhraseCursor]] = nodes.map(_.alts.collect {
      case pq @ PhraseQ(f, ts) =>
        new PhraseCursor(alignOf(pq), f, ts.map(t => idfs((f, t))).sum)
    }.toArray).toArray
    val nodeTerm: Array[Array[(Map[Long, (Long, Long, Array[Int])], String, Double)]] =
      nodes.map(_.alts.collect {
        case TermQ(f, t) =>
          (byFt.getOrElse((f, t), Decoded.empty).postings, f, idfs((f, t)))
      }.toArray).toArray

    val out = scala.collection.mutable.ArrayBuffer.empty[Wand.Scored]
    var ci = 0
    while (ci < candidates.length) {
      val doc = candidates(ci)
      // tombstoned docs never reach the scorer (cursors self-correct on
      // the next candidate's advance loop)
      if (!dead.contains(doc)) {
        var total = 0.0
        var all = true
        var ni = 0
        while (ni < nodePhrase.length) {
          var matched = false
          val pcs = nodePhrase(ni)
          var ai = 0
          while (ai < pcs.length) {
            val c = pcs(ai)
            val ds = c.al.docs
            while (c.p < ds.length && ds(c.p) < doc) c.p += 1
            if (c.p < ds.length && ds(c.p) == doc) {
              total += bm25(c.al.pf(c.p).toDouble, c.al.dl(c.p), c.field,
                c.idfSum)
              matched = true
            }
            ai += 1
          }
          val tas = nodeTerm(ni)
          ai = 0
          while (ai < tas.length) {
            val (m, f, idfV) = tas(ai)
            m.get(doc).foreach { case (tf, dl, _) =>
              total += bm25(tf.toDouble, dl, f, idfV)
              matched = true
            }
            ai += 1
          }
          if (!matched) all = false
          ni += 1
        }
        if (all) out += Wand.Scored(doc, total)
      }
      ci += 1
    }
    // allocation-free comparator (a tuple-keyed sortBy boxes every row)
    val ord = new Ordering[Wand.Scored] {
      def compare(a: Wand.Scored, b: Wand.Scored): Int = {
        val c = java.lang.Double.compare(b.score, a.score)
        if (c != 0) c else java.lang.Long.compare(a.doc, b.doc)
      }
    }
    out.sortInPlace()(ord).toSeq
  }

  /** Same node construction as the cluster path (shared code). */
  private def buildNodes(q: FtsQuery): Seq[Node] = idx.buildNodes(q)

  // ---- test hooks --------------------------------------------------------

  /** Whether a term's posting blocks were ever collected to the driver
    * (the df-gate spec asserts this stays false for stopword-grade terms). */
  private[graft] def hasBlocksFor(field: String, term: String): Boolean =
    baseBlocks.synchronized(baseBlocks.containsKey((field, term))) ||
      deltaBlocks.synchronized(deltaBlocks.containsKey((field, term)))

  private[graft] def cachedTermCount: Int =
    baseBlocks.synchronized(baseBlocks.size()) +
      deltaBlocks.synchronized(deltaBlocks.size())
}

object FtsQueryCache {

  /** Cumulative serving counters of a cache instance. `blockHitRatio` is
    * per (field, term) LOOKUP EVENT: under live deltas each term makes a
    * base lookup and a delta lookup, counted separately — so a warm-base /
    * cold-delta reload (the inheritance case) reads as ~0.5, not 0.0.
    *
    * A top-level case class on purpose: an inner class value would carry
    * an `$outer` pointer pinning the whole cache (and its FtsIndex
    * snapshot) for as long as a caller retains the stats snapshot —
    * exactly the retention this class's `inheritFrom` discipline forbids. */
  final case class CacheStats(warmServed: Long, clusterRouted: Long,
                              blockHits: Long, blockMisses: Long) {
    def warmRatio: Double =
      if (warmServed + clusterRouted == 0) 0.0
      else warmServed.toDouble / (warmServed + clusterRouted)
    def blockHitRatio: Double =
      if (blockHits + blockMisses == 0) 0.0
      else blockHits.toDouble / (blockHits + blockMisses)
  }
}
