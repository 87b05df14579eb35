package graft.query

import org.apache.spark.sql.functions._

import graft.index.FtsSchema._

/** Driver-side warm-query cache — the reference daemon's in-process warm
  * index analog (daemon/cache.py:82-383 "5-50x speedup for repeated
  * queries"; server/cache/fts_index_cache.py TTL/size-bounded cache).
  *
  * The cluster-side [[FtsIndex]] is the source of truth; this layer keeps
  * an LRU of QUERY-TOUCHED posting blocks and doc rows on the driver:
  *   - first use of a term runs ONE pruned Spark job fetching its segment
  *     blocks (Parquet term-predicate pushdown keeps that job tiny);
  *   - subsequent queries whose terms and result docs are hot answer
  *     entirely on the driver — block-max WAND over cached blocks, zero
  *     Spark jobs — in single-digit milliseconds;
  *   - capacity bounds (maxTerms blocks, maxDocs rows) make this safe
  *     against a 100 TB index: only what queries touch ever reaches
  *     driver memory, and the reference's interactive regime (a daemon
  *     hammering a hot working set) is exactly the hit case.
  *
  * df comes from the blocks themselves (each posting is one doc, so
  * df = Σ n over a term's blocks — identical to the dict's base+delta
  * sum); N/avgdl come from the owning [[FtsIndex]]. The cache is pinned
  * to one index snapshot: it checks [[FtsIndex.fingerprint]] never
  * changed and must be rebuilt after upserts (pair it with
  * [[ReloadingFtsIndex]] for that).
  *
  * Supported directly: multi-word exact-term AND queries (the WAND shape).
  * Fuzzy/regex/phrase/filter queries fall back to the cluster path.
  */
class FtsQueryCache(idx: FtsIndex, maxTerms: Int = 4096,
                    maxDocs: Int = 16384) {
  import FtsIndex._

  /** LRU (field, term) -> blocks sorted by (shard, first_doc). */
  private val termBlocks =
    new java.util.LinkedHashMap[(String, String), Array[SegmentBlock]](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(String, String), Array[SegmentBlock]]): Boolean =
        size() > maxTerms
    }

  /** LRU doc_id -> (repo, path, lang, content). */
  private val docRows =
    new java.util.LinkedHashMap[Long, (String, String, String, String)](
      64, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[Long, (String, String, String, String)]): Boolean =
        size() > maxDocs
    }

  /** Fetch-or-load blocks for all (field, term) pairs; ONE Spark job for
    * all misses together. The returned map is built from hits + freshly
    * fetched rows directly — correctness never depends on what survives
    * the capacity-bounded LRU (a working set larger than maxTerms only
    * loses the caching benefit, not results). */
  private def blocksFor(fts: Seq[(String, String)])
      : Map[(String, String), Array[SegmentBlock]] = synchronized {
    val hits = fts.flatMap(ft => Option(termBlocks.get(ft)).map(ft -> _)).toMap
    val missing = fts.filterNot(hits.contains)
    val fetched: Map[(String, String), Array[SegmentBlock]] =
      if (missing.isEmpty) Map.empty
      else {
        val pred = missing.map { case (f, t) =>
          col("field") === f && col("term") === t
        }.reduce(_ || _)
        val got = idx.segments.where(pred).collect()
          .groupBy(b => (b.field, b.term))
          .view.mapValues(_.sortBy(b => (b.shard, b.first_doc))).toMap
        val withEmpties = missing.map(ft =>
          ft -> got.getOrElse(ft, Array.empty[SegmentBlock])).toMap
        withEmpties.foreach { case (ft, bl) => termBlocks.put(ft, bl) }
        withEmpties
      }
    hits ++ fetched
  }

  private def docsFor(ids: Seq[Long])
      : Map[Long, (String, String, String, String)] = synchronized {
    val hits = ids.flatMap(id => Option(docRows.get(id)).map(id -> _)).toMap
    val missing = ids.filterNot(hits.contains)
    val fetched: Map[Long, (String, String, String, String)] =
      if (missing.isEmpty) Map.empty
      else {
        val got = idx.effectiveDocs.where(col("doc_id").isin(missing: _*))
          .select("doc_id", "repo", "path", "lang", "content").collect()
          .map { r =>
            r.getLong(0) ->
              (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
          }.toMap
        got.foreach { case (id, row) => docRows.put(id, row) }
        got
      }
    hits ++ fetched
  }

  /** Warm top-k search. Exact-term AND queries run block-max WAND over
    * cached blocks on the driver; anything else falls back to the cluster
    * scorer ([[FtsIndex.searchWand]], which itself falls back further). */
  def search(q: FtsQuery): Seq[SearchResult] = {
    idx.validate(q) // same parameter contract as the cluster path
    val nodes = buildNodesLocal(q)
    val simple = nodes.nonEmpty && nodes.forall(_.alts.nonEmpty) &&
      nodes.forall(_.alts.forall(_.isInstanceOf[TermQ])) &&
      !q.hasFilters && !idx.hasDeltas
    if (!simple) return idx.searchWand(q)
    val k = if (q.limit == 0) 100000 else q.limit
    // limit=0 forces snippets off, mirroring FtsIndex.search and the
    // reference (tantivy_index_manager.py:549-553)
    val snippetLines = if (q.limit == 0) 0 else q.snippetLines

    val fts = nodes.flatMap(_.alts.collect { case TermQ(f, t) => (f, t) })
    val blocks = blocksFor(fts.distinct)
    val dfOf: Map[(String, String), Long] =
      blocks.view.mapValues(_.map(_.n.toLong).sum).toMap
    val idfs = dfOf.map { case (ft, df) =>
      ft -> (if (df == 0) 0.0
             else math.log(1.0 + (idx.nDocs - df + 0.5) / (df + 0.5)))
    }
    val groupSpec = nodes.map(_.alts.collect { case TermQ(f, t) => (f, t) })
    val shards = blocks.values.flatten.map(_.shard).toSeq.distinct.sorted

    // shards run sequentially on the driver, so the θ floor carries over:
    // once k docs are collected, later shards prune against the global
    // kth-best (nextDown keeps exact-score ties alive for the doc_id
    // tie-break) — the cross-shard pruning the distributed path cannot do
    val collected = scala.collection.mutable.ArrayBuffer.empty[Wand.Scored]
    var floor = 0.0
    shards.foreach { sh =>
      val groups = groupSpec.map(_.flatMap { ft =>
        val bl = blocks(ft).filter(_.shard == sh)
        if (bl.isEmpty) None
        else Some((bl, idfs(ft), idx.avgdl(ft._1)))
      })
      if (!groups.exists(_.isEmpty)) {
        collected ++= Wand.topKShard(groups, k, floor)._1
        if (collected.size >= k) {
          val kth = collected.sortBy(s => (-s.score, s.doc)).apply(k - 1)
          floor = Math.nextDown(kth.score)
        }
      }
    }
    val top = collected.sortBy(s => (-s.score, s.doc)).take(k).toSeq
    if (top.isEmpty) return Nil

    val meta = docsFor(top.map(_.doc))
    top.flatMap { s =>
      meta.get(s.doc).map { case (repo, path, lang, content) =>
        val m = Snippets.findMatch(content, q.text, q.caseSensitive, 0)
        m match {
          case Some(mm) =>
            val e = Snippets.extractSnippet(content, mm.start, snippetLines)
            SearchResult(s.doc, repo, path, e.line, e.column, mm.text,
              e.snippet, e.snippetStartLine, lang, s.score)
          case None =>
            SearchResult(s.doc, repo, path, 1, 1, q.text, "", 1, lang, s.score)
        }
      }
    }.sortBy(r => (-r.score, r.doc_id))
  }

  /** Same node construction as FtsIndex (kept private there; rebuilt here
    * from the same Tokenizer primitives). */
  private def buildNodesLocal(q: FtsQuery): Seq[Node] = {
    if (q.useRegex || q.editDistance > 0) return Seq(Node(Nil)) // fallback
    val searchField = if (q.caseSensitive) FieldRaw else FieldContent
    q.text.split("\\s+").filter(_.nonEmpty).toSeq.map { w =>
      val alts = Seq(searchField, FieldIdent).flatMap { f =>
        val toks =
          if (f == FieldRaw) graft.analysis.Tokenizer.tokenizeRaw(w)
          else graft.analysis.Tokenizer.tokenize(w)
        toks match {
          case Seq() => None
          case Seq(t) => Some(TermQ(f, t))
          case _ => Some(PhraseQ(f, toks)) // triggers fallback
        }
      }
      Node(alts)
    }
  }
}
