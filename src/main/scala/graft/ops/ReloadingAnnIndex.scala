package graft.ops

import org.apache.spark.sql.SparkSession

/** Long-lived handle over a saved [[AnnIndex]] root that reloads on
  * access when the `current` pointer moves (a new [[AnnIndex.save]]
  * published) — the ANN analog of [[graft.query.ReloadingFtsIndex]],
  * completing the serving symmetry between the two index families.
  * Staleness is one pointer read (a file-metadata call, no Spark job);
  * the stale index's driver cell cache is released on swap. */
class ReloadingAnnIndex(spark: SparkSession, root: String,
                        nProbe: Option[Int] = None,
                        maxCachedCells: Int = 64) {

  @volatile private var cur: AnnIndex = _
  @volatile private var curVersion: String = _
  locally {
    val (i, v) = AnnIndex.loadCurrent(spark, root, nProbe, maxCachedCells)
    cur = i; curVersion = v
  }

  // retry-tolerant shared pointer read: a publish's overwrite-rename can
  // leave a sub-millisecond no-`current` window on local filesystems
  private def readPointer(): String =
    graft.index.FtsIndexBuilder.readPointer(spark, root)

  /** The current (fresh) index, reloading first if a newer version was
    * published. `curVersion` is always the version [[cur]] was LOADED
    * from (returned by the load itself, never the pre-lock pointer read):
    * with two readers racing a publish, recording the stale pre-lock
    * value would close the fresh index a sibling just swapped in and
    * leave the recorded version behind the served one — one spurious
    * full reload (and a warm cell-cache cold start) per subsequent
    * access until the pointer moved again. */
  def index: AnnIndex = {
    if (readPointer() != curVersion) synchronized {
      if (readPointer() != curVersion) {
        val (fresh, v) =
          AnnIndex.loadCurrent(spark, root, nProbe, maxCachedCells)
        if (v != curVersion) {
          val stale = cur
          cur = fresh; curVersion = v
          stale.close() // release the stale driver cell cache
        } else fresh.close() // a sibling already loaded this version
      }
    }
    cur
  }

  /** The loaded version id (test hook). */
  private[graft] def currentVersion: String = curVersion

  def topK(queryVec: Array[Float], k: Int): Seq[(Long, Double)] =
    index.topK(queryVec, k)

  /** As [[AnnIndex.topK]] with the reference's semantic query knobs:
    * `minScore` cosine floor + named accuracy profile. The snapshot is
    * resolved ONCE so the profile's probe width and the query run
    * against the same index generation. */
  def topK(queryVec: Array[Float], k: Int, minScore: Option[Double],
           accuracy: String): Seq[(Long, Double)] = {
    val i = index
    i.topK(queryVec, k, minScore, i.probesFor(accuracy))
  }

  def topKWarm(queryVec: Array[Float], k: Int): Seq[(Long, Double)] =
    index.topKWarm(queryVec, k)

  /** Warm-path twin of the knob-aware [[topK]] overload. */
  def topKWarm(queryVec: Array[Float], k: Int, minScore: Option[Double],
               accuracy: String): Seq[(Long, Double)] = {
    val i = index
    i.topKWarm(queryVec, k, minScore, i.probesFor(accuracy))
  }

  def close(): Unit = cur.close()
}
