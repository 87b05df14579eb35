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

  @volatile private var curVersion: String = readPointer()
  @volatile private var cur: AnnIndex =
    AnnIndex.load(spark, root, nProbe, maxCachedCells)

  // retry-tolerant shared pointer read: a publish's overwrite-rename can
  // leave a sub-millisecond no-`current` window on local filesystems
  private def readPointer(): String =
    graft.index.FtsIndexBuilder.readPointer(spark, root)

  /** The current (fresh) index, reloading first if a newer version was
    * published. */
  def index: AnnIndex = {
    val v = readPointer()
    if (v != curVersion) synchronized {
      if (v != curVersion) {
        val stale = cur
        cur = AnnIndex.load(spark, root, nProbe, maxCachedCells)
        curVersion = v
        stale.close() // release the stale driver cell cache
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
