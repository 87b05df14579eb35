package graft.util

/** Access-ordered LRU map, shared by every driver-side cache (the warm
  * query cache's LRUs, the ANN cell cache): one place for the eviction
  * contract instead of hand-rolled LinkedHashMap subclasses. */
object Lru {
  def apply[K, V](cap: Int): java.util.LinkedHashMap[K, V] =
    new java.util.LinkedHashMap[K, V](64, 0.75f, true) {
      override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
        size() > cap
    }
}
