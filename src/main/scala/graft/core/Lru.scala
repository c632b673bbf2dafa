package graft.core

/** Access-ordered bounded registry for session-scoped caches (plan
  * fragments, file indexes, side-store handles). Overflow evicts ONLY
  * the least-recently-used entry — never the hot ones, so a working set
  * one larger than the bound degrades by one rebuild instead of an
  * eviction storm rebuilding everything. `onEvict` releases whatever
  * the entry holds (unpersist a cached frame, nothing for reopenable
  * handles). Synchronized: these registries see a handful of accesses
  * per statement, never per row. */
final class Lru[K, V](cap: Int, onEvict: V => Unit = (_: V) => ()) {
  require(cap > 0, "Lru capacity must be positive")
  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      if (this.size > cap) { onEvict(e.getValue); true } else false
  }
  def getOrElseUpdate(k: K)(mk: => V): V = synchronized {
    val got = m.get(k)
    if (got != null) got
    else { val v = mk; m.put(k, v); v }
  }
  def size: Int = synchronized(m.size)
  /** Drop everything, running `onEvict` on each entry (explicit
    * invalidation after in-place source rewrites). */
  def invalidateAll(): Unit = synchronized {
    m.values.forEach(v => onEvict(v)); m.clear()
  }
}
