package graft.util

/** LRU-bounded memo for driver-held derived artifacts (learned merge
  * lists, trained weights, domain-tier tables): the corpus-keyed
  * TrieMap memos these replace never evicted, so a long-lived session
  * pointing at many corpora accumulated one dimension-sized entry per
  * (dir, fingerprint) forever — hygiene, not a leak, but this library
  * targets exactly that long-lived-session embedding (round-18 verdict
  * #6). Entries are dimension-sized by contract and 4–8 cover any
  * realistic session, so `cap` stays small; eviction is
  * least-recently-USED (access-ordered LinkedHashMap).
  *
  * Concurrency contract matches the TrieMap it replaces: reads and
  * writes are synchronized; the `v` thunk runs UNLOCKED (it launches
  * Spark jobs), so two threads racing on one cold key may both compute
  * and one result wins — acceptable for pure derivations, and no
  * worse than TrieMap.getOrElseUpdate's own race. */
final class BoundedMemo[K, V](cap: Int) {
  require(cap >= 1, s"memo cap must be positive, got $cap")

  private val m = new java.util.LinkedHashMap[K, V](16, 0.75f, true) {
    override def removeEldestEntry(e: java.util.Map.Entry[K, V]): Boolean =
      this.size > cap
  }

  def getOrElseUpdate(k: K, v: => V): V = {
    val hit = m.synchronized(m.get(k))
    if (hit != null) hit
    else {
      val computed = v
      require(computed != null, "BoundedMemo cannot hold null values")
      m.synchronized {
        val again = m.get(k)
        if (again != null) again
        else { m.put(k, computed); computed }
      }
    }
  }

  def clear(): Unit = m.synchronized { m.clear() }

  def size: Int = m.synchronized(m.size)

  /** Membership without touching recency — for specs. */
  def containsKey(k: K): Boolean = m.synchronized(m.containsKey(k))
}
