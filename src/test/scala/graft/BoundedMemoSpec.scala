package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.BoundedMemo

/** LRU-bounded derivation memo ([[graft.util.BoundedMemo]]): the cap
  * holds under many-corpus churn (round-18 verdict #6 — the TrieMap
  * memos it replaced never evicted), eviction is least-recently-used,
  * and a hit never recomputes. */
class BoundedMemoSpec extends AnyFunSuite {

  test("a second (third, ...) corpus key does not grow the memo past the cap") {
    val m = new BoundedMemo[String, Seq[Long]](4)
    (1 to 20).foreach(i => m.getOrElseUpdate(s"corpus$i", Seq(i.toLong)))
    assert(m.size == 4)
    // newest keys survive, oldest were evicted
    assert(m.containsKey("corpus20") && m.containsKey("corpus17"))
    assert(!m.containsKey("corpus1"))
  }

  test("hits never recompute; eviction is least-recently-USED, not inserted") {
    var computes = 0
    val m = new BoundedMemo[String, String](2)
    def get(k: String): String = m.getOrElseUpdate(k, { computes += 1; k })
    get("a"); get("b")
    assert(computes == 2)
    get("a") // refresh a's recency: b is now the LRU entry
    assert(computes == 2)
    get("c") // evicts b, not a
    assert(m.containsKey("a") && m.containsKey("c") && !m.containsKey("b"))
    get("a")
    assert(computes == 3, "a refreshed hit was recomputed")
  }

  test("clear empties; nulls are rejected loudly") {
    val m = new BoundedMemo[String, String](2)
    m.getOrElseUpdate("k", "v")
    m.clear()
    assert(m.size == 0)
    intercept[IllegalArgumentException] {
      m.getOrElseUpdate("n", null)
    }
  }
}
