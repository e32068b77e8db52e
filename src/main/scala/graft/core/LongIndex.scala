package graft.core

/** Open-addressed primitive long → dense-int intern table (power-of-2
  * capacity, linear probing, load factor ½) — the node-id index for the
  * small-graph imperative regimes ([[graft.graph.Graph.pageRank]],
  * [[graft.llm.Dedup.nearDupComponents]]): no boxing, ~16 bytes per
  * distinct key. Single-threaded by design (one task owns it). */
final class LongIndex(initialCapacity: Int = 1 << 14) {
  private var cap = java.lang.Integer.highestOneBit(
    math.max(initialCapacity - 1, 8)) << 1
  private var keys = new Array[Long](cap)
  private var used = new Array[Boolean](cap)
  private var vals = new Array[Int](cap)
  private val idArr = new scala.collection.mutable.ArrayBuffer[Long](cap / 2)

  /** Distinct keys interned so far. */
  def size: Int = idArr.length

  /** The key whose dense index is `i` (0 ≤ i < size). */
  def id(i: Int): Long = idArr(i)

  private def rehash(): Unit = {
    val ok = keys; val ou = used; val ov = vals
    cap <<= 1
    keys = new Array[Long](cap); used = new Array[Boolean](cap)
    vals = new Array[Int](cap)
    var i = 0
    while (i < ok.length) {
      if (ou(i)) {
        var h = LongIndex.mix(ok(i)) & (cap - 1)
        while (used(h)) h = (h + 1) & (cap - 1)
        keys(h) = ok(i); used(h) = true; vals(h) = ov(i)
      }
      i += 1
    }
  }

  /** Dense index of `v`, interning it on first sight. */
  def intern(v: Long): Int = {
    if (idArr.length * 2 >= cap) rehash()
    var h = LongIndex.mix(v) & (cap - 1)
    while (used(h)) {
      if (keys(h) == v) return vals(h)
      h = (h + 1) & (cap - 1)
    }
    keys(h) = v; used(h) = true; vals(h) = idArr.length
    idArr += v
    idArr.length - 1
  }
}

object LongIndex {
  /** Fibonacci-scrambled 32-bit hash. `Long.hashCode` (hi ^ lo) is
    * catastrophic for structured keys — e.g. a packed
    * (srcIdx << 32 | dstIdx) pair of small dense indices lands every
    * key in the low |V| slots and linear probing degenerates into one
    * quadratic cluster (measured: minutes, not milliseconds, at 587k
    * keys). The golden-ratio multiply spreads any key structure across
    * the full table. */
  def mix(v: Long): Int = {
    val z = v * -7046029254386353131L // 2^64 / φ
    (z ^ (z >>> 32)).toInt
  }
}
