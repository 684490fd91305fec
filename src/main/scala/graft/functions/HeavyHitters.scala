package graft.functions

/** Misra-Gries heavy-hitter summaries — the fixed-memory frequent-items
  * sketch (Misra & Gries 1982; the SpaceSaving/frequent family's
  * deterministic core).
  *
  * A summary holds at most `k` counters. Each observed item increments its
  * counter, claims a free slot, or — when all k slots are taken — decrements
  * EVERY counter (evicting zeros). Classic guarantees, independent of input
  * order: a counter never overcounts (`est ≤ true`), undercounts by at most
  * the number of decrement rounds ≤ n/(k+1), and every item with
  * `true > n/(k+1)` is guaranteed present.
  *
  * Distribution shape (the q91 pattern): run one summary PER PARTITION via
  * `mapPartitions` (k counters of local state, one pass), then merge by a
  * plain `groupBy(token).sum(est)` — per-partition estimates are
  * independent undercounts, so the summed estimate keeps the union bound
  * `true − Σnₚ/(k+1) ≤ est ≤ true`. The merge is associative/commutative
  * (order-independent), the shuffle carries ≤ partitions·k rows, and no
  * driver-side merge exists at all — unlike a classic k-bounded merge,
  * the union may exceed k entries, trading a few shuffle rows for a
  * TIGHTER bound and full determinism of the certified contract.
  */
object HeavyHitters {

  /** One Misra-Gries pass over a partition's items: returns the surviving
    * (item, estimate) counters — at most `k` of them. */
  def summarize(items: Iterator[String], k: Int): Iterator[(String, Long)] = {
    require(k > 0, s"k must be positive, got $k")
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    while (items.hasNext) {
      val t = items.next()
      counters.get(t) match {
        case Some(n)                      => counters.update(t, n + 1)
        case None if counters.size < k    => counters.update(t, 1L)
        case None =>
          // decrement-all round: k+1 distinct items each lose one count
          // (the arriving item's single count vanishes with them)
          val kept = counters.iterator.collect {
            case (key, n) if n > 1 => (key, n - 1)
          }.toList
          counters.clear()
          counters ++= kept
      }
    }
    counters.iterator
  }
}
