package graft.operators

import scala.collection.mutable

/** Misra-Gries frequent-items summary (Misra & Gries 1982; the
  * deterministic counter-based sketch also known as the k-1 heavy
  * hitters / Frequent algorithm).
  *
  * Invariant: after one pass with k counters over a stream of n items,
  * every item with true count > n/(k+1) holds a counter — so with
  * k >= 1/phi the survivor set is a guaranteed SUPERSET of the items
  * whose frequency share exceeds phi. Used per partition by
  * ta18_heavy_hitters: a key with global share > phi must (pigeonhole
  * over partition totals) have local share > phi in at least one
  * partition and therefore survives that partition's summary.
  *
  * This is the F2-transform escape hatch done as imperative
  * per-partition logic on purpose: the decrement step is inherently
  * stateful and has no declarative form; everything around it (union
  * of summaries, exact verify join) stays in Catalyst.
  */
object HeavyHitters {

  /** One pass; returns (stream length, surviving keys). The
    * decrement-all step is O(live counters) but is amortized O(1) per
    * stream element: every decrement is paid for by a prior increment. */
  def misraGries(it: Iterator[String], k: Int): (Long, Seq[String]) = {
    val m = new mutable.HashMap[String, Long]
    var n = 0L
    it.foreach { x =>
      n += 1
      m.get(x) match {
        case Some(c) => m.update(x, c + 1)
        case None if m.size < k => m.update(x, 1L)
        case None =>
          val dead = m.iterator.filter(_._2 == 1L).map(_._1).toList
          m.mapValuesInPlace((_, c) => c - 1)
          dead.foreach(m.remove)
      }
    }
    (n, m.keys.toSeq)
  }
}
