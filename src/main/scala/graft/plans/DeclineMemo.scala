package graft.plans

import graft.table.KeyedTable

/** Per-rule memo of SERVE attempts that declined after the shape
  * matched — i.e. after the rule already paid plan-time index IO and
  * found nothing to prune (candidates ≥ total, cap exceeded, stats
  * column missing). Catalyst's fixpoint batches re-run every rule per
  * iteration, and sibling rules rebuild node instances between
  * iterations, so a declined probe re-pays its sidecar IO many times
  * per optimization (a declined dim probe measured 3× the jobs of a
  * served one). Keyed SEMANTICALLY — table root + the normalized probe
  * the rule derived (values, ranges, aggregate needs) — so node churn
  * and inferred-filter duplicates of the same probe all hit the one
  * entry. Guarded by [[KeyedTable.mutationTick]]: any in-process table
  * mutation (new commit, new sidecar) invalidates every cached decline.
  * Soundness never rests here — a stale decline only skips an
  * OPTIMIZATION (the plan stays a correct full scan), and positive
  * serves re-prove freshness through the commit→files delta each time.
  * Bounded: the map clears wholesale past 4096 entries.
  */
private[plans] final class DeclineMemo[K] {
  private val m = java.util.Collections.synchronizedMap(
    new java.util.HashMap[K, java.lang.Long]())

  /** True when `k`'s serve already declined at the current tick. */
  def declined(k: K): Boolean =
    Option(m.get(k)).exists(_.longValue == KeyedTable.mutationTick.get)

  /** Record a serve-decline for `k` at the current tick. */
  def note(k: K): Unit = {
    if (m.size > 4096) m.clear()
    m.put(k, java.lang.Long.valueOf(KeyedTable.mutationTick.get))
  }

  /** Gate `serve` behind the memo: a remembered decline short-circuits;
    * a fresh decline is recorded.
    */
  def gated[A](k: K)(serve: => Option[A]): Option[A] =
    if (declined(k)) None
    else {
      val r = serve
      if (r.isEmpty) note(k)
      r
    }
}
