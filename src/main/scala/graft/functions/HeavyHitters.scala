package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters sketch as a typed Spark `Aggregator` — the
  * frequent-items companion to [[KmvSketch]] on the same SURVEY §7.3
  * extension ladder (compose > Expression/TypedColumn > Plan/Strategy).
  *
  * The sketch keeps at most `k` (item, counter) pairs. Classic MG update:
  * increment a tracked item, insert if there is room, otherwise decrement
  * every counter (dropping zeros). Merge follows Agarwal et al.,
  * "Mergeable Summaries" (PODS'12): sum counters pairwise, then subtract
  * the (k+1)-th largest counter from all and drop non-positives — the
  * result carries the SAME error bound as a single-pass sketch, which is
  * what makes it a correct Spark partial aggregate: map-side partials
  * shuffle only k pairs per group regardless of input size.
  *
  * Guarantees (N = stream length): every item with true frequency
  * > N/(k+1) is present, and each reported counter underestimates the
  * true count by at most N/(k+1). When the group has ≤ k distinct items
  * no decrement ever fires and counts are EXACT — the regime the
  * `q_heavy_hitters` oracle pins (the estimate-regime bounds are pinned
  * in `HeavyHittersSpec`). Deterministic: no RNG, and ties in the merge
  * truncation are broken by (count desc, item asc) ordering.
  *
  * At 100 TB: constant-size mergeable state per group vs the exact
  * GROUP BY's shuffle of every distinct key — the standard top-k shape
  * for vocabulary builds, hot-URL detection, and skew-key discovery.
  */
object HeavyHitters {

  /** Sketch state: tracked items → counters (≤ k entries). */
  final case class State(k: Int, counters: Map[String, Long])

  /** Output: parallel arrays sorted by (count desc, item asc) — a
    * product-encodable shape; explode with `arrays_zip` for rows. */
  final case class TopItems(items: Seq[String], counts: Seq[Long])

  private def truncate(k: Int, m: Map[String, Long]): Map[String, Long] =
    if (m.size <= k) m
    else {
      // subtract the (k+1)-th largest counter (Mergeable Summaries §3.2);
      // deterministic tie-break so partials merge identically every run
      val sorted = m.toSeq.sortBy { case (item, n) => (-n, item) }
      val pivot = sorted(k)._2
      sorted.iterator.map { case (item, n) => item -> (n - pivot) }
        .filter(_._2 > 0L).toMap
    }

  final class Sketch(k: Int) extends Aggregator[String, State, TopItems] {
    override def zero: State = State(k, Map.empty)

    override def reduce(b: State, a: String): State = b.counters.get(a) match {
      case Some(n) => b.copy(counters = b.counters.updated(a, n + 1L))
      case None if b.counters.size < b.k =>
        b.copy(counters = b.counters.updated(a, 1L))
      case None =>
        // decrement-all step: drop zeros, the new item is absorbed
        b.copy(counters =
          b.counters.iterator.map { case (i, n) => i -> (n - 1L) }
            .filter(_._2 > 0L).toMap)
    }

    override def merge(x: State, y: State): State = {
      val combined = y.counters.foldLeft(x.counters) { case (acc, (item, n)) =>
        acc.updated(item, acc.getOrElse(item, 0L) + n)
      }
      x.copy(counters = truncate(x.k, combined))
    }

    override def finish(s: State): TopItems = {
      val sorted = s.counters.toSeq.sortBy { case (item, n) => (-n, item) }
      TopItems(sorted.map(_._1), sorted.map(_._2))
    }

    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[TopItems] = Encoders.product[TopItems]
  }

  /** Column form: Misra–Gries top items of a string column. */
  def topItems(c: Column, k: Int = 64): Column =
    org.apache.spark.sql.functions.udaf(new Sketch(k)).apply(c)
}
