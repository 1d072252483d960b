package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeSet

/** Priority sampling (Duffield–Lund–Thorup, JACM 2007) as a mergeable
  * sketch — the SUBSET-SUM member of the sketch-table algebra:
  * [[KmvSketch]] states answer distinct counts, [[QuantileSketch]]
  * states answer percentiles, priority-sample states answer "what is
  * the total WEIGHT (bytes, tokens, chars) of the items matching a
  * later predicate" from a bounded sample of stored rows.
  *
  * Each item draws priority q = w / u with u a DETERMINISTIC uniform in
  * (0,1] from its id (the `hashUniform` two-round multiplicative hash
  * the weighted-sample operator uses — reproducible across runs,
  * engines, partitionings); the state keeps the n+1 largest priorities.
  * The estimator: with τ = the (n+1)-th priority, each sampled item
  * estimates its weight as max(w, τ), and Σ max(w, τ) over the top n is
  * an UNBIASED estimate of the true Σw — near-optimal variance among
  * all n-sample schemes. Below n+1 items the state holds everything,
  * τ = 0, and the estimate IS the exact sum (the oracle regime, same
  * contract as exact-below-k KMV).
  *
  * Merge law: top-(n+1)-by-priority of a union = top-(n+1) of the
  * concatenated per-part tops, so the row-level merge is exact — per
  *-shard sample rows roll up to whole-corpus estimates without
  * rescanning anything (spec-pinned bit-identical to a one-shot state).
  */
object PrioritySample {

  /** Deterministic uniform in (0,1] from a row id — exact BIGINT
    * arithmetic mod 1e9+7 (products < 2^63; the `fpCte`/`hashUniform`
    * convention), then one exact double division. */
  private[functions] def uniform(id: Long): Double = {
    val M = 1000000007L
    val h1 = (((id % M) + M) % M) * 2654435761L % M + 1013904223L
    val h2 = (h1 % M) * 1597334677L % M + 362437L
    ((h2 % M) + 1L).toDouble / 1000000008.0
  }

  /** Sample entry ordered by (priority, id); the TreeSet keeps the
    * n+1 LARGEST priorities (minimum dropped on overflow). */
  private type Entry = (Double, Long, Long) // (priority, id, weight)

  final case class State(n: Int, top: TreeSet[Entry])

  final class PriorityStateSketch(n: Int)
      extends Aggregator[(Long, Long), State, Seq[(Double, Long, Long)]] {
    require(n >= 1, s"sample size n must be >= 1, got $n")

    override def zero: State = State(n, TreeSet.empty)

    override def reduce(b: State, a: (Long, Long)): State = {
      val (id, w) = a
      val e: Entry = (w.toDouble / uniform(id), id, w)
      if (b.top.size < b.n + 1) b.copy(top = b.top + e)
      else if (Ordering[Entry].gt(e, b.top.head)) {
        // a duplicate id fed twice is a TreeSet no-op: only drop the
        // current minimum when the insert actually grew the set, else
        // the sample silently shrinks and the estimator biases.
        val u = b.top + e
        b.copy(top = if (u.size > b.n + 1) u.drop(1) else u)
      } else b
    }

    override def merge(x: State, y: State): State = {
      val u = x.top ++ y.top
      x.copy(top = if (u.size <= x.n + 1) u else u.takeRight(x.n + 1))
    }

    /** Priority-DESCENDING array (largest first): index n+1, when
      * present, is τ — the threshold the estimator censors with. */
    override def finish(s: State): Seq[(Double, Long, Long)] =
      s.top.toSeq.reverse

    override def bufferEncoder: Encoder[State] =
      org.apache.spark.sql.Encoders.kryo[State]
    override def outputEncoder: Encoder[Seq[(Double, Long, Long)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Double, Long, Long)]]()
  }

  /** Sample STATE as a column value: array of (priority, id, weight)
    * structs, priority-descending, length ≤ n+1. `id` must be
    * row-unique; `w` is the weight being subset-summed. */
  def sketchState(id: Column, w: Column, n: Int = 65536): Column =
    org.apache.spark.sql.functions.udaf(new PriorityStateSketch(n))
      .apply(id, w)

  /** Row-level merge of an array-of-states column: the n+1 largest
    * priorities of the union, priority-descending — bit-identical to a
    * one-shot state over the concatenated inputs. Struct `array_sort`
    * orders by the leading field ascending, so sort then take the LAST
    * n+1 and reverse. Pure codegen'd array expressions. */
  def mergeStatesExpr(states: Column, n: Int): Column = {
    import org.apache.spark.sql.functions._
    // dedup matches the aggregator's TreeSet-union merge: states
    // sharing rows (same snapshot listed twice, overlapping inputs)
    // must not double-count entries, or the merge law breaks. Via
    // ExprLet.sortedDedup, not array_distinct — struct elements put
    // ArrayDistinct on its O(n²) interpreted path (round-12 find) —
    // and let-bound, since `asc` is referenced three times below (the
    // unbound form re-ran the sort+dedup per reference).
    ExprLet.bindOnce(ExprLet.sortedDedup(flatten(states))) { asc =>
      reverse(slice(asc, greatest(lit(1), size(asc) - n), lit(n + 1)))
    }
  }

  /** The DLT subset-sum estimator over a state column: exact Σw when
    * the state holds every item (τ = 0), else Σ max(w, τ) over the top
    * n with τ = the (n+1)-th priority. Integer-exact in the below-n
    * regime (the aggregate runs on BIGINT weights). */
  def totalExpr(state: Column, n: Int): Column = {
    import org.apache.spark.sql.functions._
    // bindCompound matters doubly here: `tau` sits INSIDE the censored
    // aggregate's lambda, so an unbound merged-state argument would
    // re-run the whole merge once per sampled element (n× per row).
    ExprLet.bindCompound(state) { st =>
      val exact = aggregate(st, lit(0L),
        (acc, e) => acc + e.getField("_3")).cast("double")
      val tau = element_at(st, n + 1).getField("_1")
      val censored = aggregate(slice(st, 1, n), lit(0.0),
        (acc, e) => acc +
          greatest(e.getField("_3").cast("double"), tau))
      when(size(st) <= n, exact).otherwise(round(censored, 4))
    }
  }
}
