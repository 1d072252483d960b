package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeSet

/** Bottom-k uniform-sample quantile sketch — the quantile analogue of
  * [[KmvSketch]]: per group, keep the rows whose 64-bit row-id hashes
  * are the k smallest. Because the hash is uniform over row ids, the
  * kept rows are a uniform without-replacement sample of the group, so
  * the sample's empirical quantiles estimate the group's; below k the
  * state holds EVERY row and quantiles are exact (the oracle regime).
  *
  * Like the KMV sketch, the state is STORABLE and MERGEABLE with a
  * closed-form row-level merge (union the (hash, value) pairs, keep
  * the k smallest hashes — exactly what a one-shot sketch over the
  * union would have kept), so per-shard/per-snapshot sketch tables
  * answer later cross-shard quantile questions without rescanning raw
  * data. Deterministic end to end (fixed FNV hash, no RNG).
  *
  * Quantile rule: value at 1-based index `ceil(q·n)` of the
  * value-sorted sample — the discrete quantile (smallest value with
  * cumulative fraction >= q), matching DuckDB's `quantile_disc` /
  * Postgres `percentile_disc`, which is what lets the driver's SQL
  * oracle pin results exactly in the below-k regime.
  */
object QuantileSketch {

  /** Sketch state: the k pairs with smallest hashes, ordered by
    * (hash, value). */
  final case class State(k: Int, mins: TreeSet[(Long, Double)])

  /** FNV-1a 64-bit over the 8 bytes of a row id, avalanche-finalized
    * ([[KmvSketch.fmix64]]) — stable across JVMs, no dependencies,
    * non-negative (ordering-friendly). The finalizer is load-bearing:
    * the bottom-k-by-hash rows are the SAMPLE the quantile/range
    * estimators read, and raw FNV on sequential ids is not uniform
    * enough for that order statistic (see the fmix64 scaladoc). */
  private[functions] def hash64(id: Long): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < 8) {
      h ^= (id >>> (i * 8)) & 0xffL
      h *= 0x100000001b3L
      i += 1
    }
    KmvSketch.fmix64(h) & Long.MaxValue
  }

  /** Typed aggregator over (row id, value) pairs; finishes to the
    * storable state: (hash, value) pairs sorted by hash ascending. */
  final class QuantileStateSketch(k: Int)
      extends Aggregator[(Long, Double), State, Seq[(Long, Double)]] {
    override def zero: State = State(k, TreeSet.empty)

    override def reduce(b: State, a: (Long, Double)): State = {
      val e = (hash64(a._1), a._2)
      if (b.mins.size < b.k) b.copy(mins = b.mins + e)
      else if (Ordering[(Long, Double)].lt(e, b.mins.last))
        b.copy(mins = (b.mins + e).take(b.k))
      else b
    }

    override def merge(x: State, y: State): State =
      x.copy(mins = (x.mins ++ y.mins).take(x.k))

    override def finish(s: State): Seq[(Long, Double)] = s.mins.toSeq

    override def bufferEncoder: Encoder[State] =
      org.apache.spark.sql.Encoders.kryo[State]
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Sketch STATE as a column value (array of (hash, value) structs,
    * hash-ascending). `id` must be row-unique (e.g. doc_id) — it seeds
    * the uniform sample. */
  def sketchState(id: Column, v: Column, k: Int = 65536): Column =
    org.apache.spark.sql.functions.udaf(new QuantileStateSketch(k))
      .apply(id, v)

  /** Merge an array-of-states column back into one valid state: the k
    * smallest (hash, value) pairs of the union — bit-identical to a
    * one-shot sketch over the concatenated inputs (struct sort orders
    * by the leading hash field). Dedup is [[ExprLet.sortedDedup]]
    * (sort + adjacent-drop), NOT `array_distinct`: struct elements put
    * ArrayDistinct on its O(n²) interpreted path, which wedged the
    * 50k-element sf1 merge for tens of minutes (round-12 find). Never
    * touches raw data. */
  def mergeStatesExpr(states: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(ExprLet.sortedDedup(flatten(states)), 1, k)
  }

  /** Discrete quantile over a state column: value at 1-based index
    * ceil(q·n) of the value-sorted sample (exact below k). */
  def quantileExpr(state: Column, q: Double): Column = {
    import org.apache.spark.sql.functions._
    ExprLet.bindCompound(state) { st =>
      val vals = array_sort(transform(st, x => x.getField("_2")))
      // empty merged state (e.g. mergeStatesExpr over an empty
      // collect_list) must report NULL, not index position 1 of an empty
      // array — which errors under ANSI mode. Mirrors
      // rangeSelectivityExpr's no-evidence guard.
      when(size(st) === 0, lit(null).cast("double"))
        .otherwise(element_at(vals,
          greatest(lit(1), ceil(lit(q) * size(st))).cast("int")))
    }
  }

  /** Two-sample Kolmogorov–Smirnov statistic from two state columns:
    * max over the union support of |CDF_a(v) − CDF_b(v)| (inclusive
    * empirical CDFs — the sup of two step functions is attained at a
    * sample point, so evaluating at every support value is exact).
    * Below k each state holds its whole population, so this IS the
    * exact two-sample KS (the oracle regime); above k each side is a
    * uniform sample and the statistic carries the usual
    * ~sqrt((na+nb)/(na·nb)) sampling band. Either side empty → NULL
    * (no evidence ≠ no drift). O(k²) array arithmetic per row — the
    * sketch-TABLE regime (#groups rows), never raw data; every
    * intermediate is [[ExprLet]]-bound per the round-11 rule. */
  def ksExpr(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    ExprLet.bindCompound(a) { sa =>
      ExprLet.bindCompound(b) { sb =>
        ExprLet.bindOnce(transform(sa, x => x.getField("_2"))) { va =>
          ExprLet.bindOnce(transform(sb, x => x.getField("_2"))) { vb =>
            val na = size(va).cast("double")
            val nb = size(vb).cast("double")
            val support = array_distinct(concat(va, vb))
            val gaps = transform(support, v =>
              abs(size(filter(va, x => x <= v)).cast("double") / na -
                size(filter(vb, x => x <= v)).cast("double") / nb))
            when(size(sa) === 0 || size(sb) === 0,
              lit(null).cast("double"))
              .otherwise(round(array_max(gaps), 4))
          }
        }
      }
    }
  }

  /** Estimated fraction of the group's rows with value in [lo, hi]
    * (inclusive), read off a state column: the state is a uniform
    * without-replacement sample, so the sample fraction estimates the
    * population fraction — and below k the sample IS the population,
    * making the selectivity EXACT (the oracle regime). The planner-stat
    * use: range-predicate selectivity from stored sketch rows, no
    * rescan. Empty states report NULL (no evidence ≠ zero). */
  def rangeSelectivityExpr(state: Column, lo: Double,
      hi: Double): Column = {
    import org.apache.spark.sql.functions._
    ExprLet.bindCompound(state) { st =>
      val inRange = size(filter(st,
        x => x.getField("_2") >= lo && x.getField("_2") <= hi))
      when(size(st) === 0, lit(null).cast("double"))
        .otherwise(round(inRange.cast("double") /
          size(st).cast("double"), 4))
    }
  }
}
