package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.immutable.TreeSet

/** KMV (k-minimum-values) distinct-count sketch as a typed Spark
  * `Aggregator` — demonstrates the custom-aggregation extension point
  * (SURVEY §7.3 ladder: compose > Expression/TypedColumn > Plan/Strategy).
  *
  * The sketch keeps the k smallest 64-bit hashes seen; the estimator is
  * (k-1) / kthMinFraction. Deterministic (fixed hash, no RNG), mergeable
  * (union of sets, re-truncated to k) — so it parallelizes as a proper
  * partial aggregate: map-side partials shuffle only k longs per group.
  * At 100 TB this is the shape of every sketch pipeline (HLL, theta):
  * constant-size state per group, exact merge semantics.
  */
object KmvSketch {

  /** Sketch state: the k smallest hashes (as a sorted set). */
  final case class State(k: Int, mins: TreeSet[Long])

  /** MurmurHash3's 64-bit avalanche finalizer (fmix64, public domain).
    * FNV-1a alone is NOT uniform enough for order statistics: on short
    * sequential keys (numeric ids rendered as strings) the raw k-minimum
    * estimate measured -24% at n=15k/k=256 and +85% at n=150k/k=1024 on
    * the sf1 fixtures; with this finalizer the same draws land within
    * KMV's expected ~1/sqrt(k-2) error. Every estimator that divides by
    * a hash FRACTION (KMV, quantile bottom-k sampling) must route
    * through this. */
  private[functions] def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  private def hash64(s: String): Long = {
    // FNV-1a 64-bit (stable across JVMs, no dependencies) + fmix64
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    fmix64(h) & Long.MaxValue // non-negative for the fraction estimate
  }

  final class DistinctSketch(k: Int) extends Aggregator[String, State, Long] {
    override def zero: State = State(k, TreeSet.empty)

    override def reduce(b: State, a: String): State = {
      val h = hash64(a)
      if (b.mins.size < b.k) b.copy(mins = b.mins + h)
      else if (h < b.mins.max) b.copy(mins = (b.mins + h).take(b.k))
      else b
    }

    override def merge(x: State, y: State): State =
      x.copy(mins = (x.mins ++ y.mins).take(x.k))

    override def finish(s: State): Long = {
      if (s.mins.size < s.k) s.mins.size.toLong // exact below k
      else {
        val kth = s.mins.max.toDouble / Long.MaxValue.toDouble
        math.round((s.k - 1) / kth)
      }
    }

    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Column form: approximate distinct count of a string column. */
  def approxDistinct(c: Column, k: Int = 256): Column =
    org.apache.spark.sql.functions.udaf(new DistinctSketch(k))
      .apply(c)

  /** Sketch STATE as a column value: the k smallest distinct hashes,
    * sorted ascending. Unlike [[approxDistinct]] (which finishes to the
    * estimate), the state is STORABLE and MERGEABLE — write one row per
    * source/shard/snapshot into a sketch table, and later union, diff, or
    * re-estimate across any grouping WITHOUT rescanning the raw corpus.
    * That deferred-merge algebra is the whole point of sketch tables at
    * 100 TB: nightly per-shard sketches are a few KB each, and every
    * cross-shard distinct/overlap question becomes arithmetic over them.
    */
  final class StateSketch(k: Int)
      extends Aggregator[String, State, Array[Long]] {
    private val inner = new DistinctSketch(k)
    override def zero: State = inner.zero
    override def reduce(b: State, a: String): State = inner.reduce(b, a)
    override def merge(x: State, y: State): State = inner.merge(x, y)
    override def finish(s: State): Array[Long] = s.mins.toArray
    override def bufferEncoder: Encoder[State] = Encoders.kryo[State]
    override def outputEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  def sketchState(c: Column, k: Int = 256): Column =
    org.apache.spark.sql.functions.udaf(new StateSketch(k)).apply(c)

  /** Merge an array-of-states column (e.g. `collect_list(sketch)` over
    * stored sketch rows, or `array(a.sketch, b.sketch)` across a join)
    * back into one valid state: distinct hashes, sorted, truncated to k.
    * Pure codegen'd array expressions — the merge never touches raw data.
    */
  def mergeStatesExpr(states: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    slice(array_sort(array_distinct(flatten(states))), 1, k)
  }

  /** The [[DistinctSketch]] estimator over a state column: exact size
    * below k (the state still holds every distinct hash), else
    * (k-1)/kthMinFraction — bit-compatible with `finish` (same
    * round-half-up on a positive double). */
  def estimateExpr(state: Column, k: Int): Column = {
    import org.apache.spark.sql.functions._
    ExprLet.bindCompound(state) { st =>
      when(size(st) < k, size(st).cast("long"))
        .otherwise(round(lit((k - 1).toDouble) /
          (element_at(st, k).cast("double") / Long.MaxValue.toDouble))
          .cast("long"))
    }
  }
}
