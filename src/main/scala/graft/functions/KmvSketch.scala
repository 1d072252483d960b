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

  private def hash64(s: String): Long = {
    // FNV-1a 64-bit: stable across JVMs, no dependencies
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) {
      h ^= s.charAt(i)
      h *= 0x100000001b3L
      i += 1
    }
    h & Long.MaxValue // non-negative for the fraction estimate
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
}
