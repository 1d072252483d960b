package graft.functions

import org.scalacheck.{Gen, Prop}
import org.scalacheck.Test.{check, Parameters, Passed, Result}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pinning of the sketch-family MERGE LAWS at the
  * aggregator level: for EVERY input and EVERY partitioning of it,
  * folding the parts independently and merging the partial states must
  * equal the one-shot fold — state-identical, not just
  * estimate-identical. This is the exact algebraic property Spark's
  * partial aggregation relies on (map-side combines fold arbitrary row
  * subsets in arbitrary order; the shuffle merges partials in arbitrary
  * tree shapes), so a law violation here is a wrong-answer bug at any
  * parallelism ≥ 2 even if every fixed-fixture spec passes. The
  * Spark-side `mergeStatesExpr` bit-identity twins live in the
  * per-sketch specs; these run hundreds of randomized cases JVM-side
  * where they cost milliseconds. */
class SketchLawsSpec extends AnyFunSuite {

  private val params = Parameters.default.withMinSuccessfulTests(200)

  /** Random input + a random partitioning of it (possibly empty parts,
    * order scrambled — the shuffle's contract). */
  private def partitioned[T](g: Gen[T]): Gen[(List[T], List[List[T]])] =
    for {
      xs <- Gen.listOfN(120, g)
      seed <- Gen.choose(0, Int.MaxValue)
      nParts <- Gen.choose(1, 7)
    } yield {
      val rnd = new scala.util.Random(seed)
      val shuffled = rnd.shuffle(xs)
      val parts = List.tabulate(nParts)(p =>
        shuffled.zipWithIndex.collect {
          case (x, i) if i % nParts == p => x })
      (xs, parts)
    }

  /** Left-fold a part, then merge partials in a right-leaning tree (a
    * different shape than Spark's, on purpose — associativity). */
  private def foldParts[A, B](zero: () => B, reduce: (B, A) => B,
      merge: (B, B) => B)(parts: List[List[A]]): B =
    parts.map(_.foldLeft(zero())(reduce)).reduceRight(merge)

  test("KMV: partitioned fold + merge ≡ one-shot, any split, any k") {
    val prop = Prop.forAll(partitioned(Gen.choose(0, 400).map(i => s"v$i")),
        Gen.oneOf(4, 16, 64, 1024)) { case ((xs, parts), k) =>
      val agg = new KmvSketch.DistinctSketch(k)
      val one = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = foldParts(() => agg.zero, agg.reduce, agg.merge)(parts)
      merged == one && agg.finish(merged) == agg.finish(one)
    }
    val res: Result = check(params, prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("Quantile: partitioned fold + merge ≡ one-shot (state AND every " +
      "discrete quantile)") {
    val rowGen = Gen.zip(Gen.choose(0L, 5000L), Gen.choose(-1e6, 1e6))
    val prop = Prop.forAll(partitioned(rowGen), Gen.oneOf(8, 32, 256)) {
      case ((xs, parts), k) =>
        val agg = new QuantileSketch.QuantileStateSketch(k)
        val one = xs.foldLeft(agg.zero)(agg.reduce)
        val merged = foldParts(() => agg.zero, agg.reduce, agg.merge)(parts)
        merged == one && agg.finish(merged) == agg.finish(one)
    }
    val res: Result = check(params, prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("Priority: partitioned fold + merge ≡ one-shot, and the " +
      "below-n estimate is the exact sum") {
    val rowGen = Gen.zip(Gen.choose(0L, 100000L), Gen.choose(1L, 9999L))
    val prop = Prop.forAll(partitioned(rowGen), Gen.oneOf(5, 50, 500)) {
      case ((xs0, _), n) =>
        // ids must be unique (the sketch's id contract); dedup by key,
        // then split the deduped list round-robin
        val xs = xs0.distinctBy(_._1)
        val clean = List.tabulate(3)(p =>
          xs.zipWithIndex.collect { case (x, i) if i % 3 == p => x })
        val agg = new PrioritySample.PriorityStateSketch(n)
        val one = xs.foldLeft(agg.zero)(agg.reduce)
        val merged = foldParts(() => agg.zero, agg.reduce, agg.merge)(clean)
        val stateLaw = merged == one && agg.finish(merged) == agg.finish(one)
        val exactLaw = xs.size > n || {
          val fin = agg.finish(one)
          fin.map(_._3).sum == xs.map(_._2).sum
        }
        stateLaw && exactLaw
    }
    val res: Result = check(params, prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("Misra-Gries: exact regime state-identical under any split; " +
      "estimate regime keeps size, under-count, and coverage bounds " +
      "under any merge tree") {
    val prop = Prop.forAll(
        // zipf-ish: quadratic skew so hot items exist under small k
        partitioned(Gen.choose(0, 19).map(i => s"v${i * i / 7}")),
        Gen.oneOf(3, 8, 64)) { case ((xs, parts), k) =>
      val agg = new HeavyHitters.Sketch(k)
      val one = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = foldParts(() => agg.zero, agg.reduce, agg.merge)(parts)
      val truth = xs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = xs.size.toDouble
      val eps = n / (k + 1)
      if (truth.size <= k) {
        // exact regime: no decrement can fire in the one-shot fold, no
        // truncation in any merge — every path IS the histogram
        merged.counters == truth && one.counters == truth
      } else {
        merged.counters.size <= k &&
          merged.counters.forall { case (item, c) =>
            val t = truth(item); c <= t && t - c <= eps } &&
          truth.forall { case (item, t) =>
            t <= eps || merged.counters.contains(item) }
      }
    }
    val res: Result = check(params, prop)
    assert(res.status == Passed, res.status.toString)
  }

  test("Bloom: partitioned fold + OR-merge ≡ one-shot words, and no " +
      "false negatives ever") {
    val prop = Prop.forAll(partitioned(Gen.choose(0, 300).map(i => s"b$i")),
        Gen.oneOf(256, 4096)) { case ((xs, parts), nBits) =>
      val agg = new BloomSketch.BloomStateSketch(nBits, 4)
      val one = xs.foldLeft(agg.zero)(agg.reduce)
      val merged = foldParts(() => agg.zero, agg.reduce, agg.merge)(parts)
      java.util.Arrays.equals(merged, one) &&
        xs.forall(BloomSketch.testBits(one, _, 4))
    }
    val res: Result = check(params, prop)
    assert(res.status == Passed, res.status.toString)
  }
}
