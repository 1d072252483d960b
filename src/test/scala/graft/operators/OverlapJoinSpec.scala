package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval×interval overlap join: the canonical-bin rewrite must equal
  * the naive cross-join filter exactly — including boundary touches,
  * multi-bin spans (where the dedup filter earns its keep), keyed and
  * keyless forms — and must not plan a cartesian product. */
class OverlapJoinSpec extends SparkSpec {

  import spark.implicits._

  private def naive(a: DataFrame, b: DataFrame,
      keyed: Boolean): Set[(Long, Long)] = {
    val j = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
    (if (keyed) j.filter(col("a_k") === col("b_k")) else j)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def binned(a: DataFrame, b: DataFrame, width: Long,
      keyed: Boolean): Set[(Long, Long)] =
    RangeJoin.overlapJoin(a, col("a_lo"), col("a_hi"),
        b, col("b_lo"), col("b_hi"), width,
        keys = if (keyed) Seq((col("a_k"), col("b_k"))) else Nil)
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("hand fixture: touches, containment, disjoint, negative coords") {
    val a = Seq((1L, 0L, 10L), (2L, 20L, 25L), (3L, -15L, -5L))
      .toDF("a_id", "a_lo", "a_hi").withColumn("a_k", lit(1))
    val b = Seq((10L, 10L, 12L),   // touches a1 at 10 (inclusive)
        (11L, 26L, 30L),           // disjoint from a2 (gap of 1)
        (12L, 2L, 3L),             // contained in a1
        (13L, -30L, -15L))         // touches a3 at -15
      .toDF("b_id", "b_lo", "b_hi").withColumn("b_k", lit(1))
    val expect = Set((1L, 10L), (1L, 12L), (3L, 13L))
    for (w <- Seq(1L, 3L, 7L, 100L)) {
      assert(binned(a, b, w, keyed = false) === expect, s"width=$w")
      assert(naive(a, b, keyed = false) === expect)
    }
  }

  test("randomized parity with the naive join, multiple bin widths, keyed and keyless") {
    val rnd = new scala.util.Random(1234)
    def mk(p: String, n: Int) = (0 until n).map { i =>
      val lo = rnd.nextInt(200).toLong - 100
      (i.toLong, lo, lo + rnd.nextInt(20).toLong, rnd.nextInt(3).toLong)
    }.toDF(s"${p}_id", s"${p}_lo", s"${p}_hi", s"${p}_k")
    val a = mk("a", 120).cache()
    val b = mk("b", 120).cache()
    for (keyed <- Seq(false, true); w <- Seq(1L, 5L, 16L, 1000L)) {
      val expect = naive(a, b, keyed)
      assert(expect.nonEmpty, "fixture must exercise matches")
      assert(binned(a, b, w, keyed) === expect, s"keyed=$keyed width=$w")
    }
    a.unpersist(); b.unpersist()
  }

  test("no cartesian product in the plan; equi-join on the bin") {
    val a = Seq((1L, 0L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 5L, 6L)).toDF("b_id", "b_lo", "b_hi")
    val out = RangeJoin.overlapJoin(a, col("a_lo"), col("a_hi"),
      b, col("b_lo"), col("b_hi"), 10L)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Cartesian"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
  }

  test("ship-week demo matches a per-row recomputation at sf0.001") {
    val out = RangeJoin.shipWeekOverlaps(spark, sfDir)
    val li = Relational.table(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
          .cast("long").as("lo"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val expect = (for {
      x <- li; y <- li
      if x._3 == y._3 // same part
      if x._4 <= y._4 + 7 && y._4 <= x._4 + 7
      if x._1 < y._1 || (x._1 == y._1 && x._2 < y._2)
    } yield ((x._1, x._2, y._1, y._2),
      math.min(x._4, y._4) + 7 - math.max(x._4, y._4) + 1)).toMap
    val got = out.collect().map(r =>
      ((r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3)),
        r.getLong(5))).toMap
    assert(got.size === expect.size)
    assert(got === expect)
    assert(got.nonEmpty, "fixture must produce overlapping ship weeks")
  }
}
