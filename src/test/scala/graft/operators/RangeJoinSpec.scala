package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  test("binned interval join equals the naive inequality join") {
    import spark.implicits._
    val probe = Seq((1L, 0L, 10L), (2L, 95L, 115L), (3L, 196L, 196L))
      .toDF("pid", "plo", "phi")
    val build = (0L to 300L by 7L).map(v => (v, v)).toDF("bid", "bv")
    val got = RangeJoin.intervalJoin(probe, col("plo"), col("phi"),
        build, col("bv"), binWidth = 16L)
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = probe.crossJoin(build)
      .filter(col("bv").between(col("plo"), col("phi")))
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === want)
    assert(want.nonEmpty && want.contains((3L, 196L)),
      "point interval (lo == hi) must match")
  }

  test("rewrite is exact (no duplicate pairs) and never nested-loops") {
    val df = RangeJoin.errorClickProximity(spark, sfDir)
    val n = df.count()
    assert(n === df.dropDuplicates("error_id", "click_id").count(),
      "each (probe, build) pair must appear exactly once")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoop"))
    // the ±60 s tolerance must actually bound the gap (microsecond-exact)
    assert(df.filter(abs(col("gap_us")) > 60000000L).count() === 0)
  }
}
