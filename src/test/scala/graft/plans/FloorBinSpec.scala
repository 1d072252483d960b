package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.graftshim.GraftSqlShim
import org.apache.spark.sql.functions._

/** FloorBin = the exact-Long bin arithmetic shared by RangeBinJoinRule
  * and the RangeJoin operators. Oracle: java.lang.Math.floorDiv /
  * BigInt, across the full Long domain including every value a double
  * floor mis-handles (>2^53) and the extreme edges the overflow-free
  * decomposition exists for. */
class FloorBinSpec extends SparkSpec {

  private val widths = Seq(1L, 2L, 3L, 7L, 1000L, 3600000000L)

  private val values: Seq[Long] = Seq(
    0L, 1L, -1L, 999L, -999L, 1000L, -1000L,
    9007199254740992L, 9007199254740993L, -9007199254740993L, // 2^53±
    1700000000000000896L, 1700000000000000000L,               // ns epochs
    Long.MaxValue, Long.MinValue, Long.MaxValue - 1L, Long.MinValue + 1L)

  test("floorDiv equals Math.floorDiv over adversarial values and widths") {
    import spark.implicits._
    val df = values.toDF("x")
    for (w <- widths) {
      val got = df.select(col("x"),
        GraftSqlShim.column(FloorBin.floorDiv(
          GraftSqlShim.expression(col("x")), w)).as("bin"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (x <- values)
        assert(got(x) === Math.floorDiv(x, w), s"floorDiv($x, $w)")
    }
  }

  test("floorDivShifted equals BigInt floor((x+k)/w), including where x+k overflows a Long") {
    import spark.implicits._
    def exact(x: Long, k: Long, w: Long): BigInt = {
      val s = BigInt(x) + BigInt(k)
      val q = s / w // BigInt / truncates toward zero
      if (s % w < 0) q - 1 else q
    }
    val shifts = Seq(0L, 1L, -1L, 1000L, -1000L, 123456789L)
    for (w <- widths; k <- shifts if FloorBin.shiftSafe(k, w)) {
      // keep only inputs whose true bin fits in a Long — the rewrite's
      // contract: an out-of-range bin belongs to a right value whose
      // band no Long left value can reach, so it only ever produces a
      // junk bin the residual filters (never a dropped true match)
      val in = values.filter(x => exact(x, k, w).isValidLong)
      val got = in.toDF("x").select(col("x"),
        GraftSqlShim.column(FloorBin.floorDivShifted(
          GraftSqlShim.expression(col("x")), k, w)).as("bin"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (x <- in)
        assert(got(x) === exact(x, k, w).toLong, s"floorDivShifted($x, $k, $w)")
    }
  }

  test("shiftSafe: boundary algebra") {
    assert(FloorBin.shiftSafe(0L, 1L))
    assert(FloorBin.shiftSafe(Long.MaxValue, 1L))        // r ∈ [0,1) = {0}
    assert(!FloorBin.shiftSafe(Long.MaxValue, 2L))       // r=1 overflows
    assert(FloorBin.shiftSafe(Long.MaxValue - 1L, 2L))
    assert(FloorBin.shiftSafe(Long.MinValue, 1000L))     // negative k always safe
  }

  test("floorDiv rejects non-positive widths") {
    intercept[IllegalArgumentException] {
      FloorBin.floorDiv(
        org.apache.spark.sql.catalyst.expressions.Literal(1L), 0L)
    }
  }
}
