package graft.operators

import org.apache.spark.sql.SparkSession

/** Pre-flight candidate-volume guard for the EXACT pair-join family
  * (round-14, verdict task #2).
  *
  * The second-decade scale sweep (`BENCH_sf10_r14.json`) measured the
  * exact pair joins going quadratic under domain/band saturation —
  * [[DedupSpans.editDistancePairs]] warm ×99.5 at ×10 data (42M → 4.2B
  * banded candidates), [[DedupSetSim.setSimPairs]] warm ×28 — while
  * their signature-based alternatives stayed ≤×7/decade. Both operators
  * remain CORRECT in that regime; they are just the wrong tool, and
  * before round 14 the only way to find out was to pay for the job
  * ("runs fine at sf0.1" is exactly the 100 TB trap). This guard makes
  * the candidate volume a NUMBER computed before the join runs, the
  * same economics as the `q_join_estimate` sketch pre-flight: each
  * operator derives its enumerated-candidate-row count from the tiny
  * aggregate it already owns (length histogram / prefix-token document
  * frequencies — one map-side pass over a build-once table, cached per
  * corpus alongside that table) and submits it here.
  *
  * Contract: estimates at or below [[budget]] pass silently (the gate
  * fixtures and the sf1 twin are orders of magnitude under the default);
  * above HALF the budget a stderr warning names the volume; above the
  * budget the call FAILS with the estimate, the regime diagnosis, and
  * the scale-safe alternative — failing a 569-second job in its first
  * second is the production-correct shape (a silent cap would change
  * results; these operators' contract is exactness). `set
  * spark.graft.pairGuard.maxCandidates` to raise the budget
  * deliberately, or to a value <= 0 to disable the guard entirely.
  */
object PairGuard {
  /** Session conf key for the enumerated-candidate-row budget. */
  val BudgetConf = "spark.graft.pairGuard.maxCandidates"

  /** Default budget: 5e8 enumerated candidate rows — calibrated
    * against the committed twin measurements (pair_volume rows in
    * `BENCH_sf10_r14.json`): at the sf1 twin both operators pass
    * silently with >4× headroom (edit 1.17e8, setsim 3.1e7 enumerated
    * rows); at the sf10 twin both fail fast (edit 1.17e10 — the
    * 569-second job — and setsim 9.1e8, the 238-second one). */
  val DefaultBudget = 500000000L

  def budget(spark: SparkSession): Long =
    spark.conf.get(BudgetConf, DefaultBudget.toString).toLong

  /** Validate `estimate` (enumerated candidate rows, pre-filter)
    * against the session budget. Throws above budget; warns above
    * budget/2; no-op when the budget is disabled (<= 0). */
  def check(spark: SparkSession, op: String, estimate: Double,
      alternative: String): Unit = {
    val b = budget(spark)
    if (b <= 0) return
    if (estimate > b.toDouble)
      throw new IllegalStateException(
        f"$op: pre-flight estimate of $estimate%.3g enumerated candidate " +
          f"rows exceeds the pair-join budget $b%d ($BudgetConf). The " +
          "corpus has left this exact operator's scale envelope " +
          s"(band/domain saturation - the candidate term is quadratic " +
          s"in documents-per-band). Scale-safe alternative: $alternative. " +
          "Raise the budget deliberately, or set it <= 0 to disable " +
          "the guard.")
    if (estimate * 2.0 > b.toDouble)
      System.err.println(
        f"[graft] $op: pre-flight candidate estimate $estimate%.3g is " +
          f"over half the pair-join budget $b%d ($BudgetConf) - " +
          s"approaching the saturated regime; consider $alternative")
  }
}
