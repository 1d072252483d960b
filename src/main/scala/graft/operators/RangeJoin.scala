package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Range (interval) join without a cartesian product — the binned
  * equi-join rewrite. Spark's built-in answer to a pure inequality join
  * (no equality key) is BroadcastNestedLoopJoin, which at 100 TB is a
  * non-starter whenever neither side broadcasts.
  *
  * Rewrite: quantize the range axis into fixed-width bins. The probe side
  * explodes each interval [lo, hi] to the bins it overlaps
  * (≤ (hi-lo)/binWidth + 1 rows — bounded because intervals are bounded);
  * the build side tags each value with its single bin. The join is then an
  * EQUI-join on the bin id (shuffle keyed, AQE-skew-handled, sort-merge or
  * hash) plus a residual BETWEEN filter for exactness. Each build row lives
  * in exactly one bin and the probe's bins are distinct, so no dedup pass
  * is needed — the rewrite is exact, not a candidate generator.
  *
  * Choose binWidth ≈ the typical interval width: probe fan-out stays ~2×
  * while each bin holds only values that can actually match.
  */
object RangeJoin {

  /** Join `probe` (interval [lo, hi], both inclusive, LONG expressions) to
    * `build` (point value `v`, LONG expression): one output row per
    * (probe, build) pair with v ∈ [lo, hi]. Column sets must be disjoint. */
  def intervalJoin(probe: DataFrame, lo: Column, hi: Column,
      build: DataFrame, v: Column, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = probe
      .withColumn("_lo", lo).withColumn("_hi", hi)
      .withColumn("_bin",
        explode(sequence(floor(col("_lo") / binWidth).cast("long"),
          floor(col("_hi") / binWidth).cast("long"))))
    val b = build
      .withColumn("_v", v)
      .withColumn("_bin", floor(col("_v") / binWidth).cast("long"))
    p.join(b, Seq("_bin"))
      .filter(col("_v").between(col("_lo"), col("_hi")))
      .drop("_bin", "_lo", "_hi", "_v")
  }

  /** Demo entry: temporal proximity join with NO equality key — every
    * (error, click) event pair within ±60 s of each other, regardless of
    * user. Bin width = the tolerance, so each error probes ≤ 3 bins.
    * The range check runs at FULL microsecond precision (the native
    * resolution of the timestamps — truncating to ms would over-include
    * boundary pairs by up to 1 ms vs a timestamp-interval oracle);
    * output gap is exact integer microseconds (click − error, signed). */
  def errorClickProximity(spark: SparkSession, dir: String,
      toleranceUs: Long = 60000000L): DataFrame = {
    val events = Relational.events(spark, dir)
    val errors = events.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), unix_micros(col("ts")).as("e_us"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), unix_micros(col("ts")).as("c_us"))
    intervalJoin(
      errors, col("e_us") - toleranceUs, col("e_us") + toleranceUs,
      clicks, col("c_us"), binWidth = toleranceUs)
      .select(col("error_id"), col("click_id"),
        (col("c_us") - col("e_us")).as("gap_us"))
  }
}
