package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering for multi-dimensional data skipping —
  * the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave
  * the bits of two (or more) filter columns into one sort key, range-
  * partition + sort the corpus by it, and every written file covers a
  * small RECTANGLE of the (x, y) space instead of a thin stripe. A
  * conjunctive filter `x BETWEEN … AND y BETWEEN …` then prunes most
  * files from their parquet min/max footer stats alone.
  *
  * Why this matters at 100 TB: a corpus laid out by one dimension answers
  * filters on that dimension only; every other predicate scans everything.
  * Z-ordering makes BOTH dimensions skippable at once, at the cost of one
  * write-time range shuffle — the classic read-amplification trade.
  * `ZorderSpec` pins the effect quantitatively: the summed per-file
  * bounding-box area of the z-ordered layout must be a fraction of the
  * linear layout's.
  *
  * The curve math is plain bit arithmetic (no UDF, fully codegen'd), and
  * exactly re-derivable in ANSI SQL — which is what the `q_zorder` oracle
  * does.
  */
object Zorder {

  /** Morton interleave of the low `bits` bits of `x` and `y`: x's bit i
    * lands at position 2i, y's at 2i+1. Inputs are masked to `bits`, so
    * callers bucket first (the curve needs small dense dims). */
  def zValue(x: Column, y: Column, bits: Int = 8): Column = {
    val xm = x.cast("long") % lit(1L << bits)
    val ym = y.cast("long") % lit(1L << bits)
    (0 until bits).map { i =>
      shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Per-document curve position over the two demo dims a corpus filter
    * actually uses — a length bucket (n_chars DIV 50) and an id-derived
    * stand-in for a source/time bucket (doc_id mod 256). Narrow codegen'd
    * map; `q_zorder`'s DuckDB oracle re-derives every bit. */
  def docZValues(spark: SparkSession, dir: String,
      bits: Int = 8): DataFrame = {
    val xb = (col("n_chars") / lit(50L)).cast("long") % lit(1L << bits)
    val yb = col("doc_id") % lit(1L << bits)
    Tables.documents(spark, dir)
      .select(col("doc_id"), xb.as("xb"), yb.as("yb"),
        zValue(xb, yb, bits).as("zval"))
  }

  /** Write-side layout: range-partition on the curve key and sort within
    * partitions, so each output file owns a contiguous z-range = a small
    * (x, y) rectangle. `nFiles` is the compaction knob ([[Pipeline.compact]]
    * sizing applies). Range boundaries come from Spark's reservoir
    * sampling — layout-only nondeterminism, the data itself is untouched. */
  def zOrderLayout(df: DataFrame, x: Column, y: Column, nFiles: Int,
      bits: Int = 8): DataFrame = {
    val keyed = df.withColumn("zval", zValue(x, y, bits))
    keyed.repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
  }

  /** `OPTIMIZE ... ZORDER BY` in one pass — the standing maintenance
    * rewrite of a long-lived table: file count sized to ~`targetBytes`
    * from plan statistics ([[Pipeline.compactionPartitions]], the
    * compaction rule) AND clustered on the Morton curve of the two
    * filter dimensions (the data-skipping rule). The combined rewrite
    * costs the SAME one range shuffle either half costs alone, which is
    * why table formats fuse them; running compaction round-robin first
    * would just destroy the clustering a second shuffle then rebuilds. */
  def optimizeLayout(df: DataFrame, x: Column, y: Column,
      targetBytes: Long = 128L * 1024 * 1024, bits: Int = 8): DataFrame =
    zOrderLayout(df, x, y,
      Pipeline.compactionPartitions(df, targetBytes), bits)
}
