package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[DotProductExpression]] bit-equal to the higher-order
  * `aggregate(zip_with(cast, cast, _*_), 0d, _+_)` fold it replaced in
  * the r17 optimization — including fold ORDER (same doubles, not just
  * close), float widening, and the null totality (null array, length
  * mismatch, null element). */
class DotProductSpec extends SparkSpec {

  private def hof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a.cast("array<double>"), b.cast("array<double>"),
      (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  test("bit-equal to the HOF fold on random float arrays") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 200).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2f - 1f),
        Array.fill(64)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "a", "b")
    val cmp = df.select(
      DotProductExpression.dotCol(col("a"), col("b")).as("nat"),
      hof(col("a"), col("b")).as("hof"))
    // bit equality, not tolerance: the fold order must be identical
    assert(cmp.filter(col("nat") =!= col("hof")).count() == 0)
    assert(cmp.filter(col("nat").isNull).count() == 0)
  }

  test("null totality matches the HOF fold") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f, 4.0f))), // ok
      (None, Some(Seq(1.0f))), // null array
      (Some(Seq(1.0f, 2.0f)), Some(Seq(3.0f))), // length mismatch
      (Some(Seq.empty[Float]), Some(Seq.empty[Float])) // empty -> 0.0
    ).toDF("a", "b")
    val cmp = df.select(
      DotProductExpression.dotCol(col("a"), col("b")).as("nat"),
      hof(col("a"), col("b")).as("hof"))
    assert(cmp.filter(col("nat").isNull =!= col("hof").isNull).count() == 0)
    assert(cmp.filter(col("nat").isNotNull && col("nat") =!= col("hof"))
      .count() == 0)
  }

  test("null ELEMENT yields null like the HOF fold") {
    val df = spark.sql(
      "SELECT array(1.0D, CAST(NULL AS DOUBLE), 2.0D) AS a, " +
        "array(1.0D, 1.0D, 1.0D) AS b")
    val r = df.select(
      DotProductExpression.dotCol(col("a"), col("b")).as("nat"),
      hof(col("a"), col("b")).as("hof")).head
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("runs inside WholeStageCodegen") {
    // a range source, not a local Seq: an all-literal frame constant-
    // folds to LocalTableScan and never exercises doGenCode
    val df = spark.range(1, 2).select(
      DotProductExpression.dotCol(
        array(col("id").cast("float"), lit(2.0f)),
        array(lit(3.0f), lit(4.0f))).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the *(n) operator prefix IS the WholeStageCodegen marker in the
    // simple string form
    assert(plan.contains("*(1) Project") && plan.contains("dot_product_f"),
      s"expected a codegen'd dot_product_f projection in:\n$plan")
    assert(df.head.getDouble(0) == 11.0)
  }
}
