package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins [[SlotAgreeExpression]] equal to the higher-order
  * `aggregate(zip_with(a, b, (x,y) => (x===y).cast(int)), 0, _+_)` it
  * replaced in the MinHash estimate scorers (r17), including the null
  * totality (null array, length mismatch). */
class SlotAgreeSpec extends SparkSpec {

  private def hof(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => (x === y).cast("int")),
      lit(0), (acc, x) => acc + x)

  test("equal to the HOF agreement count on random signatures") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { i =>
      // ~1/3 slot agreement by construction
      val a = Array.fill(64)(rnd.nextInt(3).toLong)
      val b = Array.fill(64)(rnd.nextInt(3).toLong)
      (i.toLong, a, b)
    }
    val cmp = rows.toDF("id", "a", "b").select(
      SlotAgreeExpression.countCol(col("a"), col("b")).as("nat"),
      hof(col("a"), col("b")).cast("long").as("hof"))
    assert(cmp.filter(col("nat") =!= col("hof")).count() == 0)
    assert(cmp.filter(col("nat").isNull).count() == 0)
  }

  test("null totality matches the HOF form") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(1L, 9L, 3L))), // 2 agree
      (None, Some(Seq(1L))), // null array
      (Some(Seq(1L, 2L)), Some(Seq(1L))), // length mismatch
      (Some(Seq.empty[Long]), Some(Seq.empty[Long])) // empty -> 0
    ).toDF("a", "b")
    val cmp = df.select(
      SlotAgreeExpression.countCol(col("a"), col("b")).as("nat"),
      hof(col("a"), col("b")).cast("long").as("hof"))
    assert(cmp.filter(col("nat").isNull =!= col("hof").isNull).count() == 0)
    assert(cmp.filter(col("nat").isNotNull && col("nat") =!= col("hof"))
      .count() == 0)
    assert(cmp.head.getLong(0) == 2L)
  }
}
