package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import scala.util.Random

/** Count-Min sketch: the over-only theorem (estimate >= true, always),
  * expected-excess sanity, the EXACT merge algebra (merged state ==
  * one-shot state, so partial/merged estimates are bit-identical), row
  * conservation, and the distributed aggregator vs a plain-Scala
  * reference on random inputs. */
class CountMinSketchSpec extends SparkSpec {

  private val depth = 4
  private val width = 64

  /** Plain-Scala reference CM over the same hash definition. */
  private def refState(items: Seq[String]): Array[Long] = {
    val st = new Array[Long](depth * width)
    items.foreach { s =>
      (0 until depth).foreach { r =>
        st(r * width + CountMinSketch.index(s, r, width)) += 1L
      }
    }
    st
  }

  private def refEstimate(st: Array[Long], s: String): Long =
    (0 until depth).map(r => st(r * width + CountMinSketch.index(s, r, width))).min

  test("distributed state equals the plain-Scala reference on random input") {
    import spark.implicits._
    val rnd = new Random(23)
    val items = Seq.fill(5000)(s"u${rnd.nextInt(300)}")
    val got = items.toDF("s").repartition(8)
      .agg(CountMinSketch.sketchState(col("s"), depth, width).as("st"))
      .collect()(0).getSeq[Long](0)
    assert(got === refState(items).toSeq)
  }

  test("over-only theorem: estimate >= true count for every item") {
    val rnd = new Random(41)
    val items = Seq.fill(8000)(s"k${rnd.nextInt(500)}")
    val st = refState(items)
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong)
    truth.foreach { case (s, n) =>
      assert(refEstimate(st, s) >= n, s"item $s")
    }
    // absent items may overcount but never undercount zero
    (0 until 50).foreach(i => assert(refEstimate(st, s"absent$i") >= 0L))
  }

  test("merge algebra is exact: merged state == one-shot state") {
    import spark.implicits._
    val rnd = new Random(7)
    val parts = Seq.fill(3)(Seq.fill(2000)(s"m${rnd.nextInt(200)}"))
    val oneShot = refState(parts.flatten)
    // distributed: one state per part, merged with the column expression
    val df = parts.zipWithIndex
      .flatMap { case (xs, i) => xs.map(x => (i, x)) }
      .toDF("part", "s")
    val merged = df.groupBy("part")
      .agg(CountMinSketch.sketchState(col("s"), depth, width).as("st"))
      .agg(collect_list(col("st")).as("sts"))
      .select(CountMinSketch.mergeStatesExpr(col("sts"), depth, width)
        .as("m"))
      .collect()(0).getSeq[Long](0)
    assert(merged === oneShot.toSeq)
  }

  test("estimateItem / totalExpr column probes match the reference") {
    import spark.implicits._
    val rnd = new Random(99)
    val items = Seq.fill(4000)(s"p${rnd.nextInt(150)}")
    val st = refState(items)
    val stDf = items.toDF("s")
      .agg(CountMinSketch.sketchState(col("s"), depth, width).as("st"))
    val probeItems = Seq("p0", "p1", "p77", "nope")
    val row = stDf.select(
      probeItems.map(p =>
        CountMinSketch.estimateItem(col("st"), p, depth, width)
          .as(s"e_$p")) :+
      CountMinSketch.totalExpr(col("st"), width).as("n"): _*)
      .collect()(0)
    probeItems.zipWithIndex.foreach { case (p, i) =>
      assert(row.getLong(i) === refEstimate(st, p), p)
    }
    assert(row.getLong(probeItems.size) === items.size.toLong)
  }

  test("native probe expression matches the reference and stays codegen'd") {
    import spark.implicits._
    val rnd = new Random(3)
    val items = Seq.fill(3000)(s"w${rnd.nextInt(120)}")
    val st = refState(items)
    val df = (items.take(200) ++ Seq("absent1", "absent2")).toDF("s")
      .select(col("s"),
        CountMinSketch.estimate(col("s"), st, depth, width).as("est"))
    df.collect().foreach { r =>
      assert(r.getLong(1) === refEstimate(st, r.getString(0)), r.getString(0))
    }
    // NULL item -> 0, not NULL (total function)
    val nulls = Seq(Some("w0"), None).toDF("s")
      .select(CountMinSketch.estimate(col("s"), st, depth, width).as("e"))
      .collect()
    assert(!nulls(1).isNullAt(0) && nulls(1).getLong(0) === 0L)
    // the probe rides inside a WholeStageCodegen projection
    val plan = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(CountMinSketch.estimate(col("source"), st, depth, width)
        .as("e"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [cm_estimate"), plan)
  }

  test("layout validation refuses bad depth/width") {
    intercept[IllegalArgumentException](
      CountMinSketch.sketchState(col("s"), depth = 0, width = 64))
    intercept[IllegalArgumentException](
      CountMinSketch.sketchState(col("s"), depth = 4, width = 100))
    intercept[IllegalArgumentException](
      CountMinSketch.sketchState(col("s"), depth = 4, width = 8))
  }

  test("weighted state over the frequency table is bit-identical to " +
    "the occurrence-stream state (additivity law)") {
    import spark.implicits._
    val rnd = new Random(67)
    val items = Seq.fill(6000)(s"w${rnd.nextInt(400)}")
    val plain = items.toDF("s").repartition(8)
      .agg(CountMinSketch.sketchState(col("s"), depth, width).as("st"))
      .collect()(0).getSeq[Long](0)
    val weighted = items.groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.toDF("s", "f").repartition(8)
      .agg(CountMinSketch.sketchStateWeighted(col("s"), col("f"),
        depth, width).as("st"))
      .collect()(0).getSeq[Long](0)
    assert(weighted === plain)
    assert(weighted === refState(items).toSeq)
  }
}
