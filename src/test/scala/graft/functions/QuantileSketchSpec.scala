package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  test("exact below k: sketch quantiles equal the discrete quantiles") {
    import spark.implicits._
    val n = 500
    val df = (1 to n).map(i => (i.toLong, (i * 7 % 997).toDouble))
      .toDF("id", "v")
    val state = df.agg(QuantileSketch.sketchState(col("id"), col("v"),
      k = 4096).as("st"))
    val got = state.select(
      QuantileSketch.quantileExpr(col("st"), 0.25).as("p25"),
      QuantileSketch.quantileExpr(col("st"), 0.5).as("p50"),
      QuantileSketch.quantileExpr(col("st"), 0.75).as("p75"),
      QuantileSketch.quantileExpr(col("st"), 1.0).as("p100"))
      .collect()(0)
    val sorted = (1 to n).map(i => (i * 7 % 997).toDouble).sorted
    def disc(q: Double) = sorted(math.ceil(q * n).toInt - 1)
    assert(got.getDouble(0) === disc(0.25))
    assert(got.getDouble(1) === disc(0.5))
    assert(got.getDouble(2) === disc(0.75))
    assert(got.getDouble(3) === sorted.last)
  }

  test("merge law: row-level merge of per-group states is bit-identical " +
      "to the one-shot sketch, above AND below k") {
    import spark.implicits._
    for (k <- Seq(16, 4096)) {
      val df = (1 to 900).map(i => (i.toLong, (i % 10).toString,
        (i * 13 % 101).toDouble)).toDF("id", "g", "v")
      val perGroup = df.groupBy("g")
        .agg(QuantileSketch.sketchState(col("id"), col("v"), k).as("st"))
      val merged = perGroup.agg(collect_list(col("st")).as("states"))
        .select(QuantileSketch.mergeStatesExpr(col("states"), k).as("st"))
      val oneShot = df.agg(
        QuantileSketch.sketchState(col("id"), col("v"), k).as("st"))
      val a = merged.collect()(0).getSeq[org.apache.spark.sql.Row](0)
      val b = oneShot.collect()(0).getSeq[org.apache.spark.sql.Row](0)
      assert(a === b, s"k=$k: merged state must equal one-shot state")
    }
  }

  test("above k: the bottom-k sample's quantiles track the population " +
      "within tolerance, deterministically") {
    import spark.implicits._
    val n = 20000
    val k = 512
    val df = (1 to n).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    def run() = df
      .agg(QuantileSketch.sketchState(col("id"), col("v"), k).as("st"))
      .select(QuantileSketch.quantileExpr(col("st"), 0.5))
      .collect()(0).getDouble(0)
    val est = run()
    // uniform sample of 512 from 1..20000: median within ~10% of n/2
    assert(math.abs(est - n / 2.0) / n < 0.1, s"median est $est")
    assert(run() === est, "fixed hash → deterministic estimate")
  }

  test("quantileExpr on an empty state reports NULL (no ANSI " +
      "element_at error), matching rangeSelectivityExpr's guard") {
    import spark.implicits._
    val empty = Seq(Seq.empty[(Long, Double)]).toDF("st")
    val row = empty.select(
      QuantileSketch.quantileExpr(col("st"), 0.5).as("q"),
      QuantileSketch.rangeSelectivityExpr(col("st"), 0.0, 1.0).as("sel"))
      .collect()(0)
    assert(row.isNullAt(0) && row.isNullAt(1))
    // and under ANSI mode the old unguarded form would have thrown
    val prior = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try {
      val r2 = empty.select(QuantileSketch.quantileExpr(col("st"), 0.5))
        .collect()(0)
      assert(r2.isNullAt(0))
    } finally spark.conf.set("spark.sql.ansi.enabled", prior)
  }

  test("sourceLengthQuantiles: __ALL__ comes from the state merge and " +
      "every value matches the exact discrete quantiles (below-k oracle " +
      "regime on the test corpus)") {
    val got = graft.operators.SketchOps
      .sourceLengthQuantiles(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val lens = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("source"), col("n_chars").cast("double"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    def disc(vs: Seq[Double], q: Double) = {
      val s = vs.sorted
      s(math.ceil(q * s.size).toInt - 1)
    }
    val bySrc = lens.groupBy(_._1).view.mapValues(_.map(_._2).toSeq)
    bySrc.foreach { case (src, vs) =>
      assert(got(src) === ((disc(vs, 0.25), disc(vs, 0.5), disc(vs, 0.75))),
        s"source $src")
    }
    val all = lens.map(_._2).toSeq
    assert(got("__ALL__") ===
      ((disc(all, 0.25), disc(all, 0.5), disc(all, 0.75))))
  }

  test("range selectivity: exact below k, sampled within 5 points " +
      "above k, NULL on empty, lo>hi rejected") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // above-k regime: 20k rows, k=512 — uniform-sample estimate of the
    // fraction in [0, 2999] (true 3/10)
    val df = (1L to 20000L).map(i => (i, (i % 10000).toDouble))
      .toDF("id", "v")
    val est = df.agg(QuantileSketch.sketchState(col("id"), col("v"),
        k = 512).as("s"))
      .select(QuantileSketch.rangeSelectivityExpr(col("s"), 0.0, 2999.0))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 0.3) < 0.05, s"sampled selectivity $est")
    // below k: exact
    val exact = df.limit(100)
      .agg(QuantileSketch.sketchState(col("id"), col("v"), k = 512)
        .as("s"))
      .select(QuantileSketch.rangeSelectivityExpr(col("s"), 0.0, 50.0))
      .collect()(0).getDouble(0)
    assert(exact === 0.5)
    val empty = df.filter(lit(false))
      .agg(QuantileSketch.sketchState(col("id"), col("v"), k = 16)
        .as("s"))
      .select(QuantileSketch.rangeSelectivityExpr(col("s"), 0.0, 1.0))
      .collect()(0)
    assert(empty.isNullAt(0), "empty state must report NULL")
    intercept[IllegalArgumentException](
      graft.operators.SketchOps.sourceLengthSelectivity(spark, sfDir,
        lo = 5.0, hi = 1.0))
  }
}
