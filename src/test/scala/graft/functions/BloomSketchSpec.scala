package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomSketchSpec extends SparkSpec {

  private def state(texts: Seq[String], nBits: Int = 1 << 12,
      nh: Int = 4): Array[Long] = {
    import spark.implicits._
    texts.toDF("t")
      .agg(BloomSketch.sketchState(col("t"), nBits, nh).as("b"))
      .collect()(0).getSeq[Long](0).toArray
  }

  test("no false negatives: every inserted key probes true") {
    val keys = (0 until 2000).map(i => s"key-$i")
    val words = state(keys)
    assert(keys.forall(BloomSketch.testBits(words, _, 4)))
  }

  test("false-positive rate on disjoint keys stays near theory") {
    val words = state((0 until 2000).map(i => s"in-$i"))
    val probes = (0 until 10000).map(i => s"out-$i")
    val fp = probes.count(BloomSketch.testBits(words, _, 4))
    // m=4096, n=2000, k=4 → p=(1-e^(-kn/m))^k ≈ 0.56 (deliberately
    // overloaded filter); allow slack but catch a broken hash (p→1)
    val rate = fp.toDouble / probes.size
    assert(rate < 0.75, s"FP rate $rate — hashing degenerate")
    assert(rate > 0.2, s"FP rate $rate — filter suspiciously empty")
  }

  test("merge law: OR-merge of per-part states is bit-identical to a " +
      "one-shot state over the union") {
    import spark.implicits._
    val parts = (0 until 4).map(p =>
      (0 until 500).map(i => s"part$p-item-$i"))
    val oneShot = state(parts.flatten)
    val perPart = parts.zipWithIndex
      .map { case (ks, p) => ks.map((p, _)) }.reduce(_ ++ _)
      .toDF("p", "t")
      .groupBy("p")
      .agg(BloomSketch.sketchState(col("t"), 1 << 12, 4).as("b"))
    val merged = perPart.agg(collect_list(col("b")).as("states"))
      .select(BloomSketch.mergeStatesExpr(col("states"), 1 << 12))
      .collect()(0).getSeq[Long](0).toArray
    assert(merged.toSeq === oneShot.toSeq)
  }

  test("probe expression matches the JVM probe and stays codegen'd") {
    import spark.implicits._
    val words = state((0 until 300).map(i => s"blk-$i"))
    val probeDf = ((0 until 300).map(i => s"blk-$i") ++
      (0 until 300).map(i => s"new-$i")).toDF("t")
      .select(col("t"),
        BloomSketch.mightContain(col("t"), words, 4).as("hit"))
    val got = probeDf.collect().map(r => r.getString(0) -> r.getBoolean(1))
    got.foreach { case (t, hit) =>
      assert(hit === BloomSketch.testBits(words, t, 4), t)
    }
    // NULL key → false (total function), and no UDF node in the plan
    val nullRow = Seq[Option[String]](None).toDF("t")
      .select(BloomSketch.mightContain(col("t"), words, 4).as("hit"))
    assert(nullRow.collect()(0).getBoolean(0) === false)
    val plan = probeDf.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      "probe must not introduce a UDF boundary")
  }

  test("cardinality estimate from fill ratio within 15%") {
    import spark.implicits._
    val df = (0 until 3000).map(i => s"card-$i").toDF("t")
      .agg(BloomSketch.sketchState(col("t"), 1 << 16, 4).as("b"))
      .select(BloomSketch.estimateExpr(col("b"), 4).as("est"),
        BloomSketch.bitsSetExpr(col("b")).as("bits"))
    val row = df.collect()(0)
    val est = row.getLong(0)
    assert(math.abs(est - 3000.0) / 3000.0 < 0.15, s"estimate $est")
    assert(row.getLong(1) > 0)
  }

  test("saturated state reports NULL, not a number") {
    import spark.implicits._
    val full = Seq(Seq.fill(4)(-1L)).toDF("b") // 256 bits all set
      .select(BloomSketch.estimateExpr(col("b"), 4).as("est"))
    assert(full.collect()(0).isNullAt(0))
  }

  test("blocklist admit: exact result, bloom-positive sliver bounded") {
    val got = graft.operators.SketchOps
      .bloomBlocklistAdmit(spark, sfDir, nBits = 1 << 16)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val block = d.filter(col("doc_id") % 7 === 0)
      .select("text").collect().map(_.getString(0)).toSet
    val want = d.filter(col("doc_id") % 7 =!= 0)
      .collect()
      .filter(r => !block.contains(
        r.getString(r.fieldIndex("text"))))
      .map(r => (r.getLong(r.fieldIndex("doc_id")),
        r.getString(r.fieldIndex("source")))).toSet
    assert(got === want)
  }
}
