package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrioritySampleSpec extends SparkSpec {

  test("exact below n: the estimate IS the integer sum") {
    import spark.implicits._
    val rows = (1L to 500L).map(i => (i, i * 3 + 7))
    val want = rows.map(_._2).sum.toDouble
    val got = rows.toDF("id", "w").repartition(8)
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 1000)
        .as("s"))
      .select(PrioritySample.totalExpr(col("s"), 1000))
      .collect()(0).getDouble(0)
    assert(got === want)
  }

  test("state shape: priority-descending, length <= n+1, deterministic") {
    import spark.implicits._
    val df = (1L to 200L).map(i => (i, 100L + i)).toDF("id", "w")
    def run() = df.repartition(7)
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 50).as("s"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val s1 = run(); val s2 = run()
    assert(s1 === s2, "state must be deterministic")
    assert(s1.size === 51)
    val pris = s1.map(_.getDouble(0))
    assert(pris === pris.sortBy(-_), "priorities must descend")
    // priorities must be w/uniform(id) exactly
    s1.foreach { r =>
      val (pri, id, w) = (r.getDouble(0), r.getLong(1), r.getLong(2))
      assert(pri === w.toDouble / {
        val M = 1000000007L
        val h1 = (id % M) * 2654435761L % M + 1013904223L
        val h2 = (h1 % M) * 1597334677L % M + 362437L
        ((h2 % M) + 1L).toDouble / 1000000008.0
      })
    }
  }

  test("merge law: row-level merge of per-part states is bit-identical " +
      "to a one-shot state") {
    import spark.implicits._
    val rows = (1L to 400L).map(i => (i % 4, i, 10L + i))
    val oneShot = rows.map(x => (x._2, x._3)).toDF("id", "w")
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 60).as("s"))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val merged = rows.toDF("p", "id", "w")
      .groupBy("p")
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 60).as("s"))
      .agg(collect_list(col("s")).as("states"))
      .select(PrioritySample.mergeStatesExpr(col("states"), 60))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(merged === oneShot)
  }

  test("estimator regime: above-n estimate within 10% on skewed weights") {
    import spark.implicits._
    // heavy-tailed weights; n = 512 samples of 20k items
    val rows = (1L to 20000L).map(i => (i, 1L + (i % 97) * (i % 89)))
    val want = rows.map(_._2).sum.toDouble
    val got = rows.toDF("id", "w").repartition(16)
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 512).as("s"))
      .select(PrioritySample.totalExpr(col("s"), 512))
      .collect()(0).getDouble(0)
    assert(math.abs(got - want) / want < 0.10,
      s"estimate $got vs true $want")
  }

  test("reduce is idempotent on duplicate ids in the full regime: " +
      "a repeated entry must not shrink the sample") {
    val agg = new PrioritySample.PriorityStateSketch(4)
    // fill past n+1 so the overflow branch is active
    val base = (1L to 10L).foldLeft(agg.zero)((s, i) => agg.reduce(s, (i, 100L + i)))
    assert(base.top.size === 5)
    // re-feed the CURRENT MAXIMUM entry (guaranteed in the sample and
    // above the minimum): TreeSet no-op insert must not drop(1)
    val (_, maxId, maxW) = base.top.last
    val again = agg.reduce(base, (maxId, maxW))
    assert(again.top === base.top,
      s"duplicate feed shrank/changed the sample: ${again.top.size}")
  }

  test("mergeStatesExpr dedups shared rows: state merged with itself " +
      "is the state (matches the aggregator's TreeSet-union merge)") {
    import spark.implicits._
    val st = (1L to 200L).map(i => (i, 100L + i)).toDF("id", "w")
      .agg(PrioritySample.sketchState(col("id"), col("w"), n = 50).as("s"))
    val self = st.select(array(col("s"), col("s")).as("states"))
      .select(PrioritySample.mergeStatesExpr(col("states"), 50))
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    val plain = st.collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(self === plain)
  }

  test("sourceCharTotals: exact per-source + __ALL__ on the fixture") {
    val got = graft.operators.SketchOps.sourceCharTotals(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val per = d.groupBy("source").agg(sum("n_chars").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val all = d.agg(sum("n_chars")).collect()(0).getLong(0).toDouble
    assert(got === per + ("__ALL__" -> all))
  }
}
