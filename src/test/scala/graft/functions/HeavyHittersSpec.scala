package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {

  private def run(df: org.apache.spark.sql.DataFrame, k: Int): Map[String, Long] = {
    val r = df.agg(HeavyHitters.topItems(col("s"), k).as("hh"))
      .select(col("hh.items").as("items"), col("hh.counts").as("counts"))
      .collect()(0)
    r.getSeq[String](0).zip(r.getSeq[Long](1)).toMap
  }

  test("exact when distinct <= k: counters equal the true histogram") {
    import spark.implicits._
    val df = (1 to 3000).map(i => s"v${i % 7}").toDF("s").repartition(8)
    val got = run(df, k = 32)
    val exact = df.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === exact)
  }

  test("estimate regime: hot items survive, error bounded by N/(k+1)") {
    import spark.implicits._
    // 5 hot items x 500 + 7500 unique tail = N of 10000; k=32 -> eps=N/33
    val hot = (1 to 2500).map(i => s"hot${i % 5}")
    val tail = (1 to 7500).map(i => s"tail$i")
    val df = (hot ++ tail).toDF("s").repartition(4)
    val n = 10000.0
    val eps = n / 33
    val got = run(df, k = 32)
    (0 until 5).foreach { h =>
      val c = got.getOrElse(s"hot$h", 0L)
      assert(c > 0, s"hot$h (freq 500 > eps $eps) must be tracked")
      assert(c <= 500 && c >= 500 - eps, s"hot$h counter $c outside [${500 - eps}, 500]")
    }
    assert(got.size <= 32, "state bounded by k")
  }

  test("merge law, exact regime: expression merge of per-chunk states " +
      "equals the exact histogram (no truncation anywhere)") {
    import spark.implicits._
    val df = (1 to 3000).map(i => (i % 5, s"v${i % 7}")).toDF("chunk", "s")
      .repartition(8)
    val merged = df.groupBy("chunk")
      .agg(HeavyHitters.sketchState(col("s"), 32).as("st"))
      .agg(collect_list("st").as("sts"))
      .select(explode(HeavyHitters.mergeStatesExpr(col("sts"), 32)).as("e"))
      .select(col("e.item").as("s"), col("e.n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = df.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === exact)
  }

  test("merge law, estimate regime: one-shot m-way expression merge " +
      "keeps the N/(k+1) undercount bound and the k-entry size bound") {
    import spark.implicits._
    // 5 hot x 600 + 9000 unique tail across 6 chunks; k=32 << 9005 distinct
    val k = 32
    val rows = (1 to 3000).map(i => (i % 6, s"hot${i % 5}")) ++
      (1 to 9000).map(i => (i % 6, s"tail$i"))
    val df = rows.toDF("chunk", "s").repartition(8)
    val n = 12000.0
    val merged = df.groupBy("chunk")
      .agg(HeavyHitters.sketchState(col("s"), k).as("st"))
      .agg(collect_list("st").as("sts"))
      .select(explode(HeavyHitters.mergeStatesExpr(col("sts"), k)).as("e"))
      .select(col("e.item").as("s"), col("e.n").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged.size <= k, "merged state bounded by k")
    val eps = n / (k + 1)
    (0 until 5).foreach { h =>
      val c = merged.getOrElse(s"hot$h", 0L)
      assert(c > 0, s"hot$h (freq 600 > eps $eps) must survive the merge")
      assert(c <= 600 && c >= 600 - eps,
        s"hot$h merged counter $c outside [${600 - eps}, 600]")
    }
    // every reported counter is an underestimate within eps of truth
    val exact = df.groupBy("s").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    merged.foreach { case (item, c) =>
      val t = exact(item)
      assert(c <= t && t - c <= eps, s"$item: est $c vs true $t, eps $eps")
    }
  }

  test("state + topKExpr over stored rows: deterministic ordering " +
      "(n desc, item asc) and slice semantics") {
    import spark.implicits._
    val df = (1 to 300).map(i => s"v${i % 6}").toDF("s")
    val top = df.agg(HeavyHitters.sketchState(col("s"), 32).as("st"))
      .select(explode(HeavyHitters.topKExpr(col("st"), 3)).as("e"))
      .select("e.item", "e.n").as[(String, Long)].collect()
    assert(top.length === 3)
    // 300 rows over 6 values: v1..v6 each 50 -> ties broken item-asc
    assert(top.map(_._1).toSeq === Seq("v0", "v1", "v2"))
    assert(top.forall(_._2 === 50L))
  }

  test("grouped over the real table: per-lang top sources match exact counts") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val hh = docs.groupBy("lang")
      .agg(HeavyHitters.topItems(col("source"), k = 64).as("hh"))
      .select(col("lang"), explode(arrays_zip(col("hh.items"), col("hh.counts"))).as("x"))
      .select(col("lang"), col("x.items").as("source"), col("x.counts").as("n"))
    val exact = docs.groupBy("lang", "source").count()
    assert(hh.join(exact,
      hh("lang") === exact("lang") && hh("source") === exact("source") &&
        hh("n") === exact("count")).count() === exact.count())
  }
}
