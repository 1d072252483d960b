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
