package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvSketchSpec extends SparkSpec {

  test("exact below k: small domains count exactly") {
    import spark.implicits._
    val df = (1 to 1000).map(i => s"v${i % 37}").toDF("s")
    val est = df.agg(KmvSketch.approxDistinct(col("s"), k = 256)).collect()(0).getLong(0)
    assert(est === 37L)
  }

  test("estimate within 15% above k; deterministic across runs") {
    import spark.implicits._
    val df = (1 to 20000).map(i => s"user-${i % 5000}").toDF("s").repartition(8)
    def run() = df.agg(KmvSketch.approxDistinct(col("s"), k = 256)).collect()(0).getLong(0)
    val e1 = run(); val e2 = run()
    assert(e1 === e2, "sketch must be deterministic")
    assert(math.abs(e1 - 5000.0) / 5000.0 < 0.15, s"estimate $e1 vs 5000")
  }

  test("grouped sketch: per-event-type distinct users on the real table") {
    val events = graft.operators.Relational.events(spark, sfDir)
    val out = events.groupBy("event_type")
      .agg(KmvSketch.approxDistinct(col("user_id").cast("string")).as("approx_users"),
        countDistinct("user_id").as("exact_users"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact.toDouble) / exact < 0.15,
        s"${r.getString(0)}: approx=$approx exact=$exact")
    }
  }
}
