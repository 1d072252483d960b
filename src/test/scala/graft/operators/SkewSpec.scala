package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted two-phase aggregation equals direct aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key — the case that melts a single reducer
    val df = ((1 to 9000).map(i => ("hot", i.toDouble)) ++
      (1 to 1000).map(i => (s"key${i % 50}", i.toDouble)))
      .toDF("k", "v").repartition(8)
    val direct = Skew.directCountSum(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, "k", "v", salts = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
  }

  test("salting spreads the hot key across partial groups") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("hot", i.toDouble)).toDF("k", "v")
    val partials = df.withColumn("_salt",
        pmod(hash(col("k"), col("v"), monotonically_increasing_id()), lit(8)))
      .groupBy("k", "_salt").count()
    assert(partials.count() > 1, "hot key must split into multiple partials")
  }

  test("salted aggregation over the real events table matches direct") {
    val events = Relational.events(spark, sfDir)
    val direct = Skew.directCountSum(events, "event_type", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(events, "event_type", "value")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
  }
}
