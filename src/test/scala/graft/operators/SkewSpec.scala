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

  test("idCol salt spreads FULLY-DUPLICATE rows of a hot key uniformly") {
    import spark.implicits._
    // the classic worst case: the hot key's rows are byte-identical, so a
    // content hash sends them all to ONE salt bucket — idCol must not
    val df = (1L to 1000L).map(i => (i, "hot", 7.0)).toDF("id", "k", "v")
    val contentSalts = df.withColumn("_salt",
        pmod(hash(col("k"), col("v")), lit(8)))
      .select("_salt").distinct().count()
    assert(contentSalts === 1, "precondition: content hash collapses dups")
    val idSalts = df.withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .select("_salt").distinct().count()
    assert(idSalts === 8, s"id salt must use all buckets, got $idSalts")
    // and the aggregate is still exact
    val direct = Skew.directCountSum(df, "k", "v")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val salted = Skew.saltedCountSum(df, "k", "v", salts = 8,
        idCol = Some("id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(salted === direct)
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
