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

  test("salted join equals the plain join, dim replicated exactly salts×") {
    import spark.implicits._
    // skewed fact: one hot key with 900 of 1000 rows
    val fact = ((1L to 900L).map(i => (i, 1L, 1.0)) ++
      (901L to 1000L).map(i => (i, i, 2.0))).toDF("id", "k", "v")
    val dim = ((1L to 1000L).map(i => (i, s"name$i"))).toDF("k", "k_name")
    val salted = Skew.saltedJoin(fact, dim, "k", salts = 8,
        idCol = Some("id"))
      .select("id", "k", "v", "k_name")
    val plain = fact.join(dim, Seq("k")).select("id", "k", "v", "k_name")
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
    assert(salted.count() === 1000L)
    // the hot key's fact rows must actually spread across salt buckets
    val spread = fact.filter(col("k") === 1L)
      .withColumn("_salt", pmod(hash(col("id")), lit(8)))
      .select("_salt").distinct().count()
    assert(spread === 8L, s"hot key must span all salts, got $spread")
  }
}
