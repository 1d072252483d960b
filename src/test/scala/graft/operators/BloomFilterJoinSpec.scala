package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BloomFilterJoinSpec extends SparkSpec {

  test("bloom-pruned join result is identical to the plain join") {
    val pruned = BloomFilterJoin.urgentOrderRevenue(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val plain = Relational.table(spark, sfDir, "lineitem")
      .join(Relational.table(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pruned === plain)
  }

  test("the bloom prefilter actually prunes the fact side") {
    val lineitem = Relational.table(spark, sfDir, "lineitem")
    val orders = Relational.table(spark, sfDir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val nKeys = orders.select("o_orderkey").distinct().count()
    val bloom = orders.stat.bloomFilter("o_orderkey", nKeys, 0.01)
    val mc = udf((k: Long) => bloom.mightContainLong(k))
    val total = lineitem.count()
    val kept = lineitem.filter(mc(col("l_orderkey"))).count()
    val trueMatch = lineitem.join(orders,
      col("l_orderkey") === col("o_orderkey"), "left_semi").count()
    assert(kept >= trueMatch, "bloom must have no false negatives")
    // ~1/5 of orders are urgent; 1% fpp keeps the overshoot tiny
    assert(kept < total, "filter must prune something")
    assert(kept - trueMatch <= math.max(16L, (total * 0.03).toLong),
      s"false-positive overshoot too large: kept=$kept true=$trueMatch")
  }
}
