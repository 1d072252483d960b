package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bloom-filter-pruned join — the manual form of runtime filtering
  * (Spark's `spark.sql.optimizer.runtime.bloomFilter.enabled` injects the
  * same shape when statistics allow): build a Bloom filter over the
  * selective side's join keys, broadcast it, and prune the large fact
  * side BEFORE its shuffle, so the sort-merge join only moves rows that
  * can possibly match.
  *
  * Why this matters at 100 TB: when the dim side is too big to broadcast
  * as a hash relation but its KEY SET fits a Bloom filter (100 M keys at
  * 1% fpp ≈ 114 MB of bits vs many GB of rows), the fact shuffle — the
  * dominant cost of a big SMJ — shrinks by the filter's selectivity.
  * The Bloom filter admits false positives but NEVER false negatives, and
  * the exact join still runs behind it, so the result is IDENTICAL to the
  * plain join — which is exactly the oracle contract of
  * `q_bloom_join` (same pattern as `q_salted_agg`: the rewrite's
  * equivalence to the naive form is the thing being checked).
  */
object BloomFilterJoin {

  /** Revenue per urgent order, with the lineitem side Bloom-pruned by the
    * selected orders' keys. `fpp` trades filter size for pruning waste. */
  def urgentOrderRevenue(spark: SparkSession, dir: String,
      fpp: Double = 0.01): DataFrame = {
    val orders = Relational.table(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val lineitem = Relational.table(spark, dir, "lineitem")

    // key-set cardinality for sizing; at scale this comes from table
    // statistics or a first-pass approx_count_distinct instead of an
    // exact count job
    val nKeys = math.max(1L, orders.select("o_orderkey").distinct().count())
    val bloom = orders.stat.bloomFilter("o_orderkey", nKeys, fpp)
    val bcast = spark.sparkContext.broadcast(bloom)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))

    lineitem
      .filter(mightContain(col("l_orderkey"))) // below the shuffle
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          .as("revenue"))
  }
}
