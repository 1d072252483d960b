package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE handles skewed *joins* at runtime
  * (spark.sql.adaptive.skewJoin, on by default); these cover the other
  * classic case — a groupBy where one hot key swamps a single reducer.
  *
  * Two-phase salted aggregation: phase 1 groups on (key, salt) so the hot
  * key's rows spread over `salts` reducers; phase 2 merges the partials.
  * Works for any algebraic aggregate (sum/count/min/max); the salt is a
  * hash of ALL the row's columns — a pure function of row content, so the
  * assignment is stable under task retry/recomputation (no RNG, no
  * partition-order dependence). Rows that are full duplicates share a salt;
  * residual skew is bounded by duplicate multiplicity (with a unique id
  * column in the row, spreading is uniform). At 100 TB: pick
  * salts ≈ hot-key rows / target-partition rows.
  */
object Skew {

  /** count + sum aggregation over `key`, salted across `salts` partials. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(df.columns.map(col).toSeq: _*), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sum(col(valueCol).cast("decimal(18,2)")).as("_s"))
      .groupBy(col(key))
      .agg(sum("_n").as("n_rows"),
        sum("_s").cast("double").as("sum_value"))
  }

  /** Reference implementation (single-phase) for equivalence checks. */
  def directCountSum(df: DataFrame, key: String, valueCol: String): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("sum_value"))
}
