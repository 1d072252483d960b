package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation helpers. AQE handles skewed *joins* at runtime
  * (spark.sql.adaptive.skewJoin, on by default); these cover the other
  * classic case — a groupBy where one hot key swamps a single reducer.
  *
  * Two-phase salted aggregation: phase 1 groups on (key, salt) so the hot
  * key's rows spread over `salts` reducers; phase 2 merges the partials.
  * Works for any algebraic aggregate (sum/count/min/max).
  *
  * Salt assignment must be BOTH deterministic (stable under task retry /
  * recomputation — `monotonically_increasing_id`/`rand` are not, the
  * SPARK-23207 class of bug) AND uniform over a hot key's rows. A content
  * hash alone fails the second half exactly when skew bites hardest: a hot
  * key whose rows are FULL duplicates (same (key,value) repeated millions
  * of times) all hash to ONE salt bucket. So: pass `idCol` — any unique
  * column (primary key, offset, line id) — and the salt is a hash of that
  * id, which spreads duplicate rows uniformly AND deterministically. With
  * no unique column available the salt falls back to hashing all columns,
  * and the duplicate-multiplicity caveat applies (residual skew is bounded
  * by the max multiplicity of a fully-duplicate row).
  * At 100 TB: pick salts ≈ hot-key rows / target-partition rows.
  */
object Skew {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** The salt source, with the contract made loud: no `idCol` falls back
    * to a content hash of every column and WARNS — fully-duplicate rows
    * of a hot key then share one salt bucket, which defeats the salting
    * exactly when skew is worst (see object doc). Callers that have any
    * unique column should always pass it. */
  private def saltSource(df: DataFrame, idCol: Option[String],
      op: String): Seq[Column] =
    idCol.map(c => Seq(col(c))).getOrElse {
      log.warn(s"$op: no idCol passed — salting by content hash of all " +
        "columns; fully-duplicate rows of a hot key will share one salt " +
        "bucket (residual skew = max duplicate multiplicity). Pass any " +
        "unique column (primary key, offset, line id) as idCol.")
      df.columns.map(col).toSeq
    }

  /** count + sum aggregation over `key`, salted across `salts` partials.
    * @param idCol unique row-id column to salt by (uniform + deterministic);
    *   None → content hash of all columns, with a logged warning. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int = 16, idCol: Option[String] = None): DataFrame = {
    val saltSrc = saltSource(df, idCol, "saltedCountSum")
    val salted = df.withColumn("_salt", pmod(hash(saltSrc: _*), lit(salts)))
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

  /** Salted equi-join for a skewed fact ⋈ dim: fact rows are salted by a
    * deterministic row hash (same `idCol` contract as [[saltedCountSum]]),
    * the dim side is replicated `salts`× by an explode, and the join key
    * becomes (key, salt) — a hot fact key's rows now land on `salts`
    * reducers instead of one. Result is EXACTLY the plain join (the
    * equivalence is the oracle contract of `q_salted_join`).
    *
    * This is the manual form of what AQE's skew-join split does at
    * runtime; it exists for the cases AQE can't reach — a skewed key
    * known in advance, deterministic layout requirements, or an engine
    * without runtime re-planning. Cost model at 100 TB: dim shuffle
    * volume × `salts` buys hot-key parallelism `salts`; size `salts` ≈
    * hot-key rows / target-partition rows, and keep the dim side the
    * SMALL side (the replication is the price). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salts: Int = 16, idCol: Option[String] = None): DataFrame = {
    val saltSrc = saltSource(fact, idCol, "saltedJoin")
    val saltedFact =
      fact.withColumn("_salt", pmod(hash(saltSrc: _*), lit(salts)))
    val replicatedDim =
      dim.withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(replicatedDim, Seq(key, "_salt")).drop("_salt")
  }
}
