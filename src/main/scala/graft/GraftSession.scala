package graft

import org.apache.spark.sql.SparkSession

/** One place for the engine's recommended SparkSession configuration —
  * the operational half of the 100 TB design (PLANS.md has the plan
  * half). `Verify`/`Bench` and the packaged-jar examples all build
  * sessions here so the tuning story is a single audited artifact.
  *
  * Knob rationale (local defaults; the cluster column is what changes):
  *
  *  - `spark.sql.shuffle.partitions` — locally = the core count (32-way
  *    bench, 4-way tests): Spark's 200 default just adds task-scheduling
  *    overhead at these sizes. On a 1000-executor cluster: 2-3× total
  *    cores as the STARTING value and let AQE coalesce down per stage —
  *    partitions must be small enough that a shuffle partition fits in
  *    executor memory (~
  *    total-shuffle-bytes / partitions < a few hundred MB).
  *  - AQE (`adaptive.enabled`, on by default since Spark 3.2) + skew-join
  *    split + partition coalescing: explicitly pinned ON because the LSH
  *    band joins and per-key aggregations here are exactly the workloads
  *    whose runtime stats beat static planning (residual sub-cap bucket
  *    imbalance, post-filter size collapse).
  *  - `spark.sql.files.maxPartitionBytes` (default 128 MB) governs scan
  *    parallelism: at 100 TB that is ~800k scan tasks — raise toward
  *    256-512 MB when the cluster is scheduler-bound, lower when
  *    columnar pruning leaves partitions cpu-bound.
  *  - `spark.sql.autoBroadcastJoinThreshold` (default 10 MB): the dim
  *    tables here (hyperplane constants, hot-bucket lists, per-dim
  *    quantization stats) are designed to stay under it; the big sides
  *    (band keys, signatures) must never be broadcast.
  *  - `spark.sql.legacy.parquet.nanosAsLong` — the `events` table is
  *    TIMESTAMP(NANOS), which Spark cannot represent natively; read as
  *    long + converted once in `Relational.events`.
  *  - UTC session timezone — every datetime oracle compares wall-clock
  *    text across engines; a session in local time would shift buckets.
  */
object GraftSession {

  /** Builder with the recommended configuration applied; caller picks
    * master/cores (local) or leaves master to the cluster submit. */
  def builder(shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Local session sized by the SPARK_GRAFT_CPUS convention the driver
    * mains use (UI off — these are headless runs). */
  def local(cpus: String): SparkSession = {
    val spark = builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    installPlanExtensions(spark)
    spark
  }

  /** Idempotently install the library's optimizer rules and planner
    * strategy into a STOCK session — the harness-level half of what
    * `spark.sql.extensions=graft.functions.GraftExtensions` does at
    * session build time (a `getOrCreate`'d session cannot add
    * extensions after the fact). Query entries stay pure queries; the
    * session carries the plan surface (r14 verdict: an entry mutating
    * `experimental.extraOptimizations` was the one impure entry). */
  def installPlanExtensions(spark: SparkSession): Unit = spark match {
    case c: org.apache.spark.sql.classic.SparkSession =>
      val ex = c.experimental
      if (!ex.extraOptimizations.contains(graft.plans.LevenshteinPruneRule))
        ex.extraOptimizations =
          ex.extraOptimizations :+ graft.plans.LevenshteinPruneRule
      if (!ex.extraOptimizations.contains(graft.plans.RangeBinJoinRule))
        ex.extraOptimizations =
          ex.extraOptimizations :+ graft.plans.RangeBinJoinRule
      if (!ex.extraStrategies.contains(graft.plans.AsOfJoinStrategy))
        ex.extraStrategies =
          ex.extraStrategies :+ graft.plans.AsOfJoinStrategy
    case _ => () // Connect sessions must carry GraftExtensions config
  }
}
