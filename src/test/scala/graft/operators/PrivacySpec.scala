package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Privacy-release family: the k-anonymity contract (every released
  * cell covers ≥ k distinct users), conservation of row accounting
  * across the generalization ladder, ladder coverage (all three levels
  * exercised on the fixtures), and the noisy histogram's bounded
  * perturbation. */
class PrivacySpec extends SparkSpec {

  test("kAnonymize: every released cell has >= k distinct users") {
    val k = 5
    val rel = Privacy.kAnonymize(spark, sfDir, k = k)
      .filter(col("granularity") =!= "suppressed")
    assert(rel.filter(col("n_users") < k).count() === 0)
  }

  test("kAnonymize: row accounting conserved across the ladder") {
    val total = Relational.events(spark, sfDir).count()
    val released = Privacy.kAnonymize(spark, sfDir)
      .agg(sum("n_rows")).collect()(0).getLong(0)
    assert(released === total)
  }

  test("kAnonymize: suppressed remainder hides time locality") {
    val sup = Privacy.kAnonymize(spark, sfDir)
      .filter(col("granularity") === "suppressed")
    // NULL bucket on every suppressed row — no time bucket escapes
    assert(sup.filter(col("bucket").isNotNull).count() === 0)
  }

  test("kAnonymize: ladder levels behave under k extremes") {
    // k=1: nothing fails the hour level, so nothing generalizes
    val all = Privacy.kAnonymize(spark, sfDir, k = 1)
    assert(all.filter(col("granularity") =!= "hour").count() === 0)
    // k > user count: nothing is releasable, everything suppresses
    val none = Privacy.kAnonymize(spark, sfDir, k = 100000)
    assert(none.filter(col("granularity") =!= "suppressed").count() === 0)
    val total = Relational.events(spark, sfDir).count()
    assert(none.agg(sum("n_rows")).collect()(0).getLong(0) === total)
  }

  test("kAnonymize: l_ok reflects distinct sensitive buckets") {
    // at k=1 every hour cell releases whole (no residual regrouping),
    // so the flag is recomputable by hand from the raw events: check
    // EVERY released cell's distinct floor(value/50) against l_ok
    val rel = Privacy.kAnonymize(spark, sfDir, k = 1, l = 3)
      .filter(col("granularity") === "hour")
      .select(col("event_type"), col("bucket"), col("l_ok"))
    val truth = Relational.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:00").as("bucket"))
      .agg((countDistinct(floor(col("value") / 50.0)) >= 3).as("l_truth"))
    val joined = rel.join(truth, Seq("event_type", "bucket")).collect()
    assert(joined.nonEmpty)
    assert(joined.length === truth.count())
    joined.foreach(r => assert(r.getBoolean(2) === r.getBoolean(3)))
  }

  test("kAnonymize plan: broadcast residual joins, pruned scan, no SMJ") {
    // the ladder's failed-cell key sets are bounded by types × time
    // buckets, so the residual joins must BROADCAST — a sort-merge (or
    // worse, cartesian) here would shuffle the grain twice at scale
    val plan = Privacy.kAnonymize(spark, sfDir, k = 5, l = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    // column pruning reaches the parquet scan: the release never needs
    // event_id or the props payload
    assert(!plan.contains("event_id"), "scan reads event_id")
    assert(!plan.contains("props"), "scan reads props")
  }

  test("noisyHistStream ≡ noisyHistogram on the real events fixture") {
    // same fixture both ways: replay events through a MemoryStream with
    // a far-future sentinel to advance the watermark past every real
    // day window, and require the released (type, day, n_noisy) cells
    // to equal the batch release exactly
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val ev = Relational.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val evRows = ev.as[graft.streaming.EventStream.Event].collect()
    val batch = Privacy.noisyHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val input = MemoryStream[graft.streaming.EventStream.Event]
    val query = Privacy.noisyHistStream(input.toDF())
      .writeStream.format("memory").queryName("noisy_hist_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      input.addData(evRows.toSeq)
      query.processAllAvailable()
      val flushTs = new java.sql.Timestamp(
        evRows.map(_.ts.getTime).max + 3L * 24 * 3600 * 1000)
      input.addData(graft.streaming.EventStream.Event(-1L, flushTs, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      val streamed = spark.table("noisy_hist_stream")
        .filter(col("event_type") =!= "sentinel").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally query.stop()
  }

  test("kAnonHourStream decisions ≡ batch hour-level statistics") {
    implicit val sqlCtx = spark.sqlContext
    implicit val s = spark
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val k = 5; val l = 3
    val ev = Relational.events(spark, sfDir)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val evRows = ev.as[graft.streaming.EventStream.Event].collect()
    // batch truth: per-(type, hour) exact stats from the raw fixture
    val truth = Relational.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:00").as("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct("user_id").as("n_users"),
        (countDistinct(floor(col("value") / 50.0)) >= l).as("l_ok"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getBoolean(4)))
    val input = MemoryStream[graft.streaming.EventStream.Event]
    val query = Privacy.kAnonHourStream(input.toDS(), k, l)
      .writeStream.format("memory").queryName("kanon_hours")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
      .start()
    try {
      input.addData(evRows.toSeq)
      query.processAllAvailable()
      val flushTs = new java.sql.Timestamp(
        evRows.map(_.ts.getTime).max + 24L * 3600 * 1000)
      input.addData(
        graft.streaming.EventStream.Event(-1L, flushTs, -1L, "sentinel", 0.0))
      query.processAllAvailable()
      val got = spark.table("kanon_hours")
        .filter(col("event_type") =!= "sentinel").collect()
        .map(r => (r.getString(0), r.getString(1), r.getBoolean(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))
      // released rows match the >= k truth cells exactly
      val relGot = got.filter(_._3)
        .map(t => (t._1, t._2, t._4, t._5, t._6)).toSet
      val relTruth = truth.filter(_._4 >= k)
        .map(t => (t._1, t._2, t._3, t._4, t._5)).toSet
      assert(relGot === relTruth)
      // failed rows: NULL buckets, per-type counts and row totals match
      val failGot = got.filterNot(_._3)
      assert(failGot.forall(_._2 == null), "failed cell leaked its bucket")
      val failTruthByType = truth.filter(_._4 < k)
        .groupBy(_._1).view.mapValues(xs => (xs.length, xs.map(_._3).sum))
      val failGotByType = failGot
        .groupBy(_._1).view.mapValues(xs => (xs.length, xs.map(_._4).sum))
      assert(failGotByType.toMap === failTruthByType.toMap)
    } finally query.stop()
  }

  test("noisyHistogram: bounded perturbation, non-negative, all cells") {
    val truth = Relational.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_true"))
    val noisy = Privacy.noisyHistogram(spark, sfDir)
    val joined = noisy.join(truth, Seq("event_type", "day")).collect()
    assert(joined.length === truth.count())
    joined.foreach { r =>
      val (nNoisy, nTrue) = (r.getLong(2), r.getLong(3))
      assert(nNoisy >= 0L)
      assert(math.abs(nNoisy - math.max(0L, nTrue)) <= 10L)
    }
  }
}
