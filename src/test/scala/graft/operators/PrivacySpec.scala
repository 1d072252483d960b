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

  test("noise mechanism swap: laplace changes ONLY the noise column, is seeded-deterministic, and scales with 1/eps") {
    def hist() = Privacy.noisyHistogram(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val deterministic = hist()
    def withNoise[A](v: String)(body: => A): A = {
      spark.conf.set(Privacy.NoiseConf, v)
      try body finally spark.conf.unset(Privacy.NoiseConf)
    }
    // explicit 'deterministic' ≡ default
    assert(withNoise("deterministic")(hist()) === deterministic)
    // laplace: same CELLS (mechanism swap touches nothing but noise),
    // reproducible under the same seed, different under another
    val lap1 = withNoise("laplace:0.5:42")(hist())
    assert(lap1.keySet === deterministic.keySet)
    assert(withNoise("laplace:0.5:42")(hist()) === lap1,
      "same seed must re-draw identical noise (retry-stability)")
    val lap2 = withNoise("laplace:0.5:43")(hist())
    assert(lap2 != lap1, "a new seed must draw fresh noise")
    // eps → ∞ degenerates to the true counts (scale 1/eps → round to 0)
    val truth = Relational.events(spark, sfDir)
      .groupBy(col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd").as("day"))
      .agg(count(lit(1)).as("n_true")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val lapTight = withNoise("laplace:1000000:7")(hist())
    assert(lapTight === truth.map { case (k, v) => k -> math.max(0L, v) })
    // and at eps = 0.5 the noise is actually doing something
    assert(lap1.exists { case (k, v) => v != truth(k) })
    // malformed / unknown confs fail loudly at plan time
    intercept[IllegalArgumentException] {
      withNoise("laplace:0.5")(hist())
    }
    intercept[IllegalArgumentException] { withNoise("gaussian")(hist()) }
    intercept[IllegalArgumentException] {
      withNoise("laplace:-1:3")(hist())
    }
  }

  test("geometric mechanism: integer-native pmf matches theory, tails track laplace at the same eps") {
    import spark.implicits._
    def withNoise[A](v: String)(body: => A): A = {
      spark.conf.set(Privacy.NoiseConf, v)
      try body finally spark.conf.unset(Privacy.NoiseConf)
    }
    // 5000 cells (50 types × 100 days) × 20 events: enough draws to pin
    // the pmf empirically; n_true = 20 keeps the non-negativity clamp
    // out of the way for eps = 0.5 (P(Z <= -20) ≈ 2e-5)
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00").getTime
    val events = (0 until 100000).map { i =>
      val cell = i % 5000
      (i.toLong, new java.sql.Timestamp(base + (cell / 50) * 86400000L),
        (i % 7).toLong, "t" + (cell % 50), 1.0)
    }.toDF("event_id", "ts", "user_id", "event_type", "value")
    def noises(conf: String): Array[Long] = withNoise(conf) {
      Privacy.noisyHistogram(events).collect().map(_.getLong(2) - 20L)
    }
    val eps = 0.5
    val geo = noises(s"geometric:$eps:42")
    val n = geo.length.toDouble
    assert(geo.length === 5000)
    // retry-stability and seed sensitivity — same contract as laplace
    assert(noises(s"geometric:$eps:42").toSeq === geo.toSeq)
    assert(noises(s"geometric:$eps:43").toSeq !== geo.toSeq)
    // pmf at 0: (1-α)/(1+α) ≈ 0.2449 at eps=0.5
    val alpha = math.exp(-eps)
    val p0 = geo.count(_ == 0L) / n
    assert(math.abs(p0 - (1 - alpha) / (1 + alpha)) < 0.02,
      s"P(Z=0) = $p0, theory ${(1 - alpha) / (1 + alpha)}")
    // symmetric two-sided tail: P(|Z| >= 5) = 2α^5/(1+α) ≈ 0.102
    val tail5 = geo.count(z => math.abs(z) >= 5L) / n
    val tailTheory = 2 * math.pow(alpha, 5) / (1 + alpha)
    assert(math.abs(tail5 - tailTheory) < 0.02,
      s"P(|Z|>=5) = $tail5, theory $tailTheory")
    assert(math.abs(geo.count(_ > 0L) - geo.count(_ < 0L)) / n < 0.03,
      "two-sided symmetry")
    // the discrete mechanism's tails track the rounded-laplace twin at
    // the same eps (same keyed uniform, so the comparison is paired)
    val lap = noises(s"laplace:$eps:42")
    val lapTail5 = lap.count(z => math.abs(z) >= 5L) / n
    assert(math.abs(tail5 - lapTail5) < 0.03,
      s"geometric tail $tail5 vs laplace tail $lapTail5 at eps=$eps")
    val meanAbsGeo = geo.map(math.abs).sum / n
    val meanAbsLap = lap.map(math.abs).sum / n
    assert(math.abs(meanAbsGeo - meanAbsLap) / meanAbsLap < 0.15,
      s"E|Z| geometric $meanAbsGeo vs laplace $meanAbsLap")
    // eps → ∞ degenerates to zero noise (true counts), like laplace
    assert(noises("geometric:1000000:7").forall(_ == 0L))
    // malformed confs fail loudly
    intercept[IllegalArgumentException] { noises("geometric:0.5") }
    intercept[IllegalArgumentException] { noises("geometric:-1:3") }
  }

  test("kAnonymize sensWidth: bucket width drives the l-diversity audit") {
    import spark.implicits._
    // 3 users (k passes at k=3), values 0..8 in one hour cell
    val ts = java.sql.Timestamp.valueOf("2024-01-01 10:00:00")
    val events = (0 until 9).map(i =>
      (i.toLong, ts, (i % 3).toLong, "click", i.toDouble))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    def lOk(w: Double) = Privacy.kAnonymize(events, 3, 3, w)
      .filter(col("granularity") === "hour").collect().map(_.getBoolean(5))
    assert(lOk(1.0).forall(identity),
      "width 1: values 0..8 span 9 buckets >= l=3")
    assert(lOk(1000.0).forall(!_),
      "width 1000: all values collapse into one bucket < l=3")
    intercept[IllegalArgumentException] { Privacy.kAnonymize(events, 3, 3, 0.0) }
  }
}
