package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkSpec {

  test("backward as-of semantics: latest right ts <= left ts, ties match") {
    import spark.implicits._
    val left = Seq((1L, "k", 10L), (2L, "k", 20L), (3L, "k", 30L),
      (4L, "other", 15L)).toDF("id", "key", "t")
    val right = Seq(("k", 10L, "a"), ("k", 25L, "b"), ("zzz", 1L, "x"))
      .toDF("key", "t", "state")
    val out = AsOf.asOfJoin(left, right, keys = Seq("key"), ts = "t",
        payload = Seq("state"), rename = s => s"right_$s")
      .select("id", "right_state").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("a"), "equal ts must match (>= semantics)")
    assert(out(2L) === Some("a"), "latest earlier right row carries forward")
    assert(out(3L) === Some("b"))
    assert(out(4L) === None, "no right row for the key → null")
  }

  test("forward direction picks the nearest LATER right row") {
    import spark.implicits._
    val left = Seq((1L, "k", 10L), (2L, "k", 26L), (3L, "k", 99L))
      .toDF("id", "key", "t")
    val right = Seq(("k", 10L, "a"), ("k", 25L, "b"), ("k", 40L, "c"))
      .toDF("key", "t", "state")
    val out = AsOf.asOfJoin(left, right, keys = Seq("key"), ts = "t",
        payload = Seq("state"), rename = s => s"r_$s",
        direction = "forward")
      .select("id", "r_state").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L) === Some("a"), "equal ts matches (>= in forward terms)")
    assert(out(2L) === Some("c"), "nearest later row, not an earlier one")
    assert(out(3L) === None, "nothing after → null")
  }

  test("NULL left timestamp matches nothing in EITHER direction") {
    import spark.implicits._
    val left = Seq((1L, "k", Some(25L)), (2L, "k", None))
      .toDF("id", "key", "t")
    val right = Seq(("k", 10L, "a"), ("k", 40L, "c")).toDF("key", "t", "state")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOf.asOfJoin(left, right, keys = Seq("key"), ts = "t",
          payload = Seq("state"), rename = s => s"r_$s", direction = dir)
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      assert(out(2L) === None, s"$dir: null ts must not match any row")
      assert(out(1L).nonEmpty, s"$dir: non-null ts still matches")
    }
  }

  test("NULL right timestamp matches nothing in EITHER direction (round-14 fix)") {
    import spark.implicits._
    // a null-ts right row would sort at the partition front and get
    // carried into every left row with no earlier real match
    val left = Seq((1L, "k", 5L), (2L, "k", 50L)).toDF("id", "key", "t")
    val right = Seq(("k", Option.empty[Long], "ghost"), ("k", Some(40L), "real"))
      .toDF("key", "t", "state")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOf.asOfJoin(left, right, keys = Seq("key"), ts = "t",
          payload = Seq("state"), rename = s => s"r_$s", direction = dir)
        .collect().map(r => r.getLong(0) -> Option(r.getString(3))).toMap
      if (dir == "backward") {
        assert(out(1L) === None, "no real right row at ts <= 5; the " +
          "null-ts row must NOT be treated as an earlier match")
        assert(out(2L) === Some("real"))
      } else {
        assert(out(1L) === Some("real"))
        assert(out(2L) === None, "no real right row at ts >= 50; the " +
          "null-ts row must NOT match")
      }
    }
  }

  test("NULL payload in the matched right row is carried as NULL") {
    import spark.implicits._
    // the matched row's fields must come from ONE right row: per-column
    // ignoreNulls carry would resurrect "a" for the ts=20 match
    val left = Seq((1L, "k", 25L)).toDF("id", "key", "t")
    val right = Seq(("k", 10L, Some("a")), ("k", 20L, None))
      .toDF("key", "t", "state")
    val out = AsOf.asOfJoin(left, right, keys = Seq("key"), ts = "t",
        payload = Seq("t", "state"),
        rename = { case "t" => "r_t"; case o => s"r_$o" })
      .select("r_t", "r_state").collect()(0)
    assert(out.getLong(0) === 20L, "matches the newest right row")
    assert(out.isNullAt(1), "and carries ITS null field, not an older value")
  }

  test("as-of join is ONE shuffle on the key — no range explosion") {
    val df = AsOf.eventsAsOfLastPurchase(spark, sfDir)
    val plan = df.queryExecution.executedPlan
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }
    // purchases dedup (user_id, ts) + the as-of window both hash by
    // user_id; nothing else may shuffle, and nothing may nested-loop
    assert(shuffles.size <= 2, s"expected <=2 exchanges, got ${shuffles.size}")
    assert(plan.toString.contains("Window"))
    assert(!plan.toString.contains("CartesianProduct"))
    assert(!plan.toString.contains("BroadcastNestedLoop"))
  }

  test("matches per-row recomputation on the events table") {
    // independent oracle: correlated max-ts lookup via a self-join
    val events = Relational.events(spark, sfDir)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("p_value"))
    val expected = events.as("l")
      .join(purchases.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.ts") >= col("r.ts"),
        "left")
      .groupBy(col("l.event_id"))
      .agg(max(struct(col("r.ts"), col("r.p_value"))).as("m"))
      .select(col("event_id"), col("m.ts").as("e_pts"),
        col("m.p_value").as("e_pval"))
    val actual = AsOf.eventsAsOfLastPurchase(spark, sfDir)
      .select(col("event_id"), col("purchase_ts"), col("purchase_value"))
    val joined = actual.join(expected, Seq("event_id"))
    val mismatches = joined.filter(
      !(col("purchase_ts").isNull && col("e_pts").isNull) &&
        (col("purchase_ts") =!= date_format(col("e_pts"),
          "yyyy-MM-dd HH:mm:ss.SSSSSS") ||
          col("purchase_value") =!= col("e_pval"))).count()
    assert(mismatches === 0)
    assert(actual.count() === events.count(), "left join keeps every event")
  }
}
