package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (temporal) join: each left row picks the single right row with
  * the same key and the nearest right timestamp — backward (greatest
  * right ts <= left ts, the default) or forward (smallest right ts >=
  * left ts) — the "state as of this moment" lookup every event-enrichment
  * pipeline needs (latest price at trade time, last purchase before this
  * event, next maintenance after a failure).
  *
  * Spark-first plan — the UNION + WINDOW trick, not a range join:
  * tag both sides, union them, and run ONE window over (key) ordered by
  * (ts, side) where right rows sort before left rows at equal ts (>= ties
  * match); `last(payload, ignoreNulls)` over the unbounded-preceding frame
  * carries each right row's payload forward to every later left row.
  *
  * Scale: a single shuffle on the key (the union is shuffle-free), then a
  * linear sorted pass — the same cost class as one sort-merge join, with
  * no range explosion and no per-left-row probe. At 100 TB the shuffle is
  * keyed by the join key, so AQE skew handling applies as usual; state per
  * task is one row of carried payload (constant memory).
  *
  * The right side must be unique per (key, ts) — dedup it first (e.g.
  * aggregate by (key, ts)) or ties make the carried payload
  * order-dependent. Asserted cheap here via the caller's contract; the
  * oracle twin is DuckDB's native ASOF LEFT JOIN.
  */
object AsOf {

  /** Left-as-of-join `right` onto `left`.
    * @param keys      equality key columns (present in both sides)
    * @param ts        event-time column name (present in both sides,
    *                  same orderable type)
    * @param payload   right-side columns to carry (renamed via `rename`)
    * @param rename    output name for each carried payload column
    *                  (right's `ts` may itself be carried, e.g. "asof_ts")
    * @param direction "backward" (default): greatest right ts <= left ts;
    *                  "forward": smallest right ts >= left ts. Forward
    *                  reverses the window order (ts desc, right rows
    *                  still first), so the carried row is the nearest
    *                  LATER one — same single shuffle, same state. */
  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      ts: String, payload: Seq[String], rename: String => String,
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be 'backward' or 'forward', got '$direction'")
    val leftCols = left.columns.toSeq
    val carried = payload.map(rename)
    require(carried.intersect(leftCols).isEmpty,
      s"renamed payload collides with left columns: ${carried.intersect(leftCols)}")
    // The carried payload is ONE struct, not per-column lasts: a NULL
    // FIELD inside the matched right row must be carried as NULL (as the
    // native ASOF join would), not skipped in favor of an older row's
    // value — per-column last(ignoreNulls) would mix fields from
    // different right rows. The struct itself is non-null exactly on
    // right rows, so ignoreNulls skips only the left rows interleaved in
    // the union, never a legitimate all-NULL payload.
    val payloadStruct = struct(payload.map(p => col(p).as(rename(p))): _*)
    // right rows sort first (side 0) at equal ts → `>=` tie semantics
    val l = left.withColumn("_side", lit(1))
    val r = right.select(((keys :+ ts).map(col) :+ lit(0).as("_side")) :+
      payloadStruct.as("_payload"): _*)
    // align schemas: right contributes nulls for left-only columns
    val rAligned = leftCols.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }.select((leftCols.map(col) :+ col("_side")) :+ col("_payload"): _*)
    val lAligned = l.select((leftCols.map(col) :+ col("_side")) :+
      lit(null).cast(r.schema("_payload").dataType).as("_payload"): _*)

    // NULLS FIRST in both directions: backward's asc defaults to it, but
    // desc defaults to NULLS LAST — which would put a null-ts left row at
    // the frame END, handing it every right row's carry instead of the
    // no-match NULL that null-comparison semantics require
    val tsOrder =
      if (direction == "backward") col(ts).asc else col(ts).desc_nulls_first
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(tsOrder, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lAligned.unionByName(rAligned)
      .withColumn("_carried", last(col("_payload"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        carried.map(c => col(s"_carried.$c").as(c)): _*)
  }

  /** Demo entry: every event enriched with the user's most recent purchase
    * (value + time) as of the event's timestamp — purchases tie-broken
    * to one row per (user_id, ts) so the as-of match is unique. */
  def eventsAsOfLastPurchase(spark: SparkSession, dir: String): DataFrame = {
    val events = Relational.events(spark, dir)
      .select("event_id", "user_id", "ts", "event_type", "value")
    val purchases = events.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts").agg(max("value").as("value"))
      .select(col("user_id"), col("ts"), col("ts").as("p_ts"), col("value"))
    asOfJoin(events, purchases, keys = Seq("user_id"), ts = "ts",
      payload = Seq("p_ts", "value"),
      rename = { case "p_ts" => "purchase_ts"; case "value" => "purchase_value"
                 case other => other })
      .select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("ts"),
        col("event_type"),
        date_format(col("purchase_ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
          .as("purchase_ts"),
        col("purchase_value"))
  }
}
