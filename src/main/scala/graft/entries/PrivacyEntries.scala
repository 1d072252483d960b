package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Privacy-release family: k-anonymity generalization ladder and the
  * noisy-histogram mechanism — the "what leaves the enclave" step of a
  * training-data pipeline. Operators in
  * [[graft.operators.Privacy]]; both releases are pure group-level
  * aggregates, so the DuckDB oracles replay the exact same ladder in
  * CTEs over the same parquet.
  */
private[graft] object PrivacyEntries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // k-anonymous release (k=5) with hour → day → suppress ladder and
    // the l-diversity (l=3) audit column; row accounting is conserved
    // (Σ n_rows = count(events)) — pinned in PrivacySpec
    "q_kanon_release" -> ((s, d) =>
      graft.operators.Privacy.kAnonymize(s, d, k = 5, l = 3)),
    // noisy histogram: keyed deterministic noise in [-10, 10] applied
    // at group grain post-aggregate (the test-reproducible stand-in
    // for Laplace — see the operator scaladoc for the honesty note)
    "q_noisy_hist" -> ((s, d) =>
      graft.operators.Privacy.noisyHistogram(s, d)),
  )

  val oracleSql: Map[String, String] = Map(
    // the same ladder, replayed in CTEs: distinct grain → hour stats →
    // residual day stats (failed hours only) → suppressed remainder
    "q_kanon_release" ->
      ("WITH grain AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "strftime(ts, '%Y-%m-%d %H:00') AS hour, user_id, " +
        "CAST(floor(value / 50) AS BIGINT) AS sens, count(*) AS n " +
        "FROM events GROUP BY 1, 2, 3, 4, 5), " +
        "h AS (SELECT event_type, day, hour, sum(n) AS n_rows, " +
        "count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT sens) AS n_values FROM grain GROUP BY 1, 2, 3), " +
        "dg AS (SELECT g.* FROM grain g JOIN (SELECT event_type, day, " +
        "hour FROM h WHERE n_users < 5) f " +
        "USING (event_type, day, hour)), " +
        "d AS (SELECT event_type, day, sum(n) AS n_rows, " +
        "count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT sens) AS n_values FROM dg GROUP BY 1, 2), " +
        "sg AS (SELECT g.* FROM dg g JOIN (SELECT event_type, day " +
        "FROM d WHERE n_users < 5) f USING (event_type, day)), " +
        "s AS (SELECT event_type, sum(n) AS n_rows, " +
        "count(DISTINCT user_id) AS n_users, " +
        "count(DISTINCT sens) AS n_values FROM sg GROUP BY 1) " +
        "SELECT event_type, 'hour' AS granularity, hour AS bucket, " +
        "CAST(n_rows AS BIGINT) AS n_rows, " +
        "CAST(n_users AS BIGINT) AS n_users, n_values >= 3 AS l_ok " +
        "FROM h WHERE n_users >= 5 " +
        "UNION ALL SELECT event_type, 'day', day, " +
        "CAST(n_rows AS BIGINT), CAST(n_users AS BIGINT), n_values >= 3 " +
        "FROM d WHERE n_users >= 5 " +
        "UNION ALL SELECT event_type, 'suppressed', NULL, " +
        "CAST(n_rows AS BIGINT), CAST(n_users AS BIGINT), n_values >= 3 " +
        "FROM s"),
    // keyed-LCG noise: both engines compute the identical integer
    // arithmetic on (day-of-month, type length) — positive operands,
    // so % agrees — then clamp at zero
    "q_noisy_hist" ->
      ("SELECT event_type, day, CAST(greatest(0, n_true + " +
        "(CAST(substr(day, 9, 2) AS INT) * 131 + " +
        "length(event_type) * 17) % 21 - 10) AS BIGINT) AS n_noisy " +
        "FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "count(*) AS n_true FROM events GROUP BY 1, 2) t"),
  )
}
