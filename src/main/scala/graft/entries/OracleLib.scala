package graft.entries

/** Shared DuckDB-oracle SQL fragments used across the entry modules —
  * the CTE prefixes, golden VALUES tables and expression twins that the
  * per-family `oracleSql` maps compose. Moved verbatim from the
  * monolithic `graft.SparkEntry` (round 11 split).
  */
private[graft] object OracleLib {
  // ------------------------------------------------------------ oracle SQL

  // the corpus-wide word count: \s+ tokens with empties dropped — the
  // oracle twin of TextOps.nWords (same list_filter idiom as q_repetition)
  val wordsExpr =
    "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0)) AS BIGINT)"

  // shared CTE prefixes for the repeated-substring oracles: stride-1
  // 8-word anchors over every doc (anchorCtes), the >=2-distinct-doc
  // repeated flagged stream (repeatedAnchorCtes — mirrors
  // Dedup.repeatedPositions at k = 8, minDocs = 2), and the
  // gaps-and-islands region merge tail (islandRegionSql — mirrors
  // Dedup.islandRegions; expects a CTE `f`(doc_id, p))
  val anchorCtes =
    "WITH toks AS (SELECT doc_id, list_filter(" +
      "string_split_regex(text, '\\s+'), x -> len(x) > 0) AS w " +
      "FROM documents), " +
      "anch AS (SELECT doc_id, CAST(u AS INT) AS p, array_to_string(" +
      "list_slice(w, CAST(u AS INT) + 1, CAST(u AS INT) + 8), ' ') " +
      "AS gram FROM (SELECT doc_id, w, unnest(range(0, len(w) - 7)) " +
      "AS u FROM toks WHERE len(w) >= 8)), "

  val repeatedAnchorCtes = anchorCtes +
    "rep AS (SELECT gram FROM anch GROUP BY gram " +
      "HAVING count(DISTINCT doc_id) >= 2), " +
      "f AS (SELECT a.doc_id, a.p FROM anch a JOIN rep USING (gram)), "

  val islandRegionSql =
    "isl AS (SELECT doc_id, p, CASE WHEN p - lag(p) OVER " +
      "(PARTITION BY doc_id ORDER BY p) <= 8 THEN 0 ELSE 1 END AS brk " +
      "FROM f), " +
      "g AS (SELECT doc_id, p, sum(brk) OVER (PARTITION BY doc_id " +
      "ORDER BY p ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
      "AS grp FROM isl) " +
      "SELECT doc_id, CAST(min(p) AS BIGINT) AS start_word, " +
      "CAST(max(p) + 8 AS BIGINT) AS end_word, " +
      "CAST(max(p) + 8 - min(p) AS BIGINT) AS span_words, " +
      "CAST(count(*) AS BIGINT) AS n_windows " +
      "FROM g GROUP BY doc_id, grp"

  /** Golden VALUES for the 18-state table (iso, names, centroid, geometry
    * length + MultiPolygon prefix) — from the embedded resource, matching
    * the reference's published range 780–53,852 chars. */
  val statesValues: String = Seq(
    ("SD-KH", "Khartoum", "الخرطوم", 32.53, 15.55, 780),
    ("SD-GZ", "Al Jazirah", "الجزيرة", 33.53, 14.88, 2922),
    ("SD-GD", "Al Qadarif", "القضارف", 35.40, 14.03, 4625),
    ("SD-KA", "Kassala", "كسلا", 36.40, 15.45, 3388),
    ("SD-RS", "Red Sea", "البحر الأحمر", 37.22, 19.62, 53852),
    ("SD-NR", "River Nile", "نهر النيل", 33.93, 17.50, 1948),
    ("SD-NO", "Northern", "الشمالية", 30.22, 19.50, 1303),
    ("SD-NW", "White Nile", "النيل الأبيض", 32.17, 13.17, 2825),
    ("SD-NB", "Blue Nile", "النيل الأزرق", 34.05, 11.25, 1945),
    ("SD-SI", "Sennar", "سنار", 34.13, 13.55, 3399),
    ("SD-DS", "South Darfur", "جنوب دارفور", 24.92, 11.75, 5475),
    ("SD-DN", "North Darfur", "شمال دارفور", 25.08, 15.77, 4993),
    ("SD-DW", "West Darfur", "غرب دارفور", 22.85, 12.83, 5075),
    ("SD-DC", "Central Darfur", "وسط دارفور", 24.23, 13.50, 3150),
    ("SD-DE", "East Darfur", "شرق دارفور", 26.13, 12.75, 1883),
    ("SD-KN", "North Kordofan", "شمال كردفان", 29.42, 13.83, 2381),
    ("SD-KS", "South Kordofan", "جنوب كردفان", 29.67, 11.20, 2067),
    ("SD-KW", "West Kordofan", "غرب كردفان", 28.05, 12.25, 1712)
  ).map { case (iso, en, ar, lon, lat, n) =>
    s"('$iso', '$en', '$ar', $lon, $lat, $n, " +
      "'{\"type\":\"MultiPolygon\"')"
  }.mkString(", ")

  /** Shared golden-states oracle (q_states AND q_sql_tvf_states — the
    * TVF spelling must hash-match the factory spelling). */
  val statesOracleSql: String =
    "SELECT iso_code, state_name, state_name_ar, " +
      "CAST(centroid_lon AS DOUBLE) AS centroid_lon, " +
      "CAST(centroid_lat AS DOUBLE) AS centroid_lat, " +
      "CAST(n_geojson_chars AS BIGINT) AS n_geojson_chars, geo_prefix " +
      s"FROM (VALUES $statesValues) AS t(iso_code, state_name, " +
      "state_name_ar, centroid_lon, centroid_lat, n_geojson_chars, geo_prefix)"

  /** Word-3-gram shingle sets per document, as a DuckDB CTE — the list-
    * function twin of `Dedup.shingleArray` (same \s+ tokenization, same
    * empty-token filter, same short-text branch). */
  val shingleCte: String =
    "WITH s AS (SELECT doc_id, list_distinct(" +
      "CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] " +
      "ELSE list_transform(range(1, len(w) - 1), i -> " +
      "array_to_string(w[i:i+2], ' ')) END) AS sh " +
      "FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0) AS w FROM documents)) "

  /** Exact Jaccard of two shingle CTE rows `a`/`b` (DuckDB list algebra),
    * twin of `Dedup.jaccardExpr`. */
  val jaccardSqlExpr: String =
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)"

  /** All-pairs shingle-Jaccard ≥ 0.5 as an INVERTED-INDEX CTE chain
    * (`u → cand → pairs`, appended after [[shingleCte]]'s `s`) — the
    * round-13 rewrite of the oracle-side quadratic that timed out 13
    * sf1 off-gate checks (r12 verdict task #4). Value-identical to the
    * old `s a JOIN s b ON a.doc_id < b.doc_id WHERE round(jaccard,4)
    * >= 0.5` formulation:
    *  - `sh` is list_distinct'd, so unnesting and equi-joining on the
    *    shingle counts |A∩B| exactly (`inter`), and |A∪B| = na+nb−inter;
    *    the round/cast shapes match the old expression, so the jaccard
    *    DOUBLE is bit-identical.
    *  - pairs sharing NO shingle are absent from `cand` — they have
    *    jaccard 0 < 0.5, so dropping them is exact.
    *  - the size band is derived from the threshold in EXACT INTEGER
    *    form (round-14 advice fix — the old `n ≤ 2·m+1` form silently
    *    assumed shingle counts ≤ ~5000): passing requires
    *    round(inter/union,4) ≥ 0.5 ⇒ inter/union ≥ 0.49995, and
    *    inter ≤ min, union ≥ max ⇒ 49995·max ≤ 100000·min; the band
    *    adds +100000 slack (one whole shingle) on top, and the exact
    *    WHERE re-checks every survivor, so the band can only ever be
    *    loose, never lossy — at ANY future doc size.
    * Cost: Σ_g df(g)² within the band instead of n²·|sh| list
    * intersections — measured 5.8 s vs >120 s on the 50k-doc sf1 twin,
    * same 2 560 pairs. */
  val jaccardPairsCte: String =
    ", u AS (SELECT doc_id, len(sh) AS n, unnest(sh) AS g FROM s), " +
      "cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "max(a.n) AS na, max(b.n) AS nb, count(*) AS inter " +
      "FROM u a JOIN u b ON a.g = b.g AND a.doc_id < b.doc_id " +
      "AND a.n * 49995 <= b.n * 100000 + 100000 " +
      "AND b.n * 49995 <= a.n * 100000 + 100000 " +
      "GROUP BY 1, 2), " +
      "pairs AS (SELECT doc_a, doc_b, round(CAST(inter AS DOUBLE) / " +
      "CAST(na + nb - inter AS DOUBLE), 4) AS jaccard FROM cand " +
      "WHERE round(CAST(inter AS DOUBLE) / " +
      "CAST(na + nb - inter AS DOUBLE), 4) >= 0.5)"

  /** The LSH bucket id of `Similarity.withBucket`, as DuckDB SQL over a
    * column `e` = CAST(embedding AS DOUBLE[]): the SAME deterministic
    * hyperplane constants are embedded as literals, and both engines
    * compute the dot product as a sequential fold over doubles, so the sign
    * pattern — hence the bucket — is bit-identical. This makes the
    * LSH-bucketed join itself oracle-checkable, not just its output shape. */
  def bucketSqlExpr(numPlanes: Int): String =
    graft.operators.Similarity.hyperplanes(numPlanes, 64).zipWithIndex
      .map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(e, CAST($arr AS DOUBLE[])) >= 0 " +
          s"THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")

  /** DuckDB cosine between shingle-CTE-style embedding columns. */
  def cosineSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b))), 4)"

  /** Bucket-cap twin for the oracles of capped operators
    * (`Similarity.capBuckets`, default maxBucket = 1000): drops whole
    * buckets holding more than 1000 vectors BEFORE the self-join, so
    * the SQL re-derivation stays bit-identical to the Spark side even
    * on a corpus where the cap actually binds (no fixture bucket comes
    * near it, but the contract must not silently depend on that). */
  val cappedBucketCte: String =
    "bk AS (SELECT bucket FROM b GROUP BY bucket " +
      "HAVING count(*) <= 1000), " +
      "bc AS (SELECT b.* FROM b JOIN bk ON bk.bucket = b.bucket), "

  /** Undirected simple k-NN edge list as a DuckDB CTE chain (b → p →
    * kk → e): the q_knn_join top-5 pairs re-derived (bit-identical
    * hyperplane buckets, same 1000-vector bucket cap), then
    * least/greatest-normalized and dedup'd — the shared edge input of
    * the graph-analytics oracles, mirroring
    * `GraphOps.undirect(Similarity.knnJoin(...))`. */
  val knnEdgeCte: String =
    "WITH b AS (SELECT vec_id, e, " + bucketSqlExpr(8) + " AS bucket " +
      "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
      "FROM embeddings) t0), " +
      cappedBucketCte +
      "p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, " +
      cosineSql("a.e", "c.e") + " AS cosine " +
      "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id), " +
      "kk AS (SELECT vec_a, vec_b FROM (SELECT vec_a, vec_b, " +
      "row_number() OVER (PARTITION BY vec_a ORDER BY cosine DESC, " +
      "vec_b ASC) AS rank FROM p) t WHERE rank <= 5), " +
      "e AS (SELECT DISTINCT least(vec_a, vec_b) AS src, " +
      "greatest(vec_a, vec_b) AS dst FROM kk)"

  /** Fixed-iteration PageRank oracle: the power method unrolled as
    * `iters` chained CTEs (engine-safe — no aggregation inside a
    * RECURSIVE term), twin of `GraphOps.pageRank` over the undirected
    * k-NN edges. All constants route through CAST(... AS DOUBLE) so both
    * engines run identical IEEE arithmetic; only the final rank rounds. */
  def pageRankOracleSql(iters: Int): String = {
    val base = knnEdgeCte +
      ", de AS (SELECT src, dst FROM e " +
      "UNION ALL SELECT dst AS src, src AS dst FROM e)" +
      ", deg AS (SELECT src AS node, count(*) AS deg FROM de GROUP BY 1)" +
      ", nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM deg)" +
      ", pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) " +
      "AS pr FROM deg)"
    val iterCtes = (1 to iters).map { i =>
      s", pr$i AS (SELECT d.node, " +
        "(CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn) " +
        "+ CAST(0.85 AS DOUBLE) * COALESCE(s.mass, CAST(0 AS DOUBLE)) AS pr " +
        s"FROM deg d LEFT JOIN (SELECT de.dst AS node, " +
        s"sum(p.pr / dg.deg) AS mass FROM pr${i - 1} p " +
        "JOIN deg dg ON dg.node = p.node JOIN de ON de.src = p.node " +
        "GROUP BY de.dst) s ON s.node = d.node)"
    }.mkString
    base + iterCtes +
      s" SELECT d.node, d.deg, round(p.pr, 4) AS pr " +
      s"FROM deg d JOIN pr$iters p ON p.node = d.node"
  }

  /** Personalized-PageRank oracle: same unrolled power method, teleport
    * mass confined to the seed set (label = `seedLabel` vectors present
    * in the edge set). Twin of `GraphOps.personalizedPageRank`. */
  def pprOracleSql(iters: Int, seedLabel: Int): String = {
    val base = knnEdgeCte +
      ", de AS (SELECT src, dst FROM e " +
      "UNION ALL SELECT dst AS src, src AS dst FROM e)" +
      ", dg0 AS (SELECT src AS node, count(*) AS deg FROM de GROUP BY 1)" +
      ", sd AS (SELECT d.node, d.deg, (sv.vec_id IS NOT NULL) AS is_seed " +
      "FROM dg0 d LEFT JOIN (SELECT DISTINCT vec_id FROM embeddings " +
      s"WHERE label = $seedLabel) sv ON sv.vec_id = d.node)" +
      ", ns AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM sd WHERE is_seed)" +
      ", pr0 AS (SELECT node, CASE WHEN is_seed THEN " +
      "CAST(1.0 AS DOUBLE) / (SELECT n FROM ns) ELSE CAST(0 AS DOUBLE) " +
      "END AS pr FROM sd)"
    val iterCtes = (1 to iters).map { i =>
      s", pr$i AS (SELECT d.node, " +
        "(CASE WHEN d.is_seed THEN (CAST(1.0 AS DOUBLE) - " +
        "CAST(0.85 AS DOUBLE)) / (SELECT n FROM ns) " +
        "ELSE CAST(0 AS DOUBLE) END) " +
        "+ CAST(0.85 AS DOUBLE) * COALESCE(s.mass, CAST(0 AS DOUBLE)) " +
        s"AS pr FROM sd d LEFT JOIN (SELECT de.dst AS node, " +
        s"sum(p.pr / dg.deg) AS mass FROM pr${i - 1} p " +
        "JOIN sd dg ON dg.node = p.node JOIN de ON de.src = p.node " +
        "GROUP BY de.dst) s ON s.node = d.node)"
    }.mkString
    base + iterCtes +
      s" SELECT d.node, d.deg, d.is_seed, round(p.pr, 4) AS pr " +
      s"FROM sd d JOIN pr$iters p ON p.node = d.node"
  }

  /** Winnowing fingerprints as a DuckDB CTE (`fp`: doc_id, fp_hash), twin
    * of `TextOps.fingerprintSet` with k=8, window=4. The Karp-Rabin k-gram
    * hash is the fixed polynomial sum(ord(c_j) * 131^(k-1-j)) mod 1e9+7 —
    * powers spelled out as constants; window minima + distinct reproduce
    * the winnow. Short-text branches mirror the Scala exactly: no k-gram
    * (len(text) < 8) → no rows; fewer hashes than one window (len(h) < 4)
    * → the single global min. ASCII corpus → DuckDB codepoints == JVM
    * UTF-16 units, so ord() matches charAt. */
  val fpCte: String =
    "WITH hs AS (SELECT doc_id, " +
      "list_transform(range(1, length(text) - 6), i -> (" +
      Seq(617266377L, 913108910L, 579489385L, 294499921L,
        2248091L, 17161L, 131L, 1L).zipWithIndex.map { case (p, j) =>
          s"CAST(ord(text[i+$j]) AS BIGINT) * $p"
        }.mkString(" + ") +
      ") % 1000000007) AS h FROM documents), " +
      "fp AS (SELECT doc_id, CAST(unnest(list_distinct(" +
      "CASE WHEN len(h) = 0 THEN [] " +
      "WHEN len(h) < 4 THEN [list_min(h)] " +
      "ELSE list_transform(range(1, len(h) - 2), i -> list_min(h[i:i+3])) " +
      "END)) AS BIGINT) AS fp_hash FROM hs)"

  /** Containment score over the pruned fingerprint universe (CTE aliases
    * sh/sa/sb from q_containment). */
  val containSqlExpr: String =
    "CAST(sh.shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)"

  /** Exploded word stream (doc_id, lang, word), twin of `TextOps.words`. */
  /** One-row-per-word CTE, parameterized by the carried columns so
    * variants are built, not string-edited (a silent no-op `.replace`
    * on drifted CTE text was the failure mode this removes). */
  def wordCteWith(extraCols: String*): String =
    "WITH w AS (SELECT " + (Seq("doc_id") ++ extraCols).mkString(", ") +
      ", unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0)) AS word FROM documents)"

  val wordCte: String = wordCteWith("lang")

  /** Synthetic image pixel stream — the codec-free twin of
    * `Multimodal.pixelValue`/`imageDims`: one row per (asset, x, y) with
    * the rule-derived gray value. Everything the real-PNG operators emit
    * is re-derivable from this. */
  val imagePxCte: String =
    "WITH px AS (SELECT d.doc_id AS asset_id, " +
      "16 + d.doc_id % 16 AS w, 16 + d.doc_id % 8 AS h, " +
      "x.x AS x, y.y AS y, " +
      "(d.doc_id*31 + x.x*7 + y.y*13) % 256 AS g " +
      "FROM documents d, " +
      "unnest(range(0, 16 + d.doc_id % 16)) AS x(x), " +
      "unnest(range(0, 16 + d.doc_id % 8)) AS y(y))"

  /** dHash from the pixel stream: 9×8 integer average-pool cells, bit =
    * right-neighbor strictly brighter, packed into two 32-bit halves
    * (no BIGINT sign-bit hazards in either engine). Appended after
    * [[imagePxCte]]. */
  val imageDHashCte: String =
    "cell AS (SELECT asset_id, y*8//h AS v, x*9//w AS u, " +
      "CAST(sum(g) AS DOUBLE)/count(*) AS c FROM px GROUP BY 1, 2, 3), " +
      "bits AS (SELECT a.asset_id, a.v * 8 + a.u AS bit, " +
      "CASE WHEN b.c > a.c THEN 1 ELSE 0 END AS bv " +
      "FROM cell a JOIN cell b ON b.asset_id = a.asset_id " +
      "AND b.v = a.v AND b.u = a.u + 1 WHERE a.u < 8), " +
      "hs AS (SELECT asset_id, " +
      "CAST(sum(CASE WHEN bit >= 32 THEN bv * (1::BIGINT << (bit - 32)) " +
      "ELSE 0 END) AS BIGINT) AS dhash_hi, " +
      "CAST(sum(CASE WHEN bit < 32 THEN bv * (1::BIGINT << bit) " +
      "ELSE 0 END) AS BIGINT) AS dhash_lo FROM bits GROUP BY asset_id)"



  /** Golden for q_stream_neardup at the oracle SF (see comment above). */
  val streamNearDupGolden: String =
    "SELECT CAST(new_id AS BIGINT) AS new_id, " +
      "CAST(hist_id AS BIGINT) AS hist_id, " +
      "CAST(sim_est AS DOUBLE) AS sim_est FROM (VALUES " +
      Seq[(Int, Int, Double)](
        (8, 245, 1.0), (26, 455, 0.8906), (31, 383, 0.9531), (44, 446, 0.9531),
        (45, 267, 1.0), (45, 413, 1.0), (58, 293, 1.0), (61, 185, 1.0),
        (70, 447, 0.9844), (72, 377, 1.0), (87, 134, 0.9219), (92, 450, 0.9375),
        (98, 290, 0.9688), (107, 387, 0.9688), (120, 332, 0.9688), (134, 87, 0.9219),
        (152, 178, 0.9375), (166, 323, 1.0), (178, 152, 0.9375), (185, 61, 1.0),
        (245, 8, 1.0), (267, 45, 1.0), (267, 413, 1.0), (285, 301, 1.0),
        (290, 98, 0.9688), (293, 58, 1.0), (295, 374, 0.9219), (301, 285, 1.0),
        (310, 389, 0.9531), (323, 166, 1.0), (326, 457, 1.0), (332, 120, 0.9688),
        (374, 295, 0.9219), (377, 72, 1.0), (383, 31, 0.9531), (387, 107, 0.9688),
        (389, 310, 0.9531), (393, 420, 0.9844), (413, 45, 1.0), (413, 267, 1.0),
        (420, 393, 0.9844), (435, 486, 0.9688), (446, 44, 0.9531), (447, 70, 0.9844),
        (450, 92, 0.9375), (455, 26, 0.8906), (457, 326, 1.0), (458, 462, 1.0),
        (462, 458, 1.0), (486, 435, 0.9688))
        .map { case (a, b, e) => s"($a, $b, $e)" }.mkString(", ") +
      ") AS t(new_id, hist_id, sim_est)"

  /** Golden for q_simhash_pairs at the oracle SF (see comment above):
    * the 30 Hamming<=3 pairs. Sanity anchors: the corpus's 24 exact-dup +
    * 1 J=0.9891 near-dup pairs (q_minhash_pairs' exact-Jaccard oracle) all
    * reappear here with hamming 0-2, as SimHash semantics require. */
  val simhashGolden: String =
    "SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, " +
      "CAST(hamming AS INTEGER) AS hamming FROM (VALUES " +
      Seq((8, 245, 2), (9, 429, 3), (22, 218, 3), (31, 383, 1), (44, 446, 2),
        (45, 267, 1), (45, 413, 1), (58, 293, 1), (61, 185, 2), (66, 311, 3),
        (66, 352, 2), (70, 447, 0), (87, 134, 1), (92, 450, 3), (98, 290, 0),
        (107, 387, 3), (120, 332, 2), (166, 323, 0), (194, 315, 3),
        (264, 315, 3), (267, 413, 0), (271, 306, 3), (271, 328, 2),
        (285, 301, 1), (295, 374, 1), (310, 389, 2), (315, 429, 3),
        (326, 457, 2), (435, 486, 2), (458, 462, 2))
        .map { case (a, b, h) => s"($a, $b, $h)" }.mkString(", ") +
      ") AS t(doc_a, doc_b, hamming)"
}