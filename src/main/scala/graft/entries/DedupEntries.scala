package graft.entries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{AsOf, BloomFilterJoin, Dedup, Multimodal,
  RangeJoin, Relational, Similarity, TextOps}
import OracleLib._

/** Dedup family: exact/near/span/set-similarity dedup and
  * the near-dup pair-graph consumers.
  *
  * Split out of the monolithic `graft.SparkEntry` (round 11): one module
  * per operator family, each holding the family's `queries` entries and
  * their DuckDB `oracleSql` twins. `SparkEntry` aggregates the modules;
  * `SparkEntrySpec` still guards queries↔oracle key parity on the
  * aggregate. Shared oracle SQL fragments live in [[OracleLib]].
  */
private[graft] object DedupEntries {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // LLM-pipeline: dedup family
    "q_dedup_exact" -> (Dedup.exact _),
    "q_span_dedup" -> ((s, d) => Dedup.spanDedup(s, d)),
    // cross-doc maximal repeated substrings (Lee et al. substring dedup)
    "q_repeated_spans" -> ((s, d) => Dedup.repeatedSpans(s, d)),
    "q_repeated_span_excise" -> ((s, d) => Dedup.repeatedSpanExcise(s, d)),
    // admission-time substring guard vs the bucket-partitioned gram index
    "q_span_guard" -> ((s, d) => Dedup.spanGuard(s, d)),
    // EXACT set-similarity join (PPJoin prefix filter) on the SAME
    // shingle-Jaccard measure as q_minhash_pairs — recall-1, no LSH
    "q_setsim_pairs" -> ((s, d) => Dedup.setSimPairs(s, d)),
    "q_jaccard" -> (Dedup.jaccardPairs _),
    "q_char_jaccard" -> ((s, d) => Dedup.charJaccardPairs(s, d)),
    // the entries run the build-once/probe-many shape (signatures read
    // from the materialized parquet table, not recomputed per join side —
    // same principle as the IVF index; output spec-pinned identical to
    // the recomputing form)
    // the pair pipeline itself is build-once: every minhash consumer
    // (keep, clusters, clean corpus, audits, source matrix) scans the
    // materialized (doc_a, doc_b, jaccard) table
    "q_minhash_pairs" -> ((s, d) => Dedup.minHashPairsCached(s, d)),
    "q_minhash_keep" -> ((s, d) => Dedup.minHashKeep(s, d, materialized = true)),
    // transitive dedup: connected components over the near-dup pair graph;
    // the labels come from the build-once assignment table (CC runs once
    // per session — the report and the keep-filter both scan it)
    "q_dedup_clusters" -> ((s, d) =>
      Dedup.minHashClusters(s, d, materialized = true)),
    // incremental CC: history half labeled once, new half folded in via
    // label edges — history's EDGES never re-read, output ≡ one-shot
    "q_cc_incremental" -> ((s, d) =>
      Dedup.minHashClustersIncremental(s, d)),
    // contrastive training pairs: near-dup positives + deterministic
    // sharded hash-rotation negatives (anti-joined against the pair
    // table) — the embedding-model training-data consumer of the graph
    "q_contrastive_pairs" -> ((s, d) =>
      Dedup.contrastivePairs(s, d)),
    "q_cluster_keep" -> ((s, d) =>
      Dedup.minHashClusterKeep(s, d, materialized = true)),
    // quality-weighted canonical selection: keep the LONGEST member of
    // each near-dup cluster (tie → min doc_id), not the min-id one
    "q_cluster_keep_best" -> ((s, d) => Dedup.clusterKeepBest(s, d)),
    // soft dedup: per-doc sampling weight 1/cluster_n instead of a drop
    "q_soft_dedup" -> ((s, d) => Dedup.softDedupWeights(s, d)),
    "q_simhash_pairs" -> ((s, d) => Dedup.simHashPairs(s, d)),
    // Levenshtein near-dup: length-banded equi-join candidates, thresholded
    // DP verify (never all-pairs; see Dedup.editDistancePairs scaladoc)
    "q_edit_distance" -> ((s, d) => Dedup.editDistancePairs(s, d)),
    // the PairGuard pre-flight's enumerated-candidate count as an
    // oracle-checked value (round-14): the guard's economics are only
    // trustworthy if the estimate is EXACT, so the estimate itself is
    // a gate entry cross-checked against DuckDB's independent
    // histogram self-join
    "q_edit_estimate" -> ((s, d) => {
      val est = Dedup.editCandidateEstimate(s, d, 8)
      val sp = s
      import sp.implicits._
      Seq(est.toLong).toDF("candidates")
    }),
    // corpus-composition diagnostic over the materialized MinHash pairs
    "q_dup_source_matrix" -> ((s, d) => Dedup.crossSourceDupMatrix(s, d)),
    // batch twin of the stream-static ingest dedup (streaming semantics
    // pinned in DedupSpec); self-matches excluded — the operator's use
    // case is matching NEW docs against history
    "q_stream_neardup" -> ((s, d) =>
      Dedup.streamNearDupCandidates(
          s.read.parquet(s"$d/documents.parquet"), s, d)
        .filter(col("new_id") =!= col("hist_id"))),
  )

  val oracleSql: Map[String, String] = Map(
    "q_dedup_exact" ->
      ("SELECT md5(text) AS text_hash, count(*) AS n_copies, " +
        "min(doc_id) AS keep_id FROM documents GROUP BY md5(text)"),
    // C4-style span dedup re-derived end-to-end: 10-word windows, global
    // keep-first (min (doc_id, pos)), reassemble surviving spans in order.
    // Tokenization mirrors Dedup.spanDedup: \s+ split, empty-token filter.
    "q_span_dedup" ->
      ("WITH toks AS (SELECT doc_id, list_filter(" +
        "string_split_regex(text, '\\s+'), x -> len(x) > 0) AS w " +
        "FROM documents), " +
        "sp AS (SELECT doc_id, u.i AS pos, u.s AS span FROM (" +
        "SELECT doc_id, unnest(list_transform(" +
        "range(0, CAST(ceil(len(w) / 10.0) AS INT)), " +
        "i -> {'i': i, 's': array_to_string(" +
        "list_slice(w, i * 10 + 1, i * 10 + 10), ' ')})) AS u " +
        "FROM toks WHERE len(w) > 0)), " +
        "win AS (SELECT span, min(doc_id) AS kd FROM sp GROUP BY span), " +
        "win2 AS (SELECT sp.span, sp.doc_id, min(sp.pos) AS kp FROM sp " +
        "JOIN win ON sp.span = win.span AND sp.doc_id = win.kd " +
        "GROUP BY sp.span, sp.doc_id), " +
        "kept AS (SELECT sp.doc_id, sp.pos, sp.span FROM sp JOIN win2 " +
        "ON sp.span = win2.span AND sp.doc_id = win2.doc_id " +
        "AND sp.pos = win2.kp), " +
        "agg AS (SELECT doc_id, string_agg(span, ' ' ORDER BY pos) " +
        "AS text_clean, count(*) AS n_spans_kept FROM kept GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.text_clean, '') AS text_clean, " +
        "coalesce(a.n_spans_kept, 0) AS n_spans_kept " +
        "FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"),
    // cross-doc maximal repeated regions: stride-1 8-gram anchors, a
    // gram repeated in >=2 distinct docs flags its position, overlapping
    // or touching flagged windows (gap <= 8) merge into one region via
    // gaps-and-islands. The Spark side's xxhash64 pre-group is a pure
    // pruning optimization (exact string confirm follows), invisible here.
    "q_repeated_spans" -> (repeatedAnchorCtes + islandRegionSql),
    // span guard: history = doc_id % 5 != 0 (the indexed corpus),
    // incoming = doc_id % 5 = 0; an incoming position is flagged when
    // its 8-gram exists ANYWHERE in history, regions merge as above.
    // The Spark side's bucket-partitioned hash index + static partition
    // prune is invisible here (hash-bucket prune, exact string confirm).
    "q_span_guard" ->
      (anchorCtes +
        "hist AS (SELECT DISTINCT gram FROM anch WHERE doc_id % 5 != 0), " +
        "f AS (SELECT a.doc_id, a.p FROM anch a JOIN hist USING (gram) " +
        "WHERE a.doc_id % 5 = 0), " +
        islandRegionSql),
    // exact set-similarity join: the oracle IS the exhaustive all-pairs
    // shingle Jaccard (recall 1 is the contract — the prefix filter must
    // find every pair the exhaustive scan finds; same CTE + measure as
    // q_minhash_pairs, whose LSH recall on this corpus this proves).
    // Inverted-index formulation (value-identical, see jaccardPairsCte)
    // so the oracle itself survives the sf1+ off-gate budget.
    "q_setsim_pairs" ->
      (shingleCte + jaccardPairsCte +
        " SELECT doc_a, doc_b, jaccard FROM pairs"),
    // remove-everywhere excision of the same repeated regions: word
    // indexes covered by any flagged window drop; survivors reassemble
    // in order (same string_agg idiom as q_span_dedup)
    "q_repeated_span_excise" ->
      (repeatedAnchorCtes +
        "cov AS (SELECT DISTINCT doc_id, CAST(u AS INT) AS i FROM " +
        "(SELECT doc_id, unnest(range(p, p + 8)) AS u FROM f)), " +
        "wi AS (SELECT doc_id, CAST(ui AS INT) AS i, " +
        "w[CAST(ui AS INT) + 1] AS word FROM (SELECT doc_id, w, " +
        "unnest(range(0, len(w))) AS ui FROM toks)), " +
        "kept AS (SELECT wi.doc_id, wi.i, wi.word FROM wi " +
        "WHERE NOT EXISTS (SELECT 1 FROM cov WHERE cov.doc_id = wi.doc_id " +
        "AND cov.i = wi.i)), " +
        "agg AS (SELECT doc_id, string_agg(word, ' ' ORDER BY i) " +
        "AS text_clean, count(*) AS n_kept FROM kept GROUP BY doc_id) " +
        "SELECT t.doc_id, coalesce(a.text_clean, '') AS text_clean, " +
        "CAST(len(t.w) - coalesce(a.n_kept, 0) AS BIGINT) " +
        "AS n_dropped_words " +
        "FROM toks t LEFT JOIN agg a ON a.doc_id = t.doc_id"),
    // exact word-3-gram Jaccard, consecutive doc pairs: the same shingle +
    // intersect/union computation as Dedup.shingleArray/jaccardExpr,
    // written with DuckDB's list functions (shingleCte tokenizes with the
    // same \s+ split + empty-token filter as the Spark expression)
    "q_jaccard" ->
      (shingleCte +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) " +
        "AS jaccard FROM s a JOIN s b ON b.doc_id = a.doc_id + 1"),
    // character-5-gram twin of q_jaccard (substr is 1-based in both
    // engines; ASCII corpus → UTF-16 units == codepoints)
    "q_char_jaccard" ->
      ("WITH cs AS (SELECT doc_id, list_distinct(" +
        "CASE WHEN length(text) <= 5 THEN [text] " +
        "ELSE list_transform(range(1, length(text) - 3), i -> " +
        "substr(text, i, 5)) END) AS sh FROM documents) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) AS jaccard " +
        "FROM cs a JOIN cs b ON b.doc_id = a.doc_id + 1"),
    // MinHash-LSH near-dup pairs vs EXACT all-pairs Jaccard: on this corpus
    // every true pair has J >= 0.98 (nothing between 0.2 and 0.98), so at
    // threshold 0.5 the 16x4 banding's per-pair miss probability is
    // ~(1-0.98^4)^16 < 1e-22 — LSH provably finds the full exact answer,
    // and the exact all-pairs join IS the oracle (500 docs at the oracle SF
    // → 125k pairs, trivially in DuckDB's reach; at 100 TB only the LSH
    // side exists, which is the point of the operator).
    "q_minhash_pairs" ->
      (shingleCte + jaccardPairsCte +
        " SELECT doc_a, doc_b, jaccard FROM pairs"),
    // keep-filter twin: documents minus the higher-id side of each pair
    "q_minhash_keep" ->
      (shingleCte + jaccardPairsCte +
        ", drops AS (SELECT DISTINCT doc_b AS doc_id FROM pairs) " +
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars " +
        "FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)"),
    // transitive near-dup clusters vs a DuckDB RECURSIVE closure over the
    // same exact all-pairs Jaccard graph the pair oracle uses: walk is the
    // reachability set of each vertex, cluster_id = min reachable id (incl.
    // self), cluster_n a count window — the oracle literally computes the
    // definition the Spark operator implements iteratively
    "q_dedup_clusters" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        jaccardPairsCte + ", " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT doc_id, cluster_id, " +
        "count(*) OVER (PARTITION BY cluster_id) AS cluster_n FROM comp"),
    // contrastive pairs: positives = the exact-Jaccard pair set;
    // negatives = md5-shard rotation partners minus real pairs — every
    // hash is md5/row_number arithmetic both engines share
    "q_contrastive_pairs" ->
      (shingleCte + jaccardPairsCte + ", " +
        "d AS (SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR) || " +
        "'graft-neg-shard-v1'), 1, 1) AS shard FROM documents), " +
        "rk AS (SELECT doc_id, shard, row_number() OVER (" +
        "PARTITION BY shard ORDER BY md5(CAST(doc_id AS VARCHAR) || " +
        "'graft-neg-order-v1'), doc_id) AS r, " +
        "count(*) OVER (PARTITION BY shard) AS n FROM d), " +
        "neg AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM rk a JOIN rk b ON a.shard = b.shard " +
        "AND (a.r % a.n) + 1 = b.r AND a.doc_id <> b.doc_id " +
        "WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE " +
        "(p.doc_a = a.doc_id AND p.doc_b = b.doc_id) OR " +
        "(p.doc_a = b.doc_id AND p.doc_b = a.doc_id))) " +
        "SELECT doc_a, doc_b, 'pos' AS label, jaccard AS score " +
        "FROM pairs " +
        "UNION ALL SELECT doc_a, doc_b, 'neg', 0.0 FROM neg"),
    // incremental CC maintenance must equal the one-shot labeling over
    // ALL pairs — same oracle as q_dedup_clusters, which is the theorem
    "q_cc_incremental" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        jaccardPairsCte + ", " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT doc_id, cluster_id, " +
        "count(*) OVER (PARTITION BY cluster_id) AS cluster_n FROM comp"),
    // quality-weighted canonical: the kept member is the LONGEST of each
    // component (tie → min doc_id) — same recursive components, the
    // representative rule swapped for the rank-1-by-(n_chars desc, id)
    "q_cluster_keep_best" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        jaccardPairsCte + ", " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v), " +
        "m AS (SELECT c.doc_id, row_number() OVER " +
        "(PARTITION BY c.cluster_id " +
        "ORDER BY d2.n_chars DESC, c.doc_id ASC) AS rn " +
        "FROM comp c JOIN documents d2 ON d2.doc_id = c.doc_id) " +
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars " +
        "FROM documents d WHERE NOT EXISTS (SELECT 1 FROM m " +
        "WHERE m.doc_id = d.doc_id AND m.rn > 1)"),
    // soft dedup: every doc, weight 1/cluster_n (singletons weight 1)
    "q_soft_dedup" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        jaccardPairsCte + ", " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v), " +
        "sz AS (SELECT cluster_id, count(*) AS cluster_n FROM comp " +
        "GROUP BY cluster_id) " +
        "SELECT d.doc_id, d.lang, d.source, " +
        "COALESCE(c.cluster_id, d.doc_id) AS cluster_id, " +
        "CAST(COALESCE(sz.cluster_n, 1) AS BIGINT) AS cluster_n, " +
        "round(CAST(1.0 AS DOUBLE) / " +
        "CAST(COALESCE(sz.cluster_n, 1) AS DOUBLE), 6) AS sample_weight " +
        "FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id " +
        "LEFT JOIN sz ON sz.cluster_id = c.cluster_id"),
    // transitive keep-filter: documents minus non-canonical cluster members
    "q_cluster_keep" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        jaccardPairsCte + ", " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars " +
        "FROM documents d WHERE NOT EXISTS (SELECT 1 FROM comp c " +
        "WHERE c.doc_id = d.doc_id AND c.cluster_id <> d.doc_id)"),
    // Levenshtein near-dup pairs (|len diff| <= 8 AND dist <= 16). The
    // oracle carries the SAME exact bag-bound prune the Spark side uses
    // (round-13, r12 verdict task #4): one edit moves the letter
    // histogram by at most 2 L1 units (substitution: −1 one char, +1
    // another; insert/delete: 1), so ed(a,b) <= 16 implies the a-z+space
    // histogram L1 distance <= 32 — pruning L1 > 32 before levenshtein
    // is contract-invisible (chars outside the counted alphabet only
    // weaken the prune, never break it). This turns the oracle's cost
    // from 41.6M banded levenshteins (>120 s at sf1, the r12 off-gate
    // exclusion) into 41.6M cheap integer filters + ~1.3M levenshteins
    // (13 s measured at sf1), identical output.
    "q_edit_distance" -> {
      val letters = ('a' to 'z').map(_.toString) :+ " "
      val counts = letters.zipWithIndex.map { case (c, i) =>
        s"length(text) - length(replace(text, '$c', '')) AS c$i"
      }.mkString(", ")
      val l1 = letters.indices.map(i => s"abs(a.c$i - b.c$i)")
        .mkString(" + ")
      s"WITH h AS (SELECT doc_id, text, n_chars, $counts FROM documents) " +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist " +
        "FROM h a JOIN h b " +
        "ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 8 " +
        s"WHERE ($l1) <= 32 AND levenshtein(a.text, b.text) <= 16"
    },
    // the guard estimate re-derived independently: histogram over the
    // same floor(n_chars/8) buckets, 3-bucket-window self-join — must
    // equal Spark's Σ_b cnt(b)·(cnt(b−1)+cnt(b)+cnt(b+1)) exactly
    "q_edit_estimate" ->
      ("WITH h AS (SELECT CAST(floor(n_chars / 8) AS BIGINT) AS bkt, " +
        "COUNT(*) AS cnt FROM documents GROUP BY 1) " +
        "SELECT CAST(sum(a.cnt * b.cnt) AS BIGINT) AS candidates " +
        "FROM h a JOIN h b ON b.bkt BETWEEN a.bkt - 1 AND a.bkt + 1"),
    // cross-source dup matrix over the same exact all-pairs Jaccard graph
    // the q_minhash_pairs oracle uses
    "q_dup_source_matrix" ->
      (shingleCte + jaccardPairsCte + " " +
        "SELECT least(da.source, db.source) AS source_a, " +
        "greatest(da.source, db.source) AS source_b, " +
        "count(*) AS n_pairs, round(avg(p.jaccard), 4) AS avg_jaccard " +
        "FROM pairs p JOIN documents da ON da.doc_id = p.doc_a " +
        "JOIN documents db ON db.doc_id = p.doc_b GROUP BY 1, 2"),
    // q_simhash_pairs: the murmur3-based simhash itself is not expressible
    // in DuckDB; the entry is pinned by a golden VALUES oracle (the output
    // is a deterministic function of the fixed corpus — 4-band pigeonhole
    // makes the Hamming<=3 pair set EXACT given the simhash values, whose
    // semantics DedupSpec + SimHashExpressionSpec pin independently).
    "q_simhash_pairs" -> simhashGolden,
    // q_stream_neardup: the murmur3 MinHash signature estimate is not
    // expressible in DuckDB; golden VALUES (deterministic function of the
    // fixed corpus + fixed hash family). Consistency anchor: exactly the
    // 25 q_minhash_pairs pairs, symmetric (50 rows), estimates within
    // MinHash error of the exact Jaccards the pair oracle computes live.
    "q_stream_neardup" -> streamNearDupGolden,
  )
}
