package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.Sudan
import graft.operators.{AsOf, BloomFilterJoin, Dedup, Ivf, Multimodal,
  RangeJoin, Relational, Similarity, TextOps}
import graft.functions.GeoCode
import graft.geo.SudanGeo

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's demonstrated capability surface: one entry per
  * operator from SURVEY.md §2B (host relational ops), the embedded geo
  * sources + GeoCode scalar (§2A S8/S10/S11/F1), and the LLM-data-pipeline
  * operator families (dedup / similarity / text analysis / multimodal).
  * Every SQL-expressible entry has a DuckDB oracle in `oracleSql` with
  * IDENTICAL column names and engine-independent values (exact decimal
  * sums, per-row-deterministic doubles, or rounded outputs).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The end-to-end corpus clean (exact dedup ∘ MinHash near-dedup ∘
    * quality filter ∘ token accounting) — the composition this engine
    * exists for; oracle-checked as `q_clean_corpus`. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Pipeline.cleanCorpus(spark, "/root/testdata/sf0.001")

  /** q_mixture_plan targets: pre-normalized (4×0.15 + 16×0.025 = 1.0) so
    * the oracle's share literals match the Scala map values exactly. */
  private val mixtureTargets: Map[String, Double] =
    (0 to 3).map(i => s"src$i" -> 0.15).toMap ++
      (4 to 19).map(i => s"src$i" -> 0.025).toMap

  // ------------------------------------------------------------ geo helpers

  private def statesGolden(s: SparkSession, dir: String): DataFrame =
    SudanGeo.states(s).select(
      col("iso_code"), col("state_name"), col("state_name_ar"),
      col("centroid_lon"), col("centroid_lat"),
      length(col("geojson")).cast("long").as("n_geojson_chars"),
      substring(col("geojson"), 1, 22).as("geo_prefix"))

  private def boundaryCountry(s: SparkSession, dir: String): DataFrame =
    SudanGeo.boundariesDf(s, "country").select(
      col("country_name"), col("country_name_ar"), col("iso_code"),
      length(col("geojson")).cast("long").as("n_chars"),
      substring(col("geojson"), 1, 22).as("geo_prefix"))

  private def geocodeGolden(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val geocode = udf((n: String) => GeoCode.lookup(n))
    Seq("Khartoum", "الخرطوم", "khartoum", "KHARTOUM", "Red Sea", "red sea",
      "Al Jazirah", "Unknown Place", "")
      .toDF("name")
      .select(col("name"), geocode(col("name")).as("iso_code"))
  }

  // -------------------------------------------------------------- registry

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2B host-operator workload
    "q_projection" -> (Relational.projection _),
    "q_filter_between" -> (Relational.filterBetween _),
    "q_filter_like_in" -> (Relational.filterLikeIn _),
    "q_join_inner" -> (Relational.joinInner _),
    "q_join_left" -> (Relational.joinLeft _),
    "q_join_right" -> (Relational.joinRight _),
    "q_join_full" -> (Relational.joinFull _),
    "q_join_2key" -> (Relational.join2Key _),
    "q_agg_q1" -> (Relational.aggQ1 _),
    // multi-join analytics battery (3/6/4-table TPC-H-shaped plans:
    // broadcast dims, pushed date/flag filters, TakeOrdered top-k)
    "q_tpch_q3" -> (Relational.tpchQ3 _),
    "q_tpch_q5" -> (Relational.tpchQ5 _),
    "q_tpch_q10" -> (Relational.tpchQ10 _),
    "q_agg_having" -> (Relational.aggHaving _),
    "q_agg_distinct" -> (Relational.aggDistinct _),
    "q_sort_limit" -> (Relational.sortLimit _),
    "q_union" -> (Relational.unionDistinct _),
    "q_union_all" -> (Relational.unionAll _),
    "q_except_intersect" -> (Relational.exceptIntersect _),
    "q_conditional" -> (Relational.conditional _),
    "q_string_fns" -> (Relational.stringFns _),
    "q_datetime_agg" -> (Relational.datetimeAgg _),
    "q_json_extract" -> (Relational.jsonExtract _),
    "q_event_props" -> (Relational.eventProps _),
    "q_retention" -> ((s, d) => Relational.retentionCohorts(s, d)),
    "q_transitions" -> (Relational.eventTransitions _),
    "q_user_rfm" -> (Relational.userRfm _),
    // per-user z-score anomaly flags (personal baselines; exact
    // decimal sums feed the one division/sqrt — engine-identical)
    "q_user_anomalies" -> ((s, d) => Relational.userAnomalies(s, d)),
    "q_funnel" -> (Relational.funnel _),
    "q_window_topn" -> (Relational.windowTopN _),
    "q_window_offsets" -> (Relational.windowOffsets _),
    "q_rollup" -> (Relational.rollupAgg _),
    "q_cube" -> (Relational.cubeAgg _),
    "q_sql_cte" -> (Relational.sqlCte _),
    "q_sql_exists" -> (Relational.sqlExists _),
    "q_sql_grouping_sets" -> (Relational.sqlGroupingSets _),
    "q_sql_lateral" -> (Relational.sqlLateral _),
    "q_sql_rolling_window" -> (Relational.sqlRollingWindow _),
    "q_approx_distinct" -> (Relational.approxDistinct _),
    "q_approx_quantile" -> (Relational.approxQuantileContract _),
    "q_pivot" -> (Relational.pivotEvents _),
    "q_unpivot" -> (Relational.unpivotPart _),
    "q_collect_agg" -> (Relational.collectAgg _),
    "q_percentiles" -> (Relational.percentiles _),
    "q_semi_anti" -> (Relational.semiAnti _),
    // per-column table profile (DuckDB SUMMARIZE parity), schema-derived
    "q_summarize" -> (Relational.summarizeOrders _),
    // embedded geo sources + scalar (§2A S8/S10/S11/F1)
    "q_states" -> (statesGolden _),
    "q_providers" -> ((s, _) => SudanGeo.providers(s)),
    "q_boundary_country" -> (boundaryCountry _),
    "q_geocode" -> (geocodeGolden _),
    // LLM-pipeline: the flagship end-to-end cleaning composition
    "q_clean_corpus" -> ((s, d) =>
      graft.operators.Pipeline.cleanCorpus(s, d, materialized = true)),
    "q_train_val_split" -> ((s, d) => graft.operators.Pipeline.trainValSplit(s, d)),
    // leakage-free variant: the split hash keys on the near-dup CLUSTER
    // (build-once CC labels), so no val/test doc has a near-dup in train
    "q_leakfree_split" -> ((s, d) =>
      graft.operators.Pipeline.leakFreeSplit(s, d, materialized = true)),
    // DSIR importance weights: target-vs-raw hashed-n-gram LLR, both
    // models 4096 md5-prefix cells (broadcast-sized by construction)
    "q_dsir_weights" -> ((s, d) => graft.operators.Pipeline.dsirWeights(s, d)),
    // temperature-mixing token-budget planner with epoch cap
    "q_token_budget" -> ((s, d) => graft.operators.Pipeline.tokenBudget(s, d)),
    // rebalance the language mix: halve en, quarter de, keep the tail
    "q_stratified_sample" -> ((s, d) => graft.operators.Pipeline
      .stratifiedSample(s, d, Map("en" -> 0.5, "de" -> 0.25))),
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
    "q_bloom_join" -> ((s, d) => BloomFilterJoin.urgentOrderRevenue(s, d)),
    "q_source_cap" -> ((s, d) =>
      graft.operators.Pipeline.sourceCap(s, d, cap = 20)),
    "q_resample_sources" -> ((s, d) => graft.operators.Pipeline
      .resampleSources(s, d, Map("src0" -> 2.5, "src1" -> 0.25))),
    // mixture planner: curated sources (src0-3) target 15% each of a
    // 30k-token budget with a 2-epoch cap (they get capped), bulk
    // sources share the rest (they undershoot one epoch)
    "q_mixture_plan" -> ((s, d) => graft.operators.Pipeline.mixturePlan(
      s, d, mixtureTargets, budgetTokens = 30000L, maxEpochs = 2.0)),
    // the multi-epoch schedule that plan feeds: temperature annealed
    // 2.0 → 1.0 over 3 epochs (flat early, true mix late)
    "q_mixture_schedule" -> ((s, d) =>
      graft.operators.Pipeline.mixtureSchedule(
        s, d, mixtureTargets, budgetPerEpoch = 30000L)),
    "q_dataset_card" -> ((s, d) =>
      graft.operators.Pipeline.datasetCard(s, d)),
    // snapshot diff: the "new" snapshot is a deterministic derivation of
    // the corpus (drop doc_id%7==0, rewrite text for %11==0, add shifted
    // ids), so both engines rebuild the identical pair of snapshots
    // CDC MERGE: apply a deterministic I/U/D change batch to the
    // snapshot in one broadcast anti-join + union (Delta MERGE shape)
    "q_cdc_merge" -> ((s, d) =>
      graft.operators.Pipeline.cdcMergeDemo(s, d)),
    "q_corpus_diff" -> ((s, d) => {
      val docs = graft.operators.Tables.documents(s, d)
        .select("doc_id", "text")
      val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
            .otherwise(col("text")).as("text"))
        .unionByName(
          docs.filter(col("doc_id") % 13 === 0)
            .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.operators.Pipeline.corpusDiff(docs, newSnap)
    }),
    // SCD2 history of the same two-snapshot evolution: one narrow
    // full-outer join fans into closed/open version-interval rows
    "q_scd2" -> ((s, d) => graft.operators.Pipeline.scd2Demo(s, d)),
    // fixed-size token windows across doc boundaries (the pretraining
    // concat-and-cut manifest; per-shard cumulative sums, no global)
    "q_token_windows" -> ((s, d) =>
      graft.operators.Pipeline.tokenWindows(s, d)),
    // data-quality expectations gate: named checks with observed
    // values and pass/fail, one corpus pass (stack-unpivoted agg)
    "q_expectations" -> ((s, d) =>
      graft.operators.Pipeline.expectations(s, d)),
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
    // corpus-composition diagnostic over the materialized MinHash pairs
    "q_dup_source_matrix" -> ((s, d) => Dedup.crossSourceDupMatrix(s, d)),
    // batch twin of the stream-static ingest dedup (streaming semantics
    // pinned in DedupSpec); self-matches excluded — the operator's use
    // case is matching NEW docs against history
    "q_stream_neardup" -> ((s, d) =>
      Dedup.streamNearDupCandidates(
          s.read.parquet(s"$d/documents.parquet"), s, d)
        .filter(col("new_id") =!= col("hist_id"))),
    // LLM-pipeline: text analysis family
    "q_text_stats" -> (TextOps.textStats _),
    "q_token_count" -> (TextOps.tokenCount _),
    "q_lang_profile" -> (TextOps.langProfile _),
    "q_quality_score" -> (TextOps.qualityScore _),
    "q_stopword_quality" -> (TextOps.stopwordQuality _),
    "q_charclass_quality" -> (TextOps.charClassQuality _),
    "q_repetition" -> (TextOps.repetition _),
    "q_gopher_repetition" -> (TextOps.gopherRepetition _),
    "q_bigram_vocab" -> ((s, d) => TextOps.bigramVocab(s, d)),
    "q_bpe_merges" -> ((s, d) => TextOps.learnBpeMerges(s, d)),
    "q_bpe_tokens" -> ((s, d) => TextOps.bpeTokenize(s, d)),
    "q_pii_redact" -> (TextOps.piiRedact _),
    "q_length_histogram" -> ((s, d) => TextOps.lengthHistogram(s, d)),
    "q_length_trim" -> ((s, d) => graft.operators.Pipeline.lengthTrim(s, d)),
    "q_length_trim_lang" -> ((s, d) =>
      graft.operators.Pipeline.lengthTrimByLang(s, d)),
    "q_clean_audit" -> ((s, d) =>
      graft.operators.Pipeline.cleanCorpusAudit(s, d, materialized = true)),
    "q_unigram_logprob" -> (TextOps.unigramLogProb _),
    // CCNet-style head/middle/tail split by fixed LM-score cutoffs (a
    // narrow map after scoring — no global-rank sort; see scaladoc)
    "q_perplexity_buckets" -> ((s, d) => TextOps.perplexityBuckets(s, d)),
    // tokens-per-word by language — the tokenizer-equity metric
    "q_token_fertility" -> (TextOps.tokenFertility _),
    // stupid-backoff bigram LM scored against the hash-complement train
    // split — held-out docs exercise the backoff path for real
    "q_bigram_logprob" -> ((s, d) => TextOps.bigramLogProb(s, d)),
    // trigram novelty: fraction of a doc's distinct trigrams with df=1
    "q_novelty" -> ((s, d) => TextOps.ngramNovelty(s, d)),
    // pairwise source JS divergence over the smoothed top-200 vocab
    "q_source_divergence" -> ((s, d) => TextOps.sourceDivergence(s, d)),
    // expression form: corpus side is one codegen'd map (no gram
    // explode/join/agg); spec-pinned identical to the join form
    "q_decontaminate" -> ((s, d) => TextOps.decontaminateFast(s, d)),
    // the over-closure-budget path: bloom pre-filter + exact confirm
    "q_decontaminate_bloom" -> ((s, d) => TextOps.decontaminateBloom(s, d)),
    "q_source_report" -> ((s, d) => graft.operators.Pipeline.sourceReport(s, d)),
    "q_chunk_docs" -> ((s, d) => graft.operators.Pipeline.chunkDocuments(s, d)),
    "q_pack_sequences" -> ((s, d) => graft.operators.Pipeline.packSequences(s, d)),
    // weighted sampling without replacement (A-ES, deterministic draw)
    "q_weighted_sample" -> ((s, d) =>
      graft.operators.Pipeline.weightedSample(s, d)),
    // deterministic training-order shuffle (shard + in-shard position)
    "q_corpus_shuffle" -> ((s, d) =>
      graft.operators.Pipeline.corpusShuffle(s, d)),
    // inverted-index postings (hot-term pruned, rank-capped)
    // maxDf sized to the synthetic corpus's tiny dense vocabulary (the
    // default 50 would prune nearly every word at sf0.01)
    "q_inverted_index" -> ((s, d) =>
      TextOps.invertedIndex(s, d, maxDf = 5000)),
    // Morton-curve key for 2-D data skipping (bit-exact oracle)
    "q_zorder" -> ((s, d) => graft.operators.Zorder.docZValues(s, d)),
    // model-based quality filter: Newton-IRLS logistic distillation;
    // the oracle re-scores with the sf0.01-trained weights pinned as
    // literals (exact-decimal sums make training deterministic)
    "q_quality_classifier" -> ((s, d) =>
      graft.operators.QualityModel.qualityClassifier(s, d)),
    // event_id is the unique row id: salting by it spreads even
    // fully-duplicate rows of a hot key uniformly (see Skew scaladoc)
    "q_salted_agg" -> ((s, d) =>
      graft.operators.Skew.saltedCountSum(Relational.events(s, d),
        "event_type", "value", idCol = Some("event_id"))),
    // salted fact⋈dim join, rolled up — hash-matches the PLAIN join SQL
    // (the equivalence IS the contract, like q_salted_agg). Dim side =
    // customer (the SMALL side — its ×salts replication is the price of
    // the hot-key spread; replicating a large dim would be the anti-
    // pattern the operator's scaladoc warns about)
    "q_salted_join" -> ((s, d) => {
      val ord = s.read.parquet(s"$d/orders.parquet")
      val cust = s.read.parquet(s"$d/customer.parquet")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      // o_orderkey is the fact side's primary key — the idCol contract
      graft.operators.Skew.saltedJoin(ord, cust, "o_custkey",
          idCol = Some("o_orderkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_rows"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            .as("revenue"))
    }),
    "q_kmv_distinct" -> ((s, d) => Relational.events(s, d)
      .groupBy("event_type")
      .agg(graft.functions.KmvSketch.approxDistinct(
        col("user_id").cast("string")).as("approx_users"))),
    // sketch-TABLE algebra: per-source stored KMV states, global and
    // pairwise-overlap estimates derived from the states alone
    "q_sketch_sources" -> ((s, d) =>
      graft.operators.SketchOps.sourceDistinctTexts(s, d)),
    // cross-snapshot sketch persistence: two STORED snapshot sketch
    // tables merge into combined-corpus estimates without rescanning
    // snapshot 1 (incremental maintenance, exact below k)
    "q_sketch_snapshot_merge" -> ((s, d) =>
      graft.operators.SketchOps.snapshotSketchMerge(s, d)),
    // mergeable bottom-k quantile sketch table: per-source length
    // percentiles + a row-level-merged __ALL__ row (exact below k,
    // discrete-quantile rule shared with the oracle)
    "q_quantile_sources" -> ((s, d) =>
      graft.operators.SketchOps.sourceLengthQuantiles(s, d)),
    // sketch CUBE: every (source, lang) rollup level from ONE pass of
    // leaf states — upper levels are row-level merges, never rescans
    "q_sketch_rollup" -> ((s, d) =>
      graft.operators.SketchOps.sourceLangDistinctRollup(s, d)),
    // pre-flight join sizing from key sketches: two map-side passes
    // instead of running the join (exact below k)
    "q_join_estimate" -> ((s, d) =>
      graft.operators.SketchOps.ordersCustomerJoinEstimate(s, d)),
    // range-predicate selectivity from the same stored quantile states
    // that serve percentiles (exact below k)
    "q_range_estimate" -> ((s, d) =>
      graft.operators.SketchOps.sourceLengthSelectivity(s, d)),
    // mergeable priority-sample table (DLT subset-sum states):
    // per-source total chars + a row-level-merged __ALL__ row
    // (exact below n — τ = 0 ⇒ the estimate is the true sum)
    "q_priority_totals" -> ((s, d) =>
      graft.operators.SketchOps.sourceCharTotals(s, d)),
    // admission against a bloom'd blocklist: per-source bloom states
    // OR-merged into one codegen'd map-side probe; bloom-positives
    // alone pay the exact confirm join, so the output is EXACT
    "q_bloom_guard" -> ((s, d) =>
      graft.operators.SketchOps.bloomBlocklistAdmit(s, d)),
    // hourly LOCF gap-fill resample of each user's event stream
    "q_resample_locf" -> ((s, d) => Relational.resampleLocf(s, d)),
    "q_sketch_overlap" -> ((s, d) =>
      graft.operators.SketchOps.eventTypeUserOverlap(s, d)),
    "q_heavy_hitters" -> ((s, d) =>
      s.read.parquet(s"$d/documents.parquet")
        .agg(graft.functions.HeavyHitters.topItems(col("source"), 64).as("hh"))
        .select(explode(arrays_zip(col("hh.items"), col("hh.counts"))).as("x"))
        .select(col("x.items").as("source"), col("x.counts").as("n_docs"))),
    "q_lang_id" -> (TextOps.langId _),
    // langID vs declared-label confusion matrix (label-quality audit)
    "q_langid_confusion" -> ((s, d) => TextOps.langIdConfusion(s, d)),
    "q_fingerprints" -> (TextOps.fingerprints _),
    "q_tfidf" -> (TextOps.tfIdf _),
    "q_char_entropy" -> (TextOps.charEntropy _),
    "q_bm25" -> ((s, d) => TextOps.bm25(s, d)),
    // hybrid-retrieval fusion: BM25 ∪ TF-IDF shortlists, 1/(60+rank) sum
    "q_rrf_fusion" -> ((s, d) => TextOps.rrfFusion(s, d)),
    "q_top_terms" -> ((s, d) => TextOps.topTerms(s, d)),
    // fingerprints scanned from the build-once table, not re-winnowed
    // per self-join side (plan is winnow-free, spec-guarded)
    "q_containment" -> ((s, d) =>
      TextOps.containmentPairs(s, d, materialized = true)),
    // LLM-pipeline: similarity family
    "q_embed_norms" -> (Similarity.norms _),
    "q_quantize_embed" -> (Similarity.quantizeEmbeddings _),
    "q_ann_cosine" -> ((s, d) => Similarity.bruteForceTopK(s, d, queryId = 0L)),
    // recall@k vs the brute-force baseline: deterministic constant (fixed
    // hyperplanes/centroids/corpus) → VALUES-oracle hash compare; the
    // LSH/IVF top-k pipelines run in full as subplans
    "q_ann_lsh" -> ((s, d) => Similarity.annRecall(s, d, "lsh")),
    "q_ann_ivf" -> ((s, d) => Similarity.annRecall(s, d, "ivf")),
    "q_ann_pq" -> ((s, d) => graft.operators.Pq.annRecall(s, d)),
    "q_ann_ivfpq" -> ((s, d) =>
      graft.operators.Pq.annRecall(s, d, method = "ivfpq")),
    // incremental serving: index built on the even-id half, odd-id half
    // APPENDED under the frozen model, probed over base+appended
    "q_ann_ivfpq_append" -> ((s, d) =>
      graft.operators.Pq.annRecallAppend(s, d)),
    // rebuild-trigger monitor over the same grown index: cell histogram
    // summary (deterministic build ⇒ pinned-constant oracle)
    "q_ann_index_health" -> ((s, d) =>
      graft.operators.Pq.annIndexHealth(s, d)),
    // the serving loop the monitor exists for, executed end to end:
    // drifted appends trip the imbalance alarm → fresh-path rebuild →
    // alarm clears, drifted-region recall recovers (deterministic ⇒
    // pinned-constant oracle)
    "q_ann_rebuild" -> ((s, d) =>
      graft.operators.Pq.annRebuildRecovery(s, d)),
    // embedding complement of q_decontaminate: paraphrase-level benchmark
    // leakage via cosine vs the literal eval set (no join, narrow map)
    "q_semantic_decontaminate" -> ((s, d) =>
      Similarity.semanticDecontaminate(s, d)),
    // third leakage modality: winnowed containment of each eval doc in
    // corpus docs (partial quotation/trimmed copies; broadcast eval side)
    "q_eval_containment" -> ((s, d) =>
      TextOps.evalContainment(s, d, materialized = true)),
    // Matryoshka two-stage: 16-dim prefix shortlist → full-vector rerank
    "q_ann_matryoshka" -> ((s, d) =>
      Similarity.matryoshkaTopK(s, d, queryId = 0L)),
    "q_knn_join" -> ((s, d) => Similarity.knnJoin(s, d)),
    // threshold tuned to the synthetic data's cosine range (max ~0.37)
    "q_embed_neardup" -> ((s, d) => Similarity.nearDupPairs(s, d, minCosine = 0.3)),
    // SemDeDup-style semantic clustering + keep over the same pair graph
    // (labels scanned from the build-once assignment table)
    "q_embed_clusters" -> ((s, d) =>
      Similarity.embedClusters(s, d, materialized = true)),
    "q_embed_cluster_keep" -> ((s, d) =>
      Similarity.embedClusterKeep(s, d, materialized = true)),
    "q_label_centroids" -> (Similarity.labelCentroidCosine _),
    // per-label centroid-distance outlier audit (mislabel detector)
    "q_embed_outliers" -> ((s, d) => Similarity.embedOutliers(s, d)),
    // neighborhood majority-vote label audit over the LSH-bucketed k-NN
    "q_knn_classify" -> ((s, d) => Similarity.knnClassify(s, d)),
    // per-dimension feature-health stats (dead/dominant dim audit)
    "q_dim_stats" -> (Similarity.dimStats _),
    // z-score standardization vs corpus dim stats, per-vector summaries
    "q_embed_standardize" -> (Similarity.standardizeEmbeddings _),
    // margin-criterion cross-label mining over the LSH candidate stream
    "q_margin_mine" -> ((s, d) => Similarity.marginMine(s, d)),
    // cluster-balanced diversity sampling (dense buckets capped at
    // ~target kept vectors via the deterministic md5 gate)
    "q_diversity_sample" -> ((s, d) => Similarity.diversitySample(s, d)),
    // dedup-graph QA: degree-oriented triangle counts and fixed-iteration
    // PageRank over the undirected k-NN similarity graph
    // all three graph entries scan the build-once k-NN edge table
    // (the pair pipeline runs once per corpus, not once per query)
    "q_graph_triangles" -> ((s, d) =>
      graft.operators.GraphOps.knnTriangles(s, d, materialized = true)),
    // oracle-compare rounding (4 dp) passed HERE, not defaulted in the
    // operator: rank resolution on big graphs is the API's business,
    // engine-boundary stability is the oracle's
    "q_graph_pagerank" -> ((s, d) =>
      graft.operators.GraphOps.knnPageRank(s, d, roundTo = 4,
        materialized = true)),
    // seeded affinity: personalized PageRank teleporting to label-0
    // vectors — rank-by-connectivity-to-the-trusted-cohort
    "q_graph_ppr" -> ((s, d) =>
      graft.operators.GraphOps.knnSeededRank(s, d, roundTo = 4,
        materialized = true)),
    // LLM-pipeline: multimodal family
    "q_multimodal_meta" -> (Multimodal.assetMeta _),
    "q_frame_sample" -> ((s, d) => Multimodal.frameSample(s, d)
      .select(col("asset_id"), col("frame_no"), col("frame_len"))),
    // REAL image codec path (JDK ImageIO): the oracle recomputes every
    // value from the synthetic pixel rule WITHOUT a codec, so the hash
    // compare proves the PNG encode→decode round trips are exact
    "q_image_meta" -> (Multimodal.imageMeta _),
    "q_image_resize" -> ((s, d) => Multimodal.imageResize(s, d)),
    "q_image_dhash" -> (Multimodal.imageDHash _),
    "q_image_neardup" -> ((s, d) =>
      Multimodal.imageNearDupPairs(s, d, materialized = true)),
    // REAL audio codec path (JDK javax.sound.sampled WAV): same
    // codec-free-oracle contract as the image family
    "q_audio_meta" -> (Multimodal.audioMeta _),
    // video: GFV1 container demux + REAL per-frame PNG decode
    "q_video_frames" -> (Multimodal.videoFrameStats _),
    // networked DSv2 sources (§2A S1-S9), driven by recorded fixtures —
    // the full read path (options → URL → fetch → decode) runs for real;
    // only the HTTP transport is recorded, as in the reference's own
    // offline testing strategy (FIXTURES.md §1)
    "q_src_worldbank" -> ((s, _) =>
      Sudan.worldBank(s, "SP.POP.TOTL", fetcher = fixtures("worldbank"))),
    "q_src_wb_catalog" -> ((s, _) =>
      Sudan.wbIndicators(s, fetcher = fixtures("worldbank"))),
    "q_src_wb_pushdown" -> ((s, _) =>
      Sudan.worldBank(s, "SP.POP.TOTL", fetcher = fixtures("worldbank"))
        .filter(col("year") >= 2019)),
    "q_src_who" -> ((s, _) =>
      Sudan.who(s, "WHOSIS_000001", fetcher = fixtures("who"))),
    "q_src_who_catalog" -> ((s, _) =>
      Sudan.whoIndicators(s, fetcher = fixtures("who"))),
    "q_src_fao" -> ((s, _) =>
      Sudan.fao(s, "QCL", "production", fetcher = fixtures("fao"))),
    "q_src_unhcr" -> ((s, _) =>
      Sudan.unhcr(s, "refugees", fetcher = fixtures("unhcr"))),
    "q_src_ilo" -> ((s, _) =>
      Sudan.ilo(s, "UNE_DEAP_SEX_AGE_RT", fetcher = fixtures("ilo"))),
    "q_src_ilo_legacy" -> ((s, _) =>
      Sudan.ilo(s, "EMP_TEMP_SEX_ECO_NB", fetcher = fixtures("ilo10"))),
    "q_src_search" -> ((s, _) =>
      Sudan.search(s, "mortality", fetcher = fixtures("search"))),
    // the SQL TVF surface (docs/functions.md spelling, `:=`→`=>`): same
    // DSv2 scans underneath, bound at analysis time by the injected
    // table-function builders — registered here at runtime so the stock
    // Verify/Bench session needs no extensions config. The fetcher conf
    // is read INSIDE s.sql's analysis, then baked into the relation's
    // options — sqlWithFixtures restores the previous conf immediately
    // after analysis, so nothing leaks into later queries on the session.
    "q_sql_tvf_worldbank" -> ((s, _) =>
      sqlWithFixtures(s, "worldbank",
        "SELECT * FROM SUDAN_WorldBank('SP.POP.TOTL', " +
          "countries => array('SDN')) WHERE year >= 2019")),
    "q_sql_tvf_search" -> ((s, _) =>
      sqlWithFixtures(s, "search",
        "SELECT * FROM SUDAN_Search(query => 'mortality')")),
    "q_sql_tvf_states" -> ((s, _) => {
      graft.api.SudanTableFunctions.registerRuntime(s)
      s.sql("SELECT iso_code, state_name, state_name_ar, centroid_lon, " +
        "centroid_lat, CAST(length(geojson) AS BIGINT) AS n_geojson_chars, " +
        "substring(geojson, 1, 22) AS geo_prefix FROM SUDAN_States()")
    }),
    // temporal joins (beyond the reference): as-of enrichment and a
    // no-equality-key proximity range join, both scale-safe rewrites
    "q_asof_join" -> (AsOf.eventsAsOfLastPurchase _),
    "q_range_join" -> ((s, d) => RangeJoin.errorClickProximity(s, d)),
    // batch twin of the stream-stream interval join (same operator code;
    // the streaming semantics are pinned in EventStreamSpec)
    "q_attribution" -> ((s, d) => {
      val ev = Relational.events(s, d)
      graft.streaming.EventStream.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "purchase"))
    }),
    // batch twin of the content-key ingest dedup (first occurrence per
    // key in event-time order; streaming form pinned in EventStreamSpec)
    "q_ingest_dedup" -> ((s, d) =>
      graft.streaming.EventStream.ingestDedupBatch(Relational.events(s, d))),
    // streaming sketch ingest (batch twin): per-micro-batch KMV rows
    // through the idempotent sink, lifetime per-type distinct users
    // merged from the STORED rows only (exact below k)
    "q_stream_sketch" -> ((s, d) =>
      graft.streaming.EventStream.sketchIngestBatchDemo(s,
        Relational.events(s, d), d)),
    // streaming twin: per-window event-type KL drift vs the global mix
    // (batch form; the fixed-reference streaming form is spec-pinned
    // equivalent in EventStreamSpec)
    "q_type_drift" -> ((s, d) =>
      graft.streaming.EventStream.typeDriftBatch(Relational.events(s, d))),
    // batch twin of the watermarked tumbling-window stats (exact distinct
    // in place of the sketch; window arithmetic + sums oracle-pinned)
    "q_windowed_stats" -> ((s, d) =>
      graft.streaming.EventStream.windowedStatsBatch(Relational.events(s, d))),
    // streaming twin: gap-based sessionization (batch form; the streaming
    // form is pinned by EventStreamSpec against the same definition)
    "q_sessionize" -> ((s, d) =>
      graft.streaming.EventStream
        .sessionizeBatch(Relational.events(s, d))
        .select(col("user_id"),
          date_format(col("session_start"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_start"),
          date_format(col("session_end"), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            .as("session_end"),
          col("n_events"), col("total_value")))
  )

  private def fixtures(dir: String): Sudan.Fetcher =
    Sudan.Fetcher("fixtures", s"graft/fixtures/$dir")

  /** Run a TVF query with the fixture transport conf set ONLY for the
    * duration of the `spark.sql` analysis (the fetcher conf is baked into
    * the relation options at analysis time), restoring the previous
    * values after — the session's transport selection must not leak into
    * later queries. */
  private def sqlWithFixtures(s: SparkSession, dir: String,
      sql: String): DataFrame = {
    import graft.api.SudanTableFunctions.{FixturesKey, ModeKey}
    graft.api.SudanTableFunctions.registerRuntime(s)
    val oldMode = s.conf.getOption(ModeKey)
    val oldFix = s.conf.getOption(FixturesKey)
    s.conf.set(ModeKey, "fixtures")
    s.conf.set(FixturesKey, s"graft/fixtures/$dir")
    try s.sql(sql)
    finally {
      oldMode.fold(s.conf.unset(ModeKey))(s.conf.set(ModeKey, _))
      oldFix.fold(s.conf.unset(FixturesKey))(s.conf.set(FixturesKey, _))
    }
  }

  // ------------------------------------------------------------ oracle SQL

  // the corpus-wide word count: \s+ tokens with empties dropped — the
  // oracle twin of TextOps.nWords (same list_filter idiom as q_repetition)
  private val wordsExpr =
    "CAST(len(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0)) AS BIGINT)"

  // shared CTE prefixes for the repeated-substring oracles: stride-1
  // 8-word anchors over every doc (anchorCtes), the >=2-distinct-doc
  // repeated flagged stream (repeatedAnchorCtes — mirrors
  // Dedup.repeatedPositions at k = 8, minDocs = 2), and the
  // gaps-and-islands region merge tail (islandRegionSql — mirrors
  // Dedup.islandRegions; expects a CTE `f`(doc_id, p))
  private val anchorCtes =
    "WITH toks AS (SELECT doc_id, list_filter(" +
      "string_split_regex(text, '\\s+'), x -> len(x) > 0) AS w " +
      "FROM documents), " +
      "anch AS (SELECT doc_id, CAST(u AS INT) AS p, array_to_string(" +
      "list_slice(w, CAST(u AS INT) + 1, CAST(u AS INT) + 8), ' ') " +
      "AS gram FROM (SELECT doc_id, w, unnest(range(0, len(w) - 7)) " +
      "AS u FROM toks WHERE len(w) >= 8)), "

  private val repeatedAnchorCtes = anchorCtes +
    "rep AS (SELECT gram FROM anch GROUP BY gram " +
      "HAVING count(DISTINCT doc_id) >= 2), " +
      "f AS (SELECT a.doc_id, a.p FROM anch a JOIN rep USING (gram)), "

  private val islandRegionSql =
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
  private val statesValues: String = Seq(
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
  private val statesOracleSql: String =
    "SELECT iso_code, state_name, state_name_ar, " +
      "CAST(centroid_lon AS DOUBLE) AS centroid_lon, " +
      "CAST(centroid_lat AS DOUBLE) AS centroid_lat, " +
      "CAST(n_geojson_chars AS BIGINT) AS n_geojson_chars, geo_prefix " +
      s"FROM (VALUES $statesValues) AS t(iso_code, state_name, " +
      "state_name_ar, centroid_lon, centroid_lat, n_geojson_chars, geo_prefix)"

  /** Word-3-gram shingle sets per document, as a DuckDB CTE — the list-
    * function twin of `Dedup.shingleArray` (same \s+ tokenization, same
    * empty-token filter, same short-text branch). */
  private val shingleCte: String =
    "WITH s AS (SELECT doc_id, list_distinct(" +
      "CASE WHEN len(w) < 3 THEN [array_to_string(w, ' ')] " +
      "ELSE list_transform(range(1, len(w) - 1), i -> " +
      "array_to_string(w[i:i+2], ' ')) END) AS sh " +
      "FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0) AS w FROM documents)) "

  /** Exact Jaccard of two shingle CTE rows `a`/`b` (DuckDB list algebra),
    * twin of `Dedup.jaccardExpr`. */
  private val jaccardSqlExpr: String =
    "CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) / " +
      "CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE)"

  /** The LSH bucket id of `Similarity.withBucket`, as DuckDB SQL over a
    * column `e` = CAST(embedding AS DOUBLE[]): the SAME deterministic
    * hyperplane constants are embedded as literals, and both engines
    * compute the dot product as a sequential fold over doubles, so the sign
    * pattern — hence the bucket — is bit-identical. This makes the
    * LSH-bucketed join itself oracle-checkable, not just its output shape. */
  private def bucketSqlExpr(numPlanes: Int): String =
    graft.operators.Similarity.hyperplanes(numPlanes, 64).zipWithIndex
      .map { case (p, i) =>
        val arr = p.mkString("[", ", ", "]")
        s"(CASE WHEN list_dot_product(e, CAST($arr AS DOUBLE[])) >= 0 " +
          s"THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")

  /** DuckDB cosine between shingle-CTE-style embedding columns. */
  private def cosineSql(a: String, b: String): String =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * " +
      s"sqrt(list_dot_product($b, $b))), 4)"

  /** Bucket-cap twin for the oracles of capped operators
    * (`Similarity.capBuckets`, default maxBucket = 1000): drops whole
    * buckets holding more than 1000 vectors BEFORE the self-join, so
    * the SQL re-derivation stays bit-identical to the Spark side even
    * on a corpus where the cap actually binds (no fixture bucket comes
    * near it, but the contract must not silently depend on that). */
  private val cappedBucketCte: String =
    "bk AS (SELECT bucket FROM b GROUP BY bucket " +
      "HAVING count(*) <= 1000), " +
      "bc AS (SELECT b.* FROM b JOIN bk ON bk.bucket = b.bucket), "

  /** Undirected simple k-NN edge list as a DuckDB CTE chain (b → p →
    * kk → e): the q_knn_join top-5 pairs re-derived (bit-identical
    * hyperplane buckets, same 1000-vector bucket cap), then
    * least/greatest-normalized and dedup'd — the shared edge input of
    * the graph-analytics oracles, mirroring
    * `GraphOps.undirect(Similarity.knnJoin(...))`. */
  private val knnEdgeCte: String =
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
  private def pageRankOracleSql(iters: Int): String = {
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
  private def pprOracleSql(iters: Int, seedLabel: Int): String = {
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
  private val fpCte: String =
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
  private val containSqlExpr: String =
    "CAST(sh.shared AS DOUBLE) / CAST(least(sa.n, sb.n) AS DOUBLE)"

  /** Exploded word stream (doc_id, lang, word), twin of `TextOps.words`. */
  /** One-row-per-word CTE, parameterized by the carried columns so
    * variants are built, not string-edited (a silent no-op `.replace`
    * on drifted CTE text was the failure mode this removes). */
  private def wordCteWith(extraCols: String*): String =
    "WITH w AS (SELECT " + (Seq("doc_id") ++ extraCols).mkString(", ") +
      ", unnest(list_filter(string_split_regex(text, '\\s+'), " +
      "x -> len(x) > 0)) AS word FROM documents)"

  private val wordCte: String = wordCteWith("lang")

  /** Synthetic image pixel stream — the codec-free twin of
    * `Multimodal.pixelValue`/`imageDims`: one row per (asset, x, y) with
    * the rule-derived gray value. Everything the real-PNG operators emit
    * is re-derivable from this. */
  private val imagePxCte: String =
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
  private val imageDHashCte: String =
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

  def oracleSql: Map[String, String] = Map(
    "q_projection" ->
      ("SELECT p_partkey, upper(p_brand) AS brand_u, " +
        "p_retailprice * CAST(0.9 AS DOUBLE) AS discounted, " +
        "p_brand || '-' || p_type AS brand_type, " +
        "p_size + 100 AS size_adj FROM part"),
    "q_filter_between" ->
      ("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag " +
        "FROM lineitem WHERE l_quantity BETWEEN 10 AND 20 " +
        "AND l_returnflag = 'R' AND l_shipdate IS NOT NULL"),
    "q_filter_like_in" ->
      ("SELECT p_partkey, p_name, p_brand, p_size FROM part " +
        "WHERE p_name LIKE '%gear%' " +
        "AND p_brand IN ('Brand#1', 'Brand#9', 'Brand#13') AND p_size >= 10"),
    "q_join_inner" ->
      ("SELECT c_mktsegment, count(*) AS n_orders, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue " +
        "FROM orders JOIN customer ON o_custkey = c_custkey " +
        "GROUP BY c_mktsegment"),
    // Bloom-pruned SMJ equals the plain join (no false negatives + the
    // exact join behind the filter) — the equivalence IS the contract
    "q_bloom_join" ->
      ("SELECT o_orderpriority, count(*) AS n_items, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "WHERE o_orderpriority = '1-URGENT' GROUP BY o_orderpriority"),
    "q_join_left" ->
      ("SELECT n_nationkey, n_name, count(c_custkey) AS n_customers " +
        "FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey " +
        "GROUP BY n_nationkey, n_name"),
    "q_join_right" ->
      ("SELECT n_nationkey, n_name, count(s_suppkey) AS n_suppliers " +
        "FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey " +
        "GROUP BY n_nationkey, n_name"),
    "q_join_full" ->
      ("SELECT coalesce(nk_c, nk_s) AS nationkey, " +
        "coalesce(n_cust, 0) AS n_cust, coalesce(n_supp, 0) AS n_supp FROM " +
        "(SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1) c " +
        "FULL JOIN " +
        "(SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1) s " +
        "ON nk_c = nk_s"),
    "q_join_2key" ->
      ("SELECT a.custkey, a.yr, a.n_orders, b.revenue FROM " +
        "(SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "count(*) AS n_orders FROM orders GROUP BY 1, 2) a JOIN " +
        "(SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS INTEGER) AS yr, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue " +
        "FROM orders GROUP BY 1, 2) b " +
        "ON a.custkey = b.custkey AND a.yr = b.yr WHERE a.n_orders >= 2"),
    "q_agg_q1" ->
      ("SELECT l_returnflag, l_linestatus, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS sum_disc_price, " +
        "round(avg(l_quantity), 4) AS avg_qty, " +
        "min(l_quantity) AS min_qty, max(l_quantity) AS max_qty, " +
        "count(*) AS count_order, count(DISTINCT l_orderkey) AS n_orders " +
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"),
    // multi-join battery: the decimal discounted-price convention of
    // q_agg_q1 keeps revenue engine-exact; ORDER BY carries a unique
    // tiebreak so LIMIT selects identically in both engines
    "q_tpch_q3" ->
      ("SELECT l_orderkey AS orderkey, " +
        "strftime(o_orderdate, '%Y-%m-%d') AS orderdate, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "WHERE c_mktsegment = 'BUILDING' " +
        "AND o_orderdate < TIMESTAMP '1998-06-01' " +
        "AND l_shipdate > TIMESTAMP '1998-06-01' " +
        "GROUP BY l_orderkey, o_orderdate " +
        "ORDER BY revenue DESC, orderkey ASC LIMIT 10"),
    "q_tpch_q5" ->
      ("SELECT n_name AS nation, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN supplier ON l_suppkey = s_suppkey " +
        "AND c_nationkey = s_nationkey " +
        "JOIN nation ON s_nationkey = n_nationkey " +
        "JOIN region ON n_regionkey = r_regionkey " +
        "WHERE r_name = 'ASIA' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1998-01-01' " +
        "GROUP BY n_name ORDER BY revenue DESC, nation ASC"),
    "q_tpch_q10" ->
      ("SELECT c_custkey AS custkey, c_name AS name, n_name AS nation, " +
        "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * " +
        "(CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
        "AS DOUBLE) AS revenue " +
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
        "JOIN customer ON o_custkey = c_custkey " +
        "JOIN nation ON c_nationkey = n_nationkey " +
        "WHERE l_returnflag = 'R' " +
        "AND o_orderdate >= TIMESTAMP '1997-01-01' " +
        "AND o_orderdate < TIMESTAMP '1997-04-01' " +
        "GROUP BY c_custkey, c_name, n_name " +
        "ORDER BY revenue DESC, custkey ASC LIMIT 20"),
    "q_agg_having" ->
      ("SELECT CAST(FLOOR(year(l_shipdate) / 10.0) * 10 AS INTEGER) AS decade, " +
        "count(*) AS n_items, round(avg(l_extendedprice), 2) AS avg_price " +
        "FROM lineitem GROUP BY 1 HAVING count(*) > 100"),
    "q_agg_distinct" ->
      ("SELECT l_returnflag, count(DISTINCT l_suppkey) AS n_suppliers, " +
        "count(DISTINCT l_partkey) AS n_parts, " +
        "count(DISTINCT l_orderkey) AS n_orders FROM lineitem GROUP BY 1"),
    "q_sort_limit" ->
      ("SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 15"),
    "q_union" ->
      ("SELECT c_nationkey AS nk FROM customer " +
        "UNION SELECT s_nationkey AS nk FROM supplier"),
    "q_union_all" ->
      ("SELECT nk, count(*) AS n_rows FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "UNION ALL SELECT s_nationkey AS nk FROM supplier) t GROUP BY nk"),
    "q_except_intersect" ->
      ("SELECT 'cust_only' AS kind, nk FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "EXCEPT SELECT s_nationkey AS nk FROM supplier) e " +
        "UNION ALL SELECT 'both' AS kind, nk FROM " +
        "(SELECT c_nationkey AS nk FROM customer " +
        "INTERSECT SELECT s_nationkey AS nk FROM supplier) i"),
    // per-label centroid cosine: an indexed-lambda unnest re-derives the
    // posexplode/avg pipeline; final round(4) absorbs summation-order noise
    "q_label_centroids" ->
      ("WITH dims AS (SELECT label, u['i'] - 1 AS dim, avg(u['x']) AS m " +
        "FROM (SELECT label, unnest(list_transform(" +
        "CAST(embedding AS DOUBLE[]), (x, i) -> {'x': x, 'i': i})) AS u " +
        "FROM embeddings) t GROUP BY 1, 2) " +
        "SELECT a.label AS label_a, b.label AS label_b, " +
        "round(sum(a.m * b.m) / (sqrt(sum(a.m * a.m)) * " +
        "sqrt(sum(b.m * b.m))), 4) AS centroid_cosine " +
        "FROM dims a JOIN dims b ON a.dim = b.dim AND a.label < b.label " +
        "GROUP BY a.label, b.label"),
    // outlier audit: centroid, per-vector cosine, and the per-label 5%
    // quantile threshold all re-derived (same dim-keyed join shape)
    "q_embed_outliers" ->
      ("WITH dx AS (SELECT vec_id, label, u['i'] - 1 AS dim, " +
        "CAST(u['x'] AS DOUBLE) AS x " +
        "FROM (SELECT vec_id, label, unnest(list_transform(" +
        "CAST(embedding AS DOUBLE[]), (x, i) -> {'x': x, 'i': i})) AS u " +
        "FROM embeddings) t), " +
        "c AS (SELECT label, dim, avg(x) AS m FROM dx GROUP BY 1, 2), " +
        "sc AS (SELECT dx.vec_id, dx.label, " +
        "round(sum(dx.x * c.m) / (sqrt(sum(dx.x * dx.x)) * " +
        "sqrt(sum(c.m * c.m))), 4) AS cosine " +
        "FROM dx JOIN c ON c.label = dx.label AND c.dim = dx.dim " +
        "GROUP BY dx.vec_id, dx.label), " +
        "b AS (SELECT label, quantile_cont(cosine, 0.05) AS p_lo " +
        "FROM sc GROUP BY label) " +
        "SELECT sc.vec_id, sc.label, sc.cosine, " +
        "sc.cosine < b.p_lo AS is_outlier " +
        "FROM sc JOIN b ON b.label = sc.label"),
    "q_conditional" ->
      ("SELECT o_orderkey, CASE WHEN o_totalprice > 200000 THEN 'big' " +
        "WHEN o_totalprice > 100000 THEN 'mid' ELSE 'small' END AS bucket, " +
        "coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_adj, " +
        "round(o_totalprice / CAST(1000.0 AS DOUBLE), 1) AS k_price FROM orders"),
    "q_string_fns" ->
      ("SELECT c_custkey, left(c_name, 8) AS name_prefix, " +
        "CAST(length(c_mktsegment) AS INTEGER) AS seg_len, " +
        "CASE WHEN c_mktsegment = 'BUILDING' THEN 'بناء' " +
        "WHEN c_mktsegment = 'AUTOMOBILE' THEN 'سيارات' " +
        "ELSE c_mktsegment END AS segment_ar, " +
        "CASE WHEN c_acctbal < 0 THEN 'مدين' ELSE 'دائن' END AS balance_ar " +
        "FROM customer"),
    "q_datetime_agg" ->
      ("SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1, 2"),
    // JSON extraction: typed path extract + group on the extracted key
    // (Spark from_json ≡ DuckDB json_extract for a flat integer field)
    "q_json_extract" ->
      ("SELECT CAST(json_extract(props, '$.k') AS INT) AS prop_k, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY 1"),
    // retention cohorts: users by first-seen day × day offset 0..7
    "q_retention" ->
      ("WITH a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day " +
        "FROM events), " +
        "f AS (SELECT user_id, min(day) AS cohort_day FROM a GROUP BY 1) " +
        "SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day, " +
        "CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) " +
        "AS day_offset, count(DISTINCT a.user_id) AS n_users " +
        "FROM a JOIN f ON f.user_id = a.user_id " +
        "WHERE date_diff('day', f.cohort_day, a.day) BETWEEN 0 AND 7 " +
        "GROUP BY 1, 2"),
    // Markov transition matrix: lead() total-ordered by (ts, event_id)
    "q_transitions" ->
      ("WITH s AS (SELECT user_id, event_type, lead(event_type) OVER " +
        "(PARTITION BY user_id ORDER BY ts, event_id) AS to_type " +
        "FROM events) " +
        "SELECT from_type, to_type, n, round(CAST(n AS DOUBLE) / " +
        "CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE), 4) AS p " +
        "FROM (SELECT event_type AS from_type, to_type, count(*) AS n " +
        "FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2) t"),
    // per-user anomalies: mean/std from exact decimal sums, one IEEE
    // division/sqrt each, filter on the ROUNDED z in both engines
    "q_user_anomalies" ->
      ("WITH st AS (SELECT user_id, count(*) AS n, " +
        "sum(CAST(value AS DECIMAL(18,2))) AS s1, " +
        "sum(CAST(value AS DECIMAL(18,2)) * " +
        "CAST(value AS DECIMAL(18,2))) AS s2 " +
        "FROM events GROUP BY user_id HAVING count(*) >= 2), " +
        "m AS (SELECT user_id, " +
        "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean, " +
        "sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) * " +
        "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))) AS std FROM st) " +
        "SELECT e.event_id, e.user_id, " +
        "round((e.value - m.mean) / m.std, 4) AS z " +
        "FROM events e JOIN m ON m.user_id = e.user_id " +
        "WHERE m.std > 0 " +
        "AND abs(round((e.value - m.mean) / m.std, 4)) > 3"),
    // RFM segmentation: fixed thresholds, decimal-exact monetary
    "q_user_rfm" ->
      ("WITH l AS (SELECT max(CAST(ts AS DATE)) AS corpus_last FROM events), " +
        "u AS (SELECT user_id, max(CAST(ts AS DATE)) AS user_last, " +
        "count(*) AS frequency, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS monetary " +
        "FROM events GROUP BY 1) " +
        "SELECT user_id, CAST(date_diff('day', user_last, corpus_last) " +
        "AS BIGINT) AS recency_days, frequency, monetary, " +
        "CASE WHEN date_diff('day', user_last, corpus_last) <= 3 " +
        "AND frequency >= 20 THEN 'core' " +
        "WHEN date_diff('day', user_last, corpus_last) <= 7 THEN 'active' " +
        "WHEN date_diff('day', user_last, corpus_last) <= 14 THEN 'cooling' " +
        "ELSE 'dormant' END AS segment FROM u, l"),
    // typed props analytics over (event_type, day): both drifted event
    // columns (NTZ ts, props JSON) through one aggregate
    "q_event_props" ->
      ("SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT) " +
        "AS sum_k, " +
        "min(CAST(json_extract(props, '$.k') AS INT)) AS min_k, " +
        "max(CAST(json_extract(props, '$.k') AS INT)) AS max_k, " +
        "count(DISTINCT CAST(json_extract(props, '$.k') AS INT)) " +
        "AS n_distinct_k " +
        "FROM events GROUP BY 1, 2"),
    // sequential conversion funnel: min-after-previous-stage semantics
    "q_funnel" ->
      ("WITH v AS (SELECT user_id, min(ts) AS view_ts FROM events " +
        "WHERE event_type = 'view' GROUP BY user_id), " +
        "c AS (SELECT e.user_id, min(e.ts) AS click_ts FROM events e " +
        "JOIN v ON v.user_id = e.user_id " +
        "WHERE e.event_type = 'click' AND e.ts > v.view_ts " +
        "GROUP BY e.user_id), " +
        "p AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM events e " +
        "JOIN c ON c.user_id = e.user_id " +
        "WHERE e.event_type = 'purchase' AND e.ts > c.click_ts " +
        "GROUP BY e.user_id) " +
        "SELECT CAST(stage AS INTEGER) AS stage, event, " +
        "count(DISTINCT user_id) AS n_users FROM (" +
        "SELECT 1 AS stage, 'view' AS event, user_id FROM v " +
        "UNION ALL SELECT 2, 'click', user_id FROM c " +
        "UNION ALL SELECT 3, 'purchase', user_id FROM p) t " +
        "GROUP BY stage, event"),
    "q_window_topn" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM " +
        "(SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "CAST(row_number() OVER (PARTITION BY c_mktsegment " +
        "ORDER BY c_acctbal DESC, c_custkey ASC) AS INTEGER) AS rn " +
        "FROM customer) t WHERE rn <= 3"),
    "q_rollup" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"),
    "q_cube" ->
      ("SELECT l_returnflag, l_linestatus, count(*) AS n_items, " +
        "CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty " +
        "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"),
    "q_window_offsets" ->
      ("SELECT c_mktsegment, c_custkey, c_acctbal, " +
        "lag(c_acctbal, 1) OVER w AS prev_bal, " +
        "lead(c_acctbal, 1) OVER w AS next_bal, " +
        "CAST(ntile(4) OVER w AS INTEGER) AS quartile, " +
        "round(cume_dist() OVER w, 6) AS cdist FROM customer " +
        "WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey ASC)"),
    // identical SQL text runs on both engines — the string IS the oracle
    "q_sql_cte" -> Relational.cteSql,
    "q_sql_exists" -> Relational.existsSql,
    "q_sql_grouping_sets" -> Relational.groupingSetsSql,
    // verbatim RANGE-BETWEEN-INTERVAL window frame on both engines
    "q_sql_rolling_window" -> Relational.rollingWindowSql,
    // verbatim correlated LATERAL (same text both engines)
    "q_sql_lateral" -> Relational.lateralSql,
    // approximate-distinct CONTRACT: each engine runs its OWN HLL-family
    // estimator; the compared value is the within-5% boolean, not the
    // estimate (which legitimately differs per sketch implementation)
    "q_approx_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS exact_users, " +
        "(abs(CAST(approx_count_distinct(user_id) AS DOUBLE) - " +
        "CAST(count(DISTINCT user_id) AS DOUBLE)) / " +
        "CAST(count(DISTINCT user_id) AS DOUBLE)) <= 0.05 AS within_tol " +
        "FROM events GROUP BY event_type"),
    "q_pivot" ->
      ("SELECT strftime(ts, '%Y-%m-%d') AS day, " +
        Seq("click", "view", "purchase", "signup", "error").map(t =>
          s"CAST(count(*) FILTER (WHERE event_type = '$t') AS BIGINT) AS \"$t\"")
          .mkString(", ") +
        " FROM events GROUP BY 1"),
    "q_unpivot" ->
      ("SELECT p_partkey, 'p_retailprice' AS metric, " +
        "CAST(p_retailprice AS DOUBLE) AS value FROM part " +
        "UNION ALL SELECT p_partkey, 'p_size' AS metric, " +
        "CAST(p_size AS DOUBLE) AS value FROM part"),
    "q_collect_agg" ->
      ("SELECT l_returnflag, " +
        "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses, " +
        "count(DISTINCT l_linestatus) AS n_statuses FROM lineitem " +
        "GROUP BY l_returnflag"),
    // approximate-quantile CONTRACT: each engine's OWN sketch, compared
    // only through the within-5%-of-spread boolean
    "q_approx_quantile" ->
      ("SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS exact_p50, " +
        "(abs(CAST(approx_quantile(n_chars, 0.5) AS DOUBLE) - " +
        "quantile_cont(n_chars, 0.5)) / " +
        "CAST(max(n_chars) - min(n_chars) AS DOUBLE)) <= 0.05 " +
        "AS within_tol FROM documents GROUP BY lang"),
    "q_percentiles" ->
      ("SELECT lang, round(quantile_cont(n_chars, 0.5), 2) AS p50_chars, " +
        "round(quantile_cont(n_chars, 0.9), 2) AS p90_chars, " +
        "round(quantile_cont(n_chars, 0.99), 2) AS p99_chars " +
        "FROM documents GROUP BY lang"),
    "q_semi_anti" ->
      ("SELECT 'with_orders' AS kind, c_custkey FROM customer " +
        "WHERE c_custkey IN (SELECT o_custkey FROM orders) " +
        "UNION ALL SELECT 'no_orders' AS kind, c_custkey FROM customer " +
        "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"),
    "q_states" -> statesOracleSql,
    "q_providers" ->
      ("SELECT provider_id, name, name_ar, description, base_url FROM (VALUES " +
        "('worldbank', 'World Bank', 'البنك الدولي', " +
        "'World Development Indicators and other World Bank datasets', " +
        "'https://api.worldbank.org/v2/'), " +
        "('who', 'World Health Organization', 'منظمة الصحة العالمية', " +
        "'Global Health Observatory (GHO) data', " +
        "'https://ghoapi.azureedge.net/api/'), " +
        "('fao', 'Food and Agriculture Organization', 'منظمة الأغذية والزراعة', " +
        "'FAOSTAT agricultural statistics', " +
        "'https://faostatservices.fao.org/api/v1/'), " +
        "('unhcr', 'UNHCR', 'المفوضية السامية', " +
        "'UN Refugee Agency displacement and population data', " +
        "'https://api.unhcr.org/population/v1/'), " +
        "('ilo', 'International Labour Organization', 'منظمة العمل الدولية', " +
        "'International Labour Organization statistics', " +
        "'https://sdmx.ilo.org/rest/')" +
        ") AS t(provider_id, name, name_ar, description, base_url)"),
    "q_boundary_country" ->
      ("SELECT 'Sudan' AS country_name, 'السودان' AS country_name_ar, " +
        "'SDN' AS iso_code, CAST(103060 AS BIGINT) AS n_chars, " +
        "'{\"type\":\"MultiPolygon\"' AS geo_prefix"),
    "q_geocode" ->
      ("SELECT name, iso_code FROM (VALUES " +
        "('Khartoum', 'SD-KH'), ('الخرطوم', 'SD-KH'), ('khartoum', 'SD-KH'), " +
        "('KHARTOUM', 'SD-KH'), ('Red Sea', 'SD-RS'), ('red sea', 'SD-RS'), " +
        "('Al Jazirah', 'SD-GZ'), ('Unknown Place', ''), ('', '')" +
        ") AS t(name, iso_code)"),
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
    // exact set-similarity join: the oracle IS the brute-force all-pairs
    // shingle Jaccard (recall 1 is the contract — the prefix filter must
    // find every pair the quadratic scan finds; same CTE + measure as
    // q_minhash_pairs, whose LSH recall on this corpus this proves)
    "q_setsim_pairs" ->
      (shingleCte +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) AS jaccard " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5"),
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
    // deterministic split: md5 hex agrees byte-for-byte across engines
    "q_train_val_split" ->
      ("SELECT doc_id, lang, bucket, CASE WHEN bucket IN ('0', '1') " +
        "THEN 'val' WHEN bucket = '2' THEN 'test' ELSE 'train' END AS split " +
        "FROM (SELECT doc_id, lang, substr(md5(CAST(doc_id AS VARCHAR) " +
        "|| 'graft-v1'), 1, 1) AS bucket FROM documents) t"),
    // leakage-free split: the q_dedup_clusters RECURSIVE closure derives
    // the cluster key, then the SAME md5 bucket rule as q_train_val_split
    // applies to it (singletons key on their own doc_id)
    "q_leakfree_split" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v), " +
        "lab AS (SELECT d.doc_id, d.lang, " +
        "coalesce(c.cluster_id, d.doc_id) AS cluster_id " +
        "FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id) " +
        "SELECT doc_id, lang, cluster_id, " +
        "substr(md5(CAST(cluster_id AS VARCHAR) || 'graft-v1'), 1, 1) " +
        "AS bucket, CASE WHEN substr(md5(CAST(cluster_id AS VARCHAR) || " +
        "'graft-v1'), 1, 1) IN ('0', '1') THEN 'val' " +
        "WHEN substr(md5(CAST(cluster_id AS VARCHAR) || 'graft-v1'), 1, 1) " +
        "= '2' THEN 'test' ELSE 'train' END AS split FROM lab"),
    // DSIR weights: identical feature stream (unigrams + bigrams), the
    // same md5-prefix bucket, add-one smoothing over 4096 cells
    "q_dsir_weights" ->
      ("WITH w AS (SELECT doc_id, lang, " +
        "list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0) AS ws FROM documents), " +
        "f0 AS (SELECT doc_id, lang, unnest(list_concat(ws, " +
        "CASE WHEN len(ws) >= 2 THEN list_transform(range(1, len(ws)), " +
        "i -> ws[i] || ' ' || ws[i+1]) ELSE []::VARCHAR[] END)) AS feat " +
        "FROM w), " +
        "f AS (SELECT doc_id, lang, substr(md5(feat), 1, 3) AS b FROM f0), " +
        "tc AS (SELECT b, count(*) AS tc FROM f WHERE lang = 'en' " +
        "GROUP BY b), " +
        "rc AS (SELECT b, count(*) AS rc FROM f GROUP BY b), " +
        "tt AS (SELECT CAST(count(*) AS DOUBLE) AS tn FROM f " +
        "WHERE lang = 'en'), " +
        "rt AS (SELECT CAST(count(*) AS DOUBLE) AS rn FROM f), " +
        "sc AS (SELECT f.doc_id, " +
        "ln(((CAST(coalesce(tc.tc, 0) AS DOUBLE) + 1.0) / (tt.tn + 4096.0)) " +
        "/ ((CAST(rc.rc AS DOUBLE) + 1.0) / (rt.rn + 4096.0))) AS llr " +
        "FROM f LEFT JOIN tc ON tc.b = f.b JOIN rc ON rc.b = f.b " +
        "CROSS JOIN tt CROSS JOIN rt), " +
        "agg AS (SELECT doc_id, count(*) AS n_feats, " +
        "round(sum(llr), 4) AS dsir_weight, round(avg(llr), 4) AS avg_llr " +
        "FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, d.lang, coalesce(a.n_feats, 0) AS n_feats, " +
        "a.dsir_weight, a.avg_llr " +
        "FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"),
    // token-budget planner: census, temperature weights, cap, and the
    // single redistribution round re-derived with the same arithmetic
    "q_token_budget" ->
      ("WITH per AS (SELECT source, count(*) AS n_docs, " +
        "CAST(sum(CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) " +
        "AS BIGINT)) AS BIGINT) AS tokens FROM documents GROUP BY source), " +
        "t1 AS (SELECT sum(pow(CAST(tokens AS DOUBLE), 0.5)) AS psum " +
        "FROM per), " +
        "j AS (SELECT per.source, per.n_docs, per.tokens, " +
        "pow(CAST(per.tokens AS DOUBLE), 0.5) / t1.psum AS p, " +
        "110000.0 * pow(CAST(per.tokens AS DOUBLE), 0.5) / t1.psum " +
        "AS alloc0, 3.0 * CAST(per.tokens AS DOUBLE) AS cap FROM per, t1), " +
        "k AS (SELECT j.*, alloc0 > cap AS capped, " +
        "least(alloc0, cap) AS base FROM j), " +
        "t2 AS (SELECT sum(base) AS bsum, " +
        "sum(CASE WHEN capped THEN 0.0 ELSE p END) AS pun FROM k) " +
        "SELECT k.source, k.n_docs, k.tokens, round(k.p, 6) AS mix_weight, " +
        "k.capped, round(k.base + CASE WHEN k.capped THEN 0.0 " +
        "ELSE (110000.0 - t2.bsum) * k.p / t2.pun END, 2) AS alloc_tokens, " +
        "round((k.base + CASE WHEN k.capped THEN 0.0 " +
        "ELSE (110000.0 - t2.bsum) * k.p / t2.pun END) / " +
        "CAST(k.tokens AS DOUBLE), 4) AS epochs FROM k, t2"),
    // stratified hash sampling: the SAME fixed-width-hex string comparison
    // (lexicographic == numeric for lowercase hex; thresholds are shared
    // constants from Pipeline.hexThreshold, 'g' = keep-all sentinel)
    "q_stratified_sample" ->
      ("SELECT doc_id, text, lang, source, n_chars FROM documents " +
        "WHERE substr(md5(CAST(doc_id AS VARCHAR) || 'graft-sample-v1'), " +
        "1, 4) < CASE " +
        s"WHEN lang = 'en' THEN '${graft.operators.Pipeline.hexThreshold(0.5)}' " +
        s"WHEN lang = 'de' THEN '${graft.operators.Pipeline.hexThreshold(0.25)}' " +
        s"ELSE '${graft.operators.Pipeline.hexThreshold(1.0)}' END"),
    // per-source quota cap: deterministic top-`cap` by (n_chars DESC,
    // doc_id) — the total-order tiebreak makes the kept set unique
    "q_source_cap" ->
      ("SELECT doc_id, source, n_chars, rnk FROM (SELECT doc_id, source, " +
        "n_chars, row_number() OVER (PARTITION BY source " +
        "ORDER BY n_chars DESC, doc_id) AS rnk FROM documents) t " +
        "WHERE rnk <= 20"),
    // mixture planner: same share literals as mixtureTargets (already
    // normalized, Σ=1), same ceil(chars/4) token proxy as q_source_report;
    // every emitted double is rounded so Map-order ulp drift can't leak
    "q_mixture_plan" ->
      // outer CAST: DuckDB sum(BIGINT) widens to HUGEINT -> pandas float64,
      // while Spark emits int64 — the driver's dtype-sensitive hash would
      // mismatch on identical values without it (r8's only red row)
      ("WITH avail AS (SELECT source, CAST(sum(CAST(ceil(length(text) / " +
        "4.0) AS BIGINT)) AS BIGINT) AS avail_tokens " +
        "FROM documents GROUP BY source), " +
        "t AS (SELECT source, avail_tokens, CASE WHEN source IN " +
        "('src0','src1','src2','src3') THEN CAST(0.15 AS DOUBLE) " +
        "ELSE CAST(0.025 AS DOUBLE) END AS share FROM avail) " +
        "SELECT source, avail_tokens, round(share, 6) AS target_share, " +
        "round(share * 30000.0, 2) AS desired_tokens, " +
        "round(least(share * 30000.0 / CAST(avail_tokens AS DOUBLE), " +
        "2.0), 4) AS weight, " +
        "round(least(share * 30000.0, 2.0 * CAST(avail_tokens AS DOUBLE))," +
        " 2) AS planned_tokens, " +
        "(round(share * 30000.0, 2) > " +
        "round(2.0 * CAST(avail_tokens AS DOUBLE), 2)) AS capped " +
        "FROM t"),
    // multi-epoch schedule: the (epoch, source, T, share) spine comes
    // from the SAME driver-side annealedShares call the operator uses
    // (shared-constant pattern, like hexThreshold) — Double.toString is
    // the shortest round-trip repr, so DuckDB parses the identical
    // double; all emitted values round at the operator's precision
    "q_mixture_schedule" -> {
      val spine = graft.operators.Pipeline
        .annealedShares(mixtureTargets, 3, 2.0, 1.0)
        .map { case (e, s, t, sh) =>
          s"($e, '$s', CAST($t AS DOUBLE), CAST($sh AS DOUBLE))" }
        .mkString(", ")
      "WITH avail AS (SELECT source, CAST(sum(CAST(ceil(length(text) / " +
        "4.0) AS BIGINT)) AS BIGINT) AS avail_tokens " +
        "FROM documents GROUP BY source), " +
        s"plan(epoch, source, temperature, share) AS (VALUES $spine) " +
        "SELECT p.epoch, p.source, round(p.temperature, 4) AS temperature, " +
        "round(p.share, 6) AS target_share, " +
        "COALESCE(a.avail_tokens, CAST(0 AS BIGINT)) AS avail_tokens, " +
        "round(p.share * 30000.0, 2) AS planned_tokens, " +
        "CASE WHEN COALESCE(a.avail_tokens, 0) = 0 THEN NULL " +
        "ELSE round(p.share * 30000.0 / CAST(a.avail_tokens AS DOUBLE), 4) " +
        "END AS epochs_of_source " +
        "FROM plan p LEFT JOIN avail a ON a.source = p.source"
    },
    // snapshot diff: rebuild the same derived "new" snapshot, hash-join
    // full-outer on doc_id, classify per row
    // expectations: the same seven checks as scalar aggregates fanned
    // into rows (VALUES in place of stack)
    "q_expectations" ->
      ("WITH a AS (SELECT CAST(count(*) AS DOUBLE) AS n_rows, " +
        "CAST(count(*) AS DOUBLE) - " +
        "CAST(count(DISTINCT doc_id) AS DOUBLE) AS dup_ids, " +
        "avg(CASE WHEN text IS NOT NULL THEN 1.0 ELSE 0.0 END) " +
        "AS text_nonnull, " +
        "avg(CASE WHEN n_chars = length(text) THEN 1.0 ELSE 0.0 END) " +
        "AS len_consistent, " +
        "avg(CASE WHEN n_chars BETWEEN 1 AND 100000 THEN 1.0 " +
        "ELSE 0.0 END) AS len_in_range, " +
        "avg(CASE WHEN lang IS NOT NULL AND length(lang) > 0 " +
        "THEN 1.0 ELSE 0.0 END) AS lang_present, " +
        "avg(CASE WHEN source IS NOT NULL AND length(source) > 0 " +
        "THEN 1.0 ELSE 0.0 END) AS source_present FROM documents) " +
        "SELECT t.check, round(t.observed, 4) AS observed, t.passed " +
        "FROM a, LATERAL (VALUES " +
        "('row_count_positive', a.n_rows, a.n_rows > 0), " +
        "('doc_id_unique', a.dup_ids, a.dup_ids = 0.0), " +
        "('text_nonnull', a.text_nonnull, a.text_nonnull >= 0.99), " +
        "('n_chars_consistent', a.len_consistent, " +
        "a.len_consistent = 1.0), " +
        "('n_chars_in_range', a.len_in_range, a.len_in_range >= 0.999), " +
        "('lang_present', a.lang_present, a.lang_present >= 0.99), " +
        "('source_present', a.source_present, a.source_present >= 0.99)" +
        ") AS t(\"check\", observed, passed)"),
    // token windows: the same per-shard cumulative offsets + covered-
    // window expansion, range() in place of sequence()
    "q_token_windows" ->
      ("WITH t AS (SELECT doc_id, " +
        "substr(md5(CAST(doc_id AS VARCHAR) || 'graft-pack-v1'), 1, 1) " +
        "AS shard, CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens " +
        "FROM documents), " +
        "o AS (SELECT doc_id, shard, n_tokens, " +
        "sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - n_tokens AS off " +
        "FROM t WHERE n_tokens > 0), " +
        "e AS (SELECT doc_id, shard, n_tokens, off, " +
        "unnest(range(CAST(floor(off / 2048.0) AS BIGINT), " +
        "CAST(floor((off + n_tokens - 1) / 2048.0) AS BIGINT) + 1)) " +
        "AS window_id FROM o) " +
        "SELECT shard, window_id, CAST(count(*) AS BIGINT) AS n_docs, " +
        "CAST(sum(least((window_id + 1) * 2048, off + n_tokens) - " +
        "greatest(window_id * 2048, off)) AS BIGINT) AS n_tokens, " +
        "min(doc_id) AS first_doc, max(doc_id) AS last_doc " +
        "FROM e GROUP BY shard, window_id"),
    // SCD2: the corpus-diff classes fanned into version intervals —
    // unchanged = one open v1 row, changed = closed v1 + open v2,
    // removed = closed v1, added = open v2
    "q_scd2" ->
      ("WITH a AS (SELECT doc_id, md5(text) AS h_old FROM documents), " +
        "nb AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 " +
        "THEN text || ' v2' ELSE text END AS text FROM documents " +
        "WHERE doc_id % 7 <> 0 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents " +
        "WHERE doc_id % 13 = 0), " +
        "b AS (SELECT doc_id, md5(text) AS h_new FROM nb), " +
        "j AS (SELECT coalesce(a.doc_id, b.doc_id) AS doc_id, h_old, " +
        "h_new, a.doc_id IS NOT NULL AS in_old, " +
        "b.doc_id IS NOT NULL AS in_new " +
        "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id) " +
        "SELECT doc_id, h_old AS text_md5, CAST(1 AS BIGINT) AS " +
        "valid_from, CASE WHEN NOT in_new OR h_old IS DISTINCT FROM " +
        "h_new THEN CAST(2 AS BIGINT) ELSE NULL END AS valid_to, " +
        "NOT (NOT in_new OR h_old IS DISTINCT FROM h_new) AS is_current " +
        "FROM j WHERE in_old " +
        "UNION ALL SELECT doc_id, h_new, CAST(2 AS BIGINT), " +
        "CAST(NULL AS BIGINT), true FROM j " +
        "WHERE in_new AND (NOT in_old OR h_old IS DISTINCT FROM h_new)"),
    // CDC merge: kept = NOT (delete ∪ update) keys; updates and inserts
    // union in; md5 pins content without hauling full texts
    "q_cdc_merge" ->
      ("SELECT doc_id, lang, source, n_chars, md5(text) AS text_md5 " +
        "FROM (" +
        "SELECT doc_id, lang, source, n_chars, text FROM documents " +
        "WHERE doc_id % 11 <> 0 AND doc_id % 7 <> 3 " +
        "UNION ALL " +
        "SELECT doc_id, lang, source, n_chars + 7, text || ' [rev2]' " +
        "FROM documents WHERE doc_id % 11 <> 0 AND doc_id % 7 = 3 " +
        "UNION ALL " +
        "SELECT doc_id + 1000000, lang, source, n_chars, 'ins:' || text " +
        "FROM documents WHERE doc_id % 13 = 5)"),
    "q_corpus_diff" ->
      ("WITH a AS (SELECT doc_id, md5(text) AS h_old FROM documents), " +
        "nb AS (SELECT doc_id, CASE WHEN doc_id % 11 = 0 " +
        "THEN text || ' v2' ELSE text END AS text FROM documents " +
        "WHERE doc_id % 7 <> 0 " +
        "UNION ALL SELECT doc_id + 1000000, text FROM documents " +
        "WHERE doc_id % 13 = 0), " +
        "b AS (SELECT doc_id, md5(text) AS h_new FROM nb) " +
        "SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id, " +
        "CASE WHEN a.doc_id IS NULL THEN 'added' " +
        "WHEN b.doc_id IS NULL THEN 'removed' " +
        // IS DISTINCT FROM = Spark's <=> negation: NULL-text sides read
        // "changed", matching the engine's null-safe compare
        "WHEN h_old IS DISTINCT FROM h_new THEN 'changed' " +
        "ELSE 'unchanged' END AS status " +
        "FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id"),
    // dataset card: one-row global aggregate unpivoted to (metric, value);
    // same token proxy / quality / word-count conventions as the per-doc
    // operators, exact interpolated percentiles (quantile_cont twin)
    "q_dataset_card" ->
      ("WITH s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, " +
        "CAST(count(DISTINCT source) AS DOUBLE) AS n_sources, " +
        "CAST(count(DISTINCT lang) AS DOUBLE) AS n_langs, " +
        "CAST(count(DISTINCT md5(text)) AS DOUBLE) AS n_distinct_texts, " +
        "round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 4) AS dup_ratio, " +
        "CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS DOUBLE) " +
        "AS total_tokens, " +
        "round(CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE), 2) AS avg_doc_tokens, " +
        "round(quantile_cont(n_chars, 0.5), 2) AS p50_chars, " +
        "round(quantile_cont(n_chars, 0.9), 2) AS p90_chars, " +
        s"round(CAST(sum(CASE WHEN $wordsExpr < 30 THEN 1 ELSE 0 END) " +
        "AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) AS short_doc_ratio, " +
        s"round(CAST(sum(least($wordsExpr, 200)) AS DOUBLE) / " +
        "(200.0 * CAST(count(*) AS DOUBLE)), 4) " +
        "AS mean_quality FROM documents) " +
        "SELECT 'n_docs' AS metric, n_docs AS value FROM s " +
        "UNION ALL SELECT 'n_sources', n_sources FROM s " +
        "UNION ALL SELECT 'n_langs', n_langs FROM s " +
        "UNION ALL SELECT 'n_distinct_texts', n_distinct_texts FROM s " +
        "UNION ALL SELECT 'dup_ratio', dup_ratio FROM s " +
        "UNION ALL SELECT 'total_tokens', total_tokens FROM s " +
        "UNION ALL SELECT 'avg_doc_tokens', avg_doc_tokens FROM s " +
        "UNION ALL SELECT 'p50_chars', p50_chars FROM s " +
        "UNION ALL SELECT 'p90_chars', p90_chars FROM s " +
        "UNION ALL SELECT 'short_doc_ratio', short_doc_ratio FROM s " +
        "UNION ALL SELECT 'mean_quality', mean_quality FROM s"),
    // source-mixture resampling: whole-part copies + md5-gated fractional
    // copy, thresholds are the shared hexThreshold constants (src0 w=2.5
    // -> 2 + gate<'8000'; src1 w=0.25 -> 0 + gate<'4000'; default w=1.0)
    "q_resample_sources" ->
      ("SELECT doc_id, source, unnest(range(1, c + 1)) AS copy_idx FROM (" +
        "SELECT doc_id, source, (CASE WHEN source = 'src0' THEN 2 " +
        "WHEN source = 'src1' THEN 0 ELSE 1 END) + (CASE WHEN " +
        "substr(md5(CAST(doc_id AS VARCHAR) || 'graft-resample-v1'), 1, 4) " +
        s"< CASE WHEN source = 'src0' THEN '${graft.operators.Pipeline.hexThreshold(0.5)}' " +
        s"WHEN source = 'src1' THEN '${graft.operators.Pipeline.hexThreshold(0.25)}' " +
        s"ELSE '${graft.operators.Pipeline.hexThreshold(0.0)}' END " +
        "THEN 1 ELSE 0 END) AS c FROM documents) t"),
    // corpus bigram frequencies (the BPE merge statistic), deterministic
    // top-k via (count DESC, gram) — both engines select the same set
    "q_bigram_vocab" ->
      ("SELECT g AS gram, count(*) AS n FROM (SELECT unnest(" +
        "list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i + 1])) " +
        "AS g FROM (SELECT list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0) AS w FROM documents) WHERE len(w) >= 2) " +
        "GROUP BY g ORDER BY n DESC, g LIMIT 50"),
    // BPE merge learning: the merge loop is iterative (not expressible in
    // SQL) but fully deterministic on a fixed corpus (max-freq pair,
    // lexicographic tie-break) — golden VALUES, the q_simhash_pairs
    // treatment; semantics are additionally spec-pinned on a
    // hand-computed fixture in TextOpsSpec
    "q_bpe_merges" ->
      ("SELECT rank, merge_left, merge_right, pair_freq FROM (VALUES " +
        Seq(
          (0, "e", "r", 4568), (1, "e", "·", 4473), (2, "n", "·", 2834),
          (3, "er", "·", 2779), (4, "o", "w", 2747), (5, "ow", "·", 2747),
          (6, "o", "r", 2696), (7, "s", "t", 2676), (8, "h", "·", 1884),
          (9, "a", "t", 1845), (10, "l", "u", 1831), (11, "i", "n", 1796),
          (12, "a", "·", 1788), (13, "g", "·", 1777), (14, "y", "·", 1767),
          (15, "a", "r", 1758), (16, "p", "ar", 1758), (17, "t", "·", 1750),
          (18, "i", "n·", 964), (19, "j", "o", 964)
        ).map { case (r, l, rt, f) =>
          s"(CAST($r AS BIGINT), '$l', '$rt', CAST($f AS BIGINT))"
        }.mkString(", ") +
        ") AS t(rank, merge_left, merge_right, pair_freq)"),
    // apply half of the BPE pair: corpus token frequencies under the 20
    // learned merges (deterministic encode + tie-broken top-k → golden
    // VALUES; merged tokens e·/er·/ow·/or/st visibly in the vocabulary)
    "q_bpe_tokens" ->
      ("SELECT token, n FROM (VALUES " +
        Seq(
          ("a", 7259), ("l", 5525), ("s", 5481), ("·", 5366), ("c", 4653),
          ("m", 4602), ("e·", 4473), ("t", 3593), ("er·", 2779),
          ("ow·", 2747), ("o", 2746), ("d", 2732), ("b", 2721), ("r", 2709),
          ("u", 2709), ("g", 2697), ("e", 2696), ("or", 2696), ("st", 2676),
          ("h·", 1884)
        ).map { case (t, n) => s"('$t', CAST($n AS BIGINT))" }
          .mkString(", ") +
        ") AS t(token, n)"),
    // PII scrub: same Java∩RE2 regex constants, same email-first cascade;
    // DuckDB regexp_replace needs the 'g' flag for replace-all
    "q_pii_redact" -> {
      val e = graft.operators.TextOps.EmailRe
      val p = graft.operators.TextOps.PhoneRe
      "SELECT doc_id, " +
        s"regexp_replace(regexp_replace(text, '$e', '<EMAIL>', 'g'), " +
        s"'$p', '<PHONE>', 'g') AS redacted, " +
        s"CAST(len(regexp_extract_all(text, '$e')) AS BIGINT) AS n_emails, " +
        s"CAST(len(regexp_extract_all(regexp_replace(text, '$e', " +
        s"'<EMAIL>', 'g'), '$p')) AS BIGINT) AS n_phones FROM documents"
    },
    // the full cleaning composition, re-derived: exact-keep semi ∘
    // near-dup anti (exact all-pairs Jaccard stands in for LSH — recall 1
    // on this corpus, see q_minhash_pairs) ∘ min-words filter ∘ token stats
    "q_clean_corpus" ->
      (shingleCte +
        ", drops AS (SELECT DISTINCT b.doc_id FROM s a JOIN s b " +
        "ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
        "ek AS (SELECT min(doc_id) AS doc_id FROM documents " +
        "GROUP BY md5(text)) " +
        "SELECT d.doc_id, d.lang, " +
        s"$wordsExpr AS n_words, " +
        "CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) " +
        "AS approx_bpe_tokens FROM documents d " +
        "WHERE d.doc_id IN (SELECT doc_id FROM ek) " +
        "AND d.doc_id NOT IN (SELECT doc_id FROM drops) " +
        s"AND $wordsExpr >= 30"),
    // drop-audit twin of q_clean_corpus: same CTEs, inverted predicate,
    // first-matching reason precedence (exact → near → short)
    "q_clean_audit" ->
      (shingleCte +
        ", drops AS (SELECT DISTINCT b.doc_id FROM s a JOIN s b " +
        "ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
        "ek AS (SELECT min(doc_id) AS doc_id FROM documents " +
        "GROUP BY md5(text)) " +
        "SELECT d.doc_id, " +
        "CASE WHEN d.doc_id NOT IN (SELECT doc_id FROM ek) " +
        "THEN 'exact_dup' " +
        "WHEN d.doc_id IN (SELECT doc_id FROM drops) THEN 'near_dup' " +
        "ELSE 'short' END AS reason FROM documents d " +
        "WHERE d.doc_id NOT IN (SELECT doc_id FROM ek) " +
        "OR d.doc_id IN (SELECT doc_id FROM drops) " +
        s"OR $wordsExpr < 30"),
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
    // char-class ratios: DuckDB regexp_replace needs the 'g' flag to
    // match Spark's replace-all default
    "q_charclass_quality" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        Seq("punct_ratio" -> "[.,;:!?]", "upper_ratio" -> "[A-Z]",
          "digit_ratio" -> "[0-9]").map { case (name, pat) =>
            "CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
              "round(CAST(length(text) - length(regexp_replace(text, " +
              s"'$pat', '', 'g')) AS DOUBLE) / " +
              s"CAST(length(text) AS DOUBLE), 4) END AS $name"
          }.mkString(", ") +
        " FROM documents"),
    // duplicate-token fraction (Gopher-style repetition rule)
    "q_repetition" ->
      ("SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, " +
        "CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct, " +
        "CASE WHEN len(w) = 0 THEN 0.0 ELSE " +
        "round(1.0 - CAST(len(list_distinct(w)) AS DOUBLE) / " +
        "CAST(len(w) AS DOUBLE), 4) END AS rep_ratio FROM " +
        "(SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0) AS w FROM documents) t"),
    // Gopher §A1.1 repetition signals: dup-line fraction + top word/2-gram
    // token share, re-derived with DuckDB list/group algebra (unnest → mode
    // count; only the top COUNT is used, so no tie-break divergence)
    "q_gopher_repetition" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) " +
        "AS w, string_split(text, chr(10)) AS lines FROM documents), " +
        "wc AS (SELECT doc_id, g, count(*) AS c FROM " +
        "(SELECT doc_id, unnest(w) AS g FROM w) GROUP BY doc_id, g), " +
        "wtop AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / " +
        "CAST(sum(c) AS DOUBLE), 4) AS twf FROM wc GROUP BY doc_id), " +
        "bc AS (SELECT doc_id, g, count(*) AS c FROM " +
        "(SELECT doc_id, unnest(list_transform(range(1, len(w)), " +
        "i -> w[i] || ' ' || w[i + 1])) AS g FROM w WHERE len(w) >= 2) " +
        "GROUP BY doc_id, g), " +
        "btop AS (SELECT doc_id, round(CAST(max(c) AS DOUBLE) / " +
        "CAST(sum(c) AS DOUBLE), 4) AS tbf FROM bc GROUP BY doc_id) " +
        "SELECT w.doc_id, CASE WHEN len(lines) = 0 THEN 0.0 ELSE " +
        "round(1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / " +
        "CAST(len(lines) AS DOUBLE), 4) END AS dup_line_frac, " +
        "coalesce(wtop.twf, 0.0) AS top_word_frac, " +
        "coalesce(btop.tbf, 0.0) AS top_bigram_frac " +
        "FROM w LEFT JOIN wtop ON wtop.doc_id = w.doc_id " +
        "LEFT JOIN btop ON btop.doc_id = w.doc_id"),
    // MinHash-LSH near-dup pairs vs EXACT all-pairs Jaccard: on this corpus
    // every true pair has J >= 0.98 (nothing between 0.2 and 0.98), so at
    // threshold 0.5 the 16x4 banding's per-pair miss probability is
    // ~(1-0.98^4)^16 < 1e-22 — LSH provably finds the full exact answer,
    // and the exact all-pairs join IS the oracle (500 docs at the oracle SF
    // → 125k pairs, trivially in DuckDB's reach; at 100 TB only the LSH
    // side exists, which is the point of the operator).
    "q_minhash_pairs" ->
      (shingleCte +
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) AS jaccard " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5"),
    // keep-filter twin: documents minus the higher-id side of each pair
    "q_minhash_keep" ->
      (shingleCte +
        ", drops AS (SELECT DISTINCT b.doc_id FROM s a JOIN s b " +
        "ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5) " +
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars " +
        "FROM documents d WHERE d.doc_id NOT IN (SELECT doc_id FROM drops)"),
    // transitive near-dup clusters vs a DuckDB RECURSIVE closure over the
    // same exact all-pairs Jaccard graph the pair oracle uses: walk is the
    // reachability set of each vertex, cluster_id = min reachable id (incl.
    // self), cluster_n a count window — the oracle literally computes the
    // definition the Spark operator implements iteratively
    "q_dedup_clusters" ->
      (shingleCte.replaceFirst("WITH ", "WITH RECURSIVE ") +
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
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
      (shingleCte +
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) AS jaccard " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
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
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
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
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
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
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
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
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5), " +
        "edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs " +
        "UNION ALL SELECT doc_b, doc_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e.dst FROM walk w JOIN edges e ON e.src = w.u), " +
        "comp AS (SELECT v AS doc_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars " +
        "FROM documents d WHERE NOT EXISTS (SELECT 1 FROM comp c " +
        "WHERE c.doc_id = d.doc_id AND c.cluster_id <> d.doc_id)"),
    "q_text_stats" ->
      ("SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars, " +
        "CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        s"$wordsExpr AS n_words, " +
        "round(CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE) / " +
        s"CAST($wordsExpr AS DOUBLE), 4) AS avg_word_len FROM documents"),
    "q_token_count" ->
      (s"SELECT doc_id, $wordsExpr AS ws_tokens, " +
        "CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) " +
        "AS approx_bpe_tokens FROM documents"),
    "q_lang_profile" ->
      ("SELECT lang, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars, " +
        "min(n_chars) AS min_chars, max(n_chars) AS max_chars " +
        "FROM documents GROUP BY lang"),
    "q_quality_score" ->
      ("SELECT doc_id, n_words, " +
        "round(CAST(least(n_words, 200) AS DOUBLE) / 200.0, 4) AS quality, " +
        "CASE WHEN n_words < 30 THEN 'short' WHEN n_words > 150 THEN 'long' " +
        "ELSE 'ok' END AS flag FROM " +
        s"(SELECT doc_id, $wordsExpr AS n_words FROM documents) t"),
    // the salted two-phase aggregation must be indistinguishable from the
    // plain GROUP BY — that equivalence IS the correctness contract
    "q_salted_agg" ->
      ("SELECT event_type, count(*) AS n_rows, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value " +
        "FROM events GROUP BY event_type"),
    // the PLAIN join — the salted rewrite must be indistinguishable
    "q_salted_join" ->
      ("SELECT c_mktsegment, count(*) AS n_rows, " +
        "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) " +
        "AS revenue FROM orders JOIN customer ON c_custkey = o_custkey " +
        "GROUP BY c_mktsegment"),
    // unigram LM score: same tokenization, ln, and broadcast-total shape
    "q_unigram_logprob" ->
      ("WITH t AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0)) AS word FROM documents), " +
        "c AS (SELECT word, count(*) AS cnt FROM t GROUP BY word), " +
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t) " +
        "SELECT doc_id, count(*) AS n_words, " +
        "round(avg(ln(CAST(cnt AS DOUBLE) / total)), 4) AS avg_logprob " +
        "FROM t JOIN c USING (word) CROSS JOIN tot GROUP BY doc_id"),
    // head/middle/tail by fixed cutoffs over the same unigram LM score;
    // cutoffs sit between round-4 grid points, so assignment is tie-free
    "q_perplexity_buckets" ->
      ("WITH t AS (SELECT doc_id, " +
        "unnest(list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0)) AS word FROM documents), " +
        "c AS (SELECT word, count(*) AS cnt FROM t GROUP BY word), " +
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS total FROM t), " +
        "sc AS (SELECT doc_id, " +
        "round(avg(ln(CAST(cnt AS DOUBLE) / total)), 4) AS avg_logprob " +
        "FROM t JOIN c USING (word) CROSS JOIN tot GROUP BY doc_id) " +
        "SELECT doc_id, avg_logprob, " +
        "CASE WHEN avg_logprob >= -3.39985 THEN 'head' " +
        "WHEN avg_logprob >= -3.40395 THEN 'middle' " +
        "ELSE 'tail' END AS bucket FROM sc"),
    // stupid-backoff bigram LM: the train split (doc_id % 10 != 0) and
    // both count tables re-derived; DuckDB's zipped unnest of the two
    // shifted list slices is the twin of the Spark array transform
    "q_bigram_logprob" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0) AS ws FROM documents), " +
        "bg AS (SELECT doc_id, unnest(ws[1:len(ws)-1]) AS prev, " +
        "unnest(ws[2:len(ws)]) AS cur FROM w WHERE len(ws) >= 2), " +
        "tw AS (SELECT unnest(ws) AS word FROM w WHERE doc_id % 10 <> 0), " +
        "cu AS (SELECT word, count(*) AS cu FROM tw GROUP BY word), " +
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS n_tok, " +
        "CAST(count(DISTINCT word) AS DOUBLE) AS v FROM tw), " +
        "cb AS (SELECT prev, cur, count(*) AS cb FROM bg " +
        "WHERE doc_id % 10 <> 0 GROUP BY prev, cur), " +
        "sc AS (SELECT g.doc_id, CASE WHEN cb.cb IS NOT NULL " +
        "THEN ln(CAST(cb.cb AS DOUBLE) / CAST(cp.cu AS DOUBLE)) " +
        "ELSE ln(0.4 * (CAST(coalesce(cc.cu, 0) AS DOUBLE) + 1.0) / " +
        "(tot.n_tok + tot.v)) END AS s, " +
        "CASE WHEN cb.cb IS NULL THEN 1 ELSE 0 END AS backoff " +
        "FROM bg g LEFT JOIN cb ON cb.prev = g.prev AND cb.cur = g.cur " +
        "LEFT JOIN cu cp ON cp.word = g.prev " +
        "LEFT JOIN cu cc ON cc.word = g.cur CROSS JOIN tot), " +
        "agg AS (SELECT doc_id, count(*) AS n_bigrams, " +
        "CAST(sum(backoff) AS BIGINT) AS n_backoff, " +
        "round(avg(s), 4) AS avg_logprob FROM sc GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(a.n_bigrams, 0) AS n_bigrams, " +
        "coalesce(a.n_backoff, 0) AS n_backoff, a.avg_logprob " +
        "FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"),
    // trigram novelty: distinct-within-doc grams, corpus df, df=1 share
    "q_novelty" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), " +
        "x -> len(x) > 0) AS ws FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(list_transform(" +
        "range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i + 1] || ' ' || " +
        "ws[i + 2]))) AS gram FROM w WHERE len(ws) >= 3), " +
        "df AS (SELECT gram, count(*) AS df FROM g GROUP BY gram), " +
        "agg AS (SELECT g.doc_id, count(*) AS n_grams, " +
        "CAST(sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS BIGINT) " +
        "AS n_unique FROM g JOIN df ON df.gram = g.gram GROUP BY g.doc_id) " +
        "SELECT d.doc_id, d.lang, d.source, " +
        "coalesce(a.n_grams, 0) AS n_grams, " +
        "coalesce(a.n_unique, 0) AS n_unique, " +
        "round(CAST(a.n_unique AS DOUBLE) / CAST(a.n_grams AS DOUBLE), 4) " +
        "AS novelty FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id"),
    // JS divergence over the densified, add-0.5-smoothed top-200 vocab
    // grid — same densification, same smoothing, same pair expansion
    "q_source_divergence" ->
      ("WITH c AS (SELECT source, unnest(list_filter(" +
        "string_split_regex(text, '\\s+'), x -> len(x) > 0)) AS word " +
        "FROM documents), " +
        "counts AS (SELECT source, word, count(*) AS n FROM c " +
        "GROUP BY source, word), " +
        "vocab AS (SELECT word FROM (SELECT word, sum(n) AS tot " +
        "FROM counts GROUP BY word) ORDER BY tot DESC, word LIMIT 200), " +
        "srcs AS (SELECT DISTINCT source FROM counts), " +
        "grid AS (SELECT s.source, v.word, " +
        "CAST(coalesce(c2.n, 0) AS DOUBLE) + 0.5 AS c FROM srcs s " +
        "CROSS JOIN vocab v LEFT JOIN counts c2 " +
        "ON c2.source = s.source AND c2.word = v.word), " +
        "probs AS (SELECT source, word, " +
        "c / sum(c) OVER (PARTITION BY source) AS p FROM grid) " +
        "SELECT a.source AS source_a, b.source AS source_b, " +
        "round(sum(a.p * ln(a.p * 2 / (a.p + b.p)) + " +
        "b.p * ln(b.p * 2 / (a.p + b.p))) / 2.0, 6) AS js_divergence " +
        "FROM probs a JOIN probs b ON a.word = b.word " +
        "AND a.source < b.source GROUP BY a.source, b.source"),
    "q_token_fertility" ->
      ("SELECT lang, count(*) AS n_docs, " +
        s"CAST(sum($wordsExpr) AS BIGINT) AS total_words, " +
        "CAST(sum(CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT)) " +
        "AS BIGINT) AS total_tokens, " +
        "round(CAST(sum(CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) " +
        "AS BIGINT)) AS DOUBLE) / " +
        s"CAST(sum($wordsExpr) AS DOUBLE), 4) AS fertility " +
        "FROM documents GROUP BY lang"),
    // Levenshtein near-dup pairs: at the oracle SF the inequality join is
    // affordable and IS the contract (|len diff| <= 8 AND dist <= 16); at
    // 100 TB only the Spark side's length-banded equi-join + bag-bound
    // prune exists (the prune is exact, hence contract-invisible)
    "q_edit_distance" ->
      ("SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "CAST(levenshtein(a.text, b.text) AS BIGINT) AS edit_dist " +
        "FROM documents a JOIN documents b " +
        "ON a.doc_id < b.doc_id AND abs(a.n_chars - b.n_chars) <= 8 " +
        "WHERE levenshtein(a.text, b.text) <= 16"),
    // cross-source dup matrix over the same exact all-pairs Jaccard graph
    // the q_minhash_pairs oracle uses
    "q_dup_source_matrix" ->
      (shingleCte +
        ", pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        s"round($jaccardSqlExpr, 4) AS jaccard " +
        "FROM s a JOIN s b ON a.doc_id < b.doc_id " +
        s"WHERE round($jaccardSqlExpr, 4) >= 0.5) " +
        "SELECT least(da.source, db.source) AS source_a, " +
        "greatest(da.source, db.source) AS source_b, " +
        "count(*) AS n_pairs, round(avg(p.jaccard), 4) AS avg_jaccard " +
        "FROM pairs p JOIN documents da ON da.doc_id = p.doc_a " +
        "JOIN documents db ON db.doc_id = p.doc_b GROUP BY 1, 2"),
    // k-NN majority-vote classification, fully re-derived: identical
    // buckets (bucketSqlExpr) -> identical neighbor sets (the q_knn_join
    // window) -> the same (votes DESC, label ASC) deterministic vote
    "q_knn_classify" ->
      ("WITH b AS (SELECT vec_id, e, " + bucketSqlExpr(8) + " AS bucket " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings) t0), " +
        cappedBucketCte +
        "p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, " +
        cosineSql("a.e", "c.e") + " AS cosine " +
        "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id), " +
        "n AS (SELECT vec_a, vec_b FROM " +
        "(SELECT vec_a, vec_b, row_number() OVER " +
        "(PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS rank " +
        "FROM p) t WHERE rank <= 5), " +
        "v AS (SELECT n.vec_a, e2.label AS nbr_label, " +
        "count(*) AS n_votes FROM n JOIN embeddings e2 " +
        "ON e2.vec_id = n.vec_b GROUP BY 1, 2), " +
        "tp AS (SELECT vec_a AS vec_id, nbr_label AS predicted_label, " +
        "n_votes FROM (SELECT *, row_number() OVER (PARTITION BY vec_a " +
        "ORDER BY n_votes DESC, nbr_label ASC) AS rk FROM v) t " +
        "WHERE rk = 1) " +
        "SELECT tp.vec_id, e3.label AS true_label, tp.predicted_label, " +
        "tp.n_votes, tp.predicted_label <> e3.label AS mismatch " +
        "FROM tp JOIN embeddings e3 ON e3.vec_id = tp.vec_id"),
    // zipped parallel unnests re-derive the (dim, value) matrix; both
    // engines compute population stddev in double
    "q_dim_stats" ->
      ("SELECT i - 1 AS dim, round(avg(x), 6) AS d_mean, " +
        "round(stddev_pop(x), 6) AS d_std FROM " +
        "(SELECT unnest(CAST(embedding AS DOUBLE[])) AS x, " +
        "unnest(generate_series(1, len(embedding))) AS i FROM embeddings) " +
        "GROUP BY i - 1"),
    // same per-dim stats, pivoted to 1-based lists and applied per vector
    "q_embed_standardize" ->
      ("WITH flat AS (SELECT unnest(CAST(embedding AS DOUBLE[])) AS x, " +
        "unnest(generate_series(1, len(embedding))) AS i FROM embeddings), " +
        "st AS (SELECT i, avg(x) AS m, stddev_pop(x) AS s FROM flat " +
        "GROUP BY i), " +
        "ms AS (SELECT list(m ORDER BY i) AS means, " +
        "list(s ORDER BY i) AS stds FROM st), " +
        "z AS (SELECT e.vec_id, e.label, " +
        "list_transform(generate_series(1, len(e.embedding)), " +
        "j -> (CAST(e.embedding[j] AS DOUBLE) - ms.means[j]) / ms.stds[j]) " +
        "AS zs FROM embeddings e, ms) " +
        "SELECT vec_id, label, " +
        "round(sqrt(list_sum(list_transform(zs, v -> v * v))), 4) " +
        "AS z_norm, round(list_min(zs), 4) AS z_min, " +
        "round(list_max(zs), 4) AS z_max FROM z"),
    // identical buckets (bucketSqlExpr) -> identical candidate stream;
    // ranks order by the ROUNDED cosine, so the margin arithmetic runs
    // on the same 4dp values in both engines
    "q_margin_mine" ->
      ("WITH b AS (SELECT vec_id, label, e, " + bucketSqlExpr(8) +
        " AS bucket FROM (SELECT vec_id, label, " +
        "CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t0), " +
        cappedBucketCte +
        "c AS (SELECT a.vec_id AS vec_a, bb.vec_id AS vec_b, " +
        cosineSql("a.e", "bb.e") + " AS cos FROM bc a JOIN bc bb " +
        "ON a.bucket = bb.bucket WHERE a.label = 0 AND bb.label = 1), " +
        // margin in exact scaled-integer space (see Similarity.marginMine:
        // floats land on 5e-5 boundaries by construction, integers don't)
        "r AS (SELECT *, CAST(round(cos * 10000) AS BIGINT) AS ic, " +
        "row_number() OVER (PARTITION BY vec_a " +
        "ORDER BY cos DESC, vec_b ASC) AS rank_f, " +
        "row_number() OVER (PARTITION BY vec_b " +
        "ORDER BY cos DESC, vec_a ASC) AS rank_b FROM c), " +
        "ka AS (SELECT vec_a, sum(ic) AS sum_a, count(*) AS n_a FROM r " +
        "WHERE rank_f <= 4 GROUP BY vec_a), " +
        "kb AS (SELECT vec_b, sum(ic) AS sum_b, count(*) AS n_b FROM r " +
        "WHERE rank_b <= 4 GROUP BY vec_b), " +
        "m AS (SELECT r.vec_a, r.vec_b, r.cos, " +
        "2 * n_a * n_b * ic - sum_a * n_b - sum_b * n_a AS num, " +
        "2 * n_a * n_b AS den FROM r " +
        "JOIN ka ON r.vec_a = ka.vec_a JOIN kb ON r.vec_b = kb.vec_b " +
        "WHERE rank_f = 1) " +
        // 4-dp rounding via integer half-away-from-zero: N/D ties at .5
        // exactly when counts are even, where double rounding diverges
        "SELECT vec_a, vec_b, cos AS cosine, " +
        "CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) * " +
        "((2 * abs(num) + den) // (2 * den)) AS DOUBLE) / 10000.0 " +
        "AS margin, num >= 500 * den AS accepted FROM m"),
    // per-column profile of orders (SUMMARIZE parity): one UNION ALL arm
    // per column, min/max stringified the same way the operator does
    "q_summarize" -> Seq(
        ("o_orderkey", "bigint", "CAST(min(o_orderkey) AS VARCHAR)",
          "CAST(max(o_orderkey) AS VARCHAR)", "o_orderkey"),
        ("o_custkey", "bigint", "CAST(min(o_custkey) AS VARCHAR)",
          "CAST(max(o_custkey) AS VARCHAR)", "o_custkey"),
        ("o_orderstatus", "string", "min(o_orderstatus)",
          "max(o_orderstatus)", "o_orderstatus"),
        ("o_totalprice", "double", "CAST(min(o_totalprice) AS VARCHAR)",
          "CAST(max(o_totalprice) AS VARCHAR)", "o_totalprice"),
        // Spark 4 reads parquet timestamps without UTC adjustment as NTZ
        ("o_orderdate", "timestamp_ntz",
          "strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S')",
          "strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')", "o_orderdate"),
        ("o_orderpriority", "string", "min(o_orderpriority)",
          "max(o_orderpriority)", "o_orderpriority"))
      .map { case (name, tpe, minE, maxE, c) =>
        s"SELECT '$name' AS column_name, '$tpe' AS column_type, " +
          "count(*) AS n_rows, count(*) - count(" + c + ") AS n_null, " +
          s"count(DISTINCT $c) AS n_distinct, $minE AS min_value, " +
          s"$maxE AS max_value FROM orders"
      }.mkString(" UNION ALL "),
    // first occurrence per content key in event-time order (micros —
    // the Spark session's timestamp precision — so both engines rank
    // at identical resolution)
    // lifetime distinct users per type from merged batch sketch rows —
    // exact below k, so the oracle is the plain distinct count
    "q_stream_sketch" ->
      ("SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) " +
        "AS est_users FROM events GROUP BY event_type"),
    "q_ingest_dedup" ->
      ("SELECT event_id, user_id, event_type, value FROM " +
        "(SELECT event_id, user_id, event_type, value, " +
        "row_number() OVER (PARTITION BY user_id, event_type, value " +
        "ORDER BY epoch_us(ts) ASC, event_id ASC) AS rn FROM events) t " +
        "WHERE rn = 1"),
    // decontamination: word 8-gram overlap vs the doc_id<10 stand-in
    // benchmark (same shingle semantics as Dedup.shingleArray at k=8)
    "q_decontaminate" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) " +
        "AS w FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(" +
        "CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')] " +
        "ELSE list_transform(range(1, len(w) - 6), i -> " +
        "array_to_string(w[i:i+7], ' ')) END)) AS gram FROM w), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10) " +
        "SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams " +
        "FROM g JOIN b ON b.gram = g.gram WHERE g.doc_id >= 10 " +
        "GROUP BY g.doc_id"),
    // bloom pre-filter + exact confirm is EXACT by construction → the
    // oracle is the same decontamination SQL
    "q_decontaminate_bloom" ->
      ("WITH w AS (SELECT doc_id, " +
        "list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) " +
        "AS w FROM documents), " +
        "g AS (SELECT doc_id, unnest(list_distinct(" +
        "CASE WHEN len(w) < 8 THEN [array_to_string(w, ' ')] " +
        "ELSE list_transform(range(1, len(w) - 6), i -> " +
        "array_to_string(w[i:i+7], ' ')) END)) AS gram FROM w), " +
        "b AS (SELECT DISTINCT gram FROM g WHERE doc_id < 10) " +
        "SELECT g.doc_id, count(DISTINCT g.gram) AS n_shared_grams " +
        "FROM g JOIN b ON b.gram = g.gram WHERE g.doc_id >= 10 " +
        "GROUP BY g.doc_id"),
    // fixed-width length histogram (floor-div binning, no global sort)
    "q_length_histogram" ->
      ("SELECT CAST(floor(length(text) / 50) AS BIGINT) AS bin, " +
        "count(*) AS n_docs, " +
        "CAST(min(length(text)) AS BIGINT) AS min_chars, " +
        "CAST(max(length(text)) AS BIGINT) AS max_chars " +
        "FROM documents GROUP BY 1"),
    // percentile-window outlier trim: quantile_cont interpolation matches
    // Spark's exact percentile (equivalence pinned by q_percentiles)
    "q_length_trim" ->
      ("WITH b AS (SELECT quantile_cont(n_chars, 0.05) AS p_lo, " +
        "quantile_cont(n_chars, 0.95) AS p_hi FROM documents) " +
        "SELECT doc_id, lang, source, n_chars FROM documents, b " +
        "WHERE n_chars >= p_lo AND n_chars <= p_hi"),
    // per-language percentile windows (same quantile_cont interpolation,
    // one row of bounds per language joined back)
    "q_length_trim_lang" ->
      ("WITH b AS (SELECT lang, quantile_cont(n_chars, 0.05) AS p_lo, " +
        "quantile_cont(n_chars, 0.95) AS p_hi FROM documents GROUP BY lang) " +
        "SELECT d.doc_id, d.lang, d.source, d.n_chars " +
        "FROM documents d JOIN b ON d.lang = b.lang " +
        "WHERE d.n_chars >= b.p_lo AND d.n_chars <= b.p_hi"),
    // overlapping 200-char chunks, step 150 (Spark sequence is stop-
    // inclusive; DuckDB range is stop-exclusive, hence the +1)
    "q_chunk_docs" ->
      ("SELECT doc_id, CAST((s - 1) / 150 AS BIGINT) AS chunk_id, " +
        "CAST(s AS BIGINT) AS start_pos, " +
        "substr(text, s, 200) AS chunk_text, " +
        "CAST(length(substr(text, s, 200)) AS BIGINT) AS chunk_chars " +
        "FROM (SELECT doc_id, text, " +
        "unnest(range(1, greatest(length(text) - 50, 1) + 1, 150)) AS s " +
        "FROM documents)"),
    // greedy contiguous packing by prefix token count within a
    // (lang, md5-hex shard) window (ROWS frame is explicit; Spark's
    // default RANGE frame is identical because the order key is unique;
    // the shard hex digit agrees byte-for-byte across engines)
    "q_pack_sequences" ->
      ("SELECT doc_id, lang, shard, " +
        "CAST(ceil(length(text) / 4.0) AS BIGINT) AS n_tokens, " +
        "CAST(floor((sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) " +
        "OVER (PARTITION BY lang, shard ORDER BY doc_id " +
        "ROWS UNBOUNDED PRECEDING) - " +
        "CAST(ceil(length(text) / 4.0) AS BIGINT)) / 2048.0) AS BIGINT) " +
        "AS pack_id FROM (SELECT doc_id, lang, text, " +
        "substr(md5(CAST(doc_id AS VARCHAR) || 'graft-pack-v1'), 1, 1) " +
        "AS shard FROM documents) t"),
    // A-ES weighted sample: key = ln(u)/w, u from the two-round
    // multiplicative hash (exact BIGINT arithmetic mod 1e9+7, products
    // < 2^63 — both engines bit-identical), w = n_chars. Top-100 by key.
    "q_weighted_sample" ->
      ("WITH h1 AS (SELECT doc_id, lang, source, n_chars, " +
        "(doc_id % 1000000007) * 2654435761 % 1000000007 + 1013904223 " +
        "AS a FROM documents), " +
        "h2 AS (SELECT doc_id, lang, source, n_chars, " +
        "(a % 1000000007) * 1597334677 % 1000000007 + 362437 AS b FROM h1), " +
        "k AS (SELECT doc_id, lang, source, n_chars, " +
        "ln(CAST(b % 1000000007 + 1 AS DOUBLE) / 1000000008.0) / " +
        "CAST(n_chars AS DOUBLE) AS raw_key FROM h2) " +
        "SELECT doc_id, lang, source, n_chars, round(raw_key, 6) " +
        "AS sample_key FROM k ORDER BY raw_key DESC, doc_id LIMIT 100"),
    // deterministic corpus shuffle: shard = hash mod 64, pos = rank of
    // the second-round hash within the shard (doc_id tiebreak)
    "q_corpus_shuffle" ->
      ("WITH h1 AS (SELECT doc_id, lang, " +
        "(doc_id % 1000000007) * 2246822519 % 1000000007 + 374761393 " +
        "AS a FROM documents), " +
        "h2 AS (SELECT doc_id, lang, " +
        "(a % 1000000007) * 3266489917 % 1000000007 + 668265263 AS b " +
        "FROM h1), " +
        "o AS (SELECT doc_id, lang, b % 1000000007 AS ord FROM h2) " +
        "SELECT doc_id, lang, CAST(ord % 64 AS INT) AS shard, " +
        "row_number() OVER (PARTITION BY ord % 64 ORDER BY ord, doc_id) " +
        "AS pos FROM o"),
    // inverted index: tf per (word, doc), df-pruned (<= 50), postings
    // rank-capped (<= 10) by tf DESC with doc_id tiebreak
    "q_inverted_index" ->
      (wordCteWith() + ", t AS (SELECT word, doc_id, count(*) AS tf " +
        "FROM w GROUP BY word, doc_id), " +
        "d AS (SELECT word, count(*) AS df FROM t GROUP BY word " +
        "HAVING count(*) <= 5000) " +
        "SELECT word, df, doc_id, tf, rank FROM (" +
        "SELECT t.word, d.df, t.doc_id, t.tf, row_number() OVER (" +
        "PARTITION BY t.word ORDER BY t.tf DESC, t.doc_id) AS rank " +
        "FROM t JOIN d ON t.word = d.word) r WHERE rank <= 10"),
    // Morton curve: bit i of xb -> position 2i, of yb -> 2i+1; plain
    // shift/mask arithmetic both engines evaluate identically
    "q_zorder" ->
      ("SELECT doc_id, xb, yb, " +
        (0 until 8).map(i =>
          s"(((xb >> $i) & 1) << ${2 * i}) + (((yb >> $i) & 1) << ${2 * i + 1})")
          .mkString(" + ") +
        " AS zval FROM (SELECT doc_id, (n_chars // 50) % 256 AS xb, " +
        "doc_id % 256 AS yb FROM documents) t"),
    // quality classifier: sigmoid(w·x) with the sf0.01-trained weights
    // as full-precision literals; feature arithmetic and the z-sum are
    // written in the EXACT evaluation order of QualityModel.features
    // (IEEE association matters — (l*l)*w, not w*l*l), so score and
    // decision agree bit-for-bit modulo the engines' exp()
    "q_quality_classifier" ->
      ("WITH f AS (SELECT doc_id, " +
        "CAST(n_chars AS DOUBLE) / 1000.0 - 0.5 AS l, " +
        Seq(" the ", " and ", " of ", " a ").map { w =>
          s"(length(concat(' ', text, ' ')) - " +
            s"length(replace(concat(' ', text, ' '), '$w', ''))) // ${w.length}"
        }.mkString("(", " + ", ")") + " AS sh, " +
        s"$wordsExpr AS nw FROM documents), " +
        "z AS (SELECT doc_id, " +
        "CASE WHEN nw >= 30 AND nw <= 150 THEN 1 ELSE 0 END AS teacher, " +
        "1.0 * 30.22491366441738 + l * (-5.656690363442728) + " +
        "(l * l) * (-289.40126661116653) + " +
        "(CAST(sh AS DOUBLE) / greatest(CAST(nw AS DOUBLE), 1.0)) * " +
        "19.88549518249624 AS zz FROM f) " +
        "SELECT doc_id, CAST(teacher AS BIGINT) AS teacher, " +
        "round(1.0 / (1.0 + exp(-zz)), 4) AS score, " +
        "CAST(CASE WHEN 1.0 / (1.0 + exp(-zz)) >= 0.5 THEN 1 ELSE 0 END " +
        "AS BIGINT) AS pred FROM z"),
    // per-source provenance mix with exact dup ratio
    "q_source_report" ->
      ("SELECT source, count(*) AS n_docs, " +
        "count(DISTINCT lang) AS n_langs, " +
        "count(DISTINCT md5(text)) AS n_distinct_texts, " +
        "round(avg(length(text)), 2) AS avg_chars, " +
        "CAST(sum(CAST(ceil(length(text) / 4.0) AS BIGINT)) AS BIGINT) " +
        "AS approx_bpe_tokens, " +
        "round(1.0 - CAST(count(DISTINCT md5(text)) AS DOUBLE) / " +
        "CAST(count(*) AS DOUBLE), 4) AS dup_ratio FROM documents " +
        "GROUP BY source"),
    "q_stopword_quality" ->
      ("WITH h AS (SELECT doc_id, " +
        Seq(" the ", " and ", " of ", " a ").map { w =>
          s"(length(concat(' ', text, ' ')) - " +
            s"length(replace(concat(' ', text, ' '), '$w', ''))) // ${w.length}"
        }.mkString("(", " + ", ")") +
        " AS stop_hits, " +
        s"$wordsExpr AS n_words " +
        "FROM documents) " +
        "SELECT doc_id, CAST(stop_hits AS BIGINT) AS stop_hits, n_words, " +
        "round(CAST(stop_hits AS DOUBLE) / CAST(n_words AS DOUBLE), 4) AS stop_ratio FROM h"),
    // frame sampling: the byte-slice arithmetic (step = len DIV n, start
    // = min(i·step, len−1), end = min(start+step, len)) re-derived from
    // strlen alone — no blob functions needed to check the sampler
    "q_frame_sample" ->
      ("SELECT doc_id AS asset_id, CAST(i AS INTEGER) AS frame_no, " +
        "CAST(least(least(i * step, len - 1) + step, len) - " +
        "least(i * step, len - 1) AS INTEGER) AS frame_len FROM " +
        "(SELECT doc_id, len, greatest(1, len // 4) AS step, " +
        "unnest(range(0, 4)) AS i FROM " +
        "(SELECT doc_id, strlen(text) AS len FROM documents " +
        "WHERE doc_id % 3 = 2)) t WHERE len > 0"),
    "q_multimodal_meta" ->
      ("SELECT doc_id AS asset_id, " +
        "CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'image' " +
        "WHEN 1 THEN 'audio' ELSE 'video' END AS modality, " +
        "CAST(strlen(text) AS BIGINT) AS n_bytes, " +
        "CAST((doc_id * 7 + n_chars) % 1024 + 64 AS INTEGER) AS width, " +
        "CAST((doc_id * 13 + n_chars) % 768 + 64 AS INTEGER) AS height " +
        "FROM documents"),
    // real-codec image family: the oracle re-derives pixels from the
    // synthetic rule (pure integer arithmetic, no codec), pooled cells
    // as ONE exact-integer IEEE division — every value the Spark side
    // produces comes through TWO real PNG round-trips, so a hash match
    // here is a codec-exactness proof, not a tautology
    "q_image_meta" ->
      (imagePxCte +
        " SELECT asset_id, CAST(w AS BIGINT) AS width, " +
        "CAST(h AS BIGINT) AS height, " +
        "CAST(sum(g) AS DOUBLE) / count(*) AS mean_luma " +
        "FROM px GROUP BY asset_id, w, h"),
    "q_image_resize" ->
      (imagePxCte +
        ", cell AS (SELECT asset_id, y*8//h AS v, x*8//w AS u, " +
        "CAST(floor(CAST(sum(g) AS DOUBLE)/count(*)) AS BIGINT) AS gray " +
        "FROM px GROUP BY 1, 2, 3) " +
        "SELECT asset_id, CAST(v AS BIGINT) AS v, CAST(u AS BIGINT) AS u, " +
        "gray FROM cell"),
    "q_image_dhash" ->
      (imagePxCte + s", $imageDHashCte " +
        "SELECT asset_id, dhash_hi, dhash_lo FROM hs"),
    "q_image_neardup" ->
      (imagePxCte + s", $imageDHashCte " +
        "SELECT a.asset_id AS asset_a, b.asset_id AS asset_b, " +
        "CAST(bit_count(xor(a.dhash_hi, b.dhash_hi)) + " +
        "bit_count(xor(a.dhash_lo, b.dhash_lo)) AS BIGINT) AS hamming " +
        "FROM hs a JOIN hs b ON a.asset_id < b.asset_id AND " +
        "(a.dhash_lo % 65536 = b.dhash_lo % 65536 OR " +
        "a.dhash_lo // 65536 = b.dhash_lo // 65536 OR " +
        "a.dhash_hi % 65536 = b.dhash_hi % 65536 OR " +
        "a.dhash_hi // 65536 = b.dhash_hi // 65536) " +
        "WHERE bit_count(xor(a.dhash_hi, b.dhash_hi)) + " +
        "bit_count(xor(a.dhash_lo, b.dhash_lo)) <= 2"),
    // per-frame video stats: frame rule re-derived in SQL (no codec) —
    // the Spark side demuxes the GFV1 container and PNG-decodes every
    // frame for real, so the hash match proves framing + codec exactness
    "q_video_frames" ->
      ("WITH px AS (SELECT d.doc_id AS asset_id, f.f AS f, " +
        "16 + d.doc_id % 16 AS w, 16 + d.doc_id % 8 AS h, " +
        "(d.doc_id*31 + f.f*17 + x.x*7 + y.y*13) % 256 AS g " +
        "FROM documents d, " +
        "unnest(range(0, 2 + d.doc_id % 4)) AS f(f), " +
        "unnest(range(0, 16 + d.doc_id % 16)) AS x(x), " +
        "unnest(range(0, 16 + d.doc_id % 8)) AS y(y)) " +
        "SELECT asset_id, CAST(f AS BIGINT) AS frame_no, " +
        "CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height, " +
        "CAST(sum(g) AS DOUBLE) / count(*) AS mean_luma " +
        "FROM px GROUP BY asset_id, f, w, h"),
    // real-codec audio family: sample rule re-derived in SQL; peak/rms/
    // zero-crossings over the decoded PCM must match the rule exactly
    // (WAV is uncompressed 16-bit PCM — lossless round trip)
    "q_audio_meta" ->
      ("WITH sm AS (SELECT d.doc_id AS asset_id, t.t AS t, " +
        "(d.doc_id*31 + t.t*7919) % 65536 - 32768 AS s " +
        "FROM documents d, " +
        "unnest(range(0, 256 + d.doc_id % 256)) AS t(t)), " +
        "lagd AS (SELECT asset_id, t, s, " +
        "lag(s) OVER (PARTITION BY asset_id ORDER BY t) AS prev FROM sm) " +
        "SELECT asset_id, count(*) AS n_samples, " +
        "CAST(max(abs(s)) AS BIGINT) AS peak, " +
        "sqrt(CAST(sum(s*s) AS DOUBLE) / count(*)) AS rms, " +
        "CAST(sum(CASE WHEN prev IS NOT NULL AND ((prev < 0) <> (s < 0)) " +
        "THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings " +
        "FROM lagd GROUP BY asset_id"),
    "q_embed_norms" ->
      ("SELECT vec_id, round(sqrt(list_dot_product(" +
        "CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))), 4) " +
        "AS norm, label FROM embeddings"),
    // int8 scalar quantization: same double arithmetic, same floor+clamp
    // (DuckDB unnest-with-index is 1-based, hence the -1)
    "q_quantize_embed" ->
      ("WITH f AS (SELECT vec_id, u.i - 1 AS dim, CAST(u.x AS DOUBLE) AS v " +
        "FROM (SELECT vec_id, unnest(list_transform(embedding, " +
        "(x, i) -> {'x': x, 'i': i})) AS u FROM embeddings)), " +
        "s AS (SELECT dim, min(v) AS d_min, max(v) AS d_max " +
        "FROM f GROUP BY dim) " +
        "SELECT f.vec_id, CAST(f.dim AS BIGINT) AS dim, " +
        "CAST(CASE WHEN s.d_max = s.d_min THEN 0 ELSE " +
        "least(255, floor((f.v - s.d_min) * 255.0 / (s.d_max - s.d_min))) " +
        "END AS BIGINT) AS q FROM f JOIN s ON s.dim = f.dim"),
    "q_ann_cosine" ->
      ("WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings " +
        "WHERE vec_id = 0) " +
        "SELECT e.vec_id, e.label, " +
        "round(list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qv) / " +
        "(sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]), " +
        "CAST(e.embedding AS DOUBLE[]))) * " +
        "sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> 0 " +
        "ORDER BY cosine DESC, e.vec_id ASC LIMIT 10"),
    // semantic decontamination: eval side = vectors below id 10 (the
    // benchmark stand-in, same convention as q_decontaminate); both
    // engines fold doubles in index order, so round(...,4) agrees —
    // the >= filter applies to the ROUNDED value in both, keeping
    // boundary hits engine-stable
    "q_semantic_decontaminate" ->
      ("WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v " +
        "FROM embeddings), " +
        "ev AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n " +
        "FROM e WHERE vec_id < 10), " +
        "c AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS n " +
        "FROM e WHERE vec_id >= 10) " +
        "SELECT c.vec_id, ev.vec_id AS eval_id, " +
        "round(list_dot_product(c.v, ev.v) / (c.n * ev.n), 4) AS cosine " +
        "FROM c CROSS JOIN ev " +
        "WHERE round(list_dot_product(c.v, ev.v) / (c.n * ev.n), 4) " +
        ">= 0.3"),
    // Matryoshka rerank: prefix slice, shortlist, and full rerank all
    // re-derived; slices are 1-based inclusive in BOTH engines
    "q_ann_matryoshka" ->
      ("WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv, " +
        "CAST(embedding[1:16] AS DOUBLE[]) AS qp FROM embeddings " +
        "WHERE vec_id = 0), " +
        "s1 AS (SELECT e.vec_id, e.label, " +
        "CAST(e.embedding AS DOUBLE[]) AS ev, q.qv AS qv, " +
        "round(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), q.qp) " +
        "/ (sqrt(list_dot_product(CAST(e.embedding[1:16] AS DOUBLE[]), " +
        "CAST(e.embedding[1:16] AS DOUBLE[]))) * " +
        "sqrt(list_dot_product(q.qp, q.qp))), 4) AS pre_cosine " +
        "FROM embeddings e, q WHERE e.vec_id <> 0 " +
        "ORDER BY pre_cosine DESC, e.vec_id ASC LIMIT 50) " +
        "SELECT vec_id, label, pre_cosine, " +
        "round(list_dot_product(ev, qv) / (sqrt(list_dot_product(ev, ev)) " +
        "* sqrt(list_dot_product(qv, qv))), 4) AS cosine " +
        "FROM s1 ORDER BY cosine DESC, vec_id ASC LIMIT 10"),
    // networked-source goldens: expected decode of the recorded fixture
    // bodies (FIXTURES.md §1), matching the reference's parse semantics
    "q_src_worldbank" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2018, CAST(NULL AS DOUBLE))" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_src_wb_catalog" ->
      ("SELECT indicator_id, indicator_name, source, source_note FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'World Development Indicators', 'Total population.'), " +
        "('SP.POP.GROW', 'Population growth (annual %)', 'World Development Indicators', CAST(NULL AS VARCHAR)), " +
        "('NY.GDP.MKTP.CD', 'GDP (current US$)', 'World Development Indicators', 'GDP at purchaser prices.'), " +
        "('SH.DYN.MORT', 'Mortality rate, under-5', 'Health', 'Under-five mortality.')" +
        ") AS t(indicator_id, indicator_name, source, source_note)"),
    "q_src_wb_pushdown" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5)" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_src_who" ->
      ("SELECT indicator_code, CAST(indicator_name AS VARCHAR) AS indicator_name, " +
        "country, CAST(year AS INTEGER) AS year, sex, " +
        "CAST(value AS DOUBLE) AS value, region FROM (VALUES " +
        "('WHOSIS_000001', NULL, 'SDN', 2019, 'SEX_BTSX', 65.3, 'Africa'), " +
        "('WHOSIS_000001', NULL, 'SDN', 2018, CAST(NULL AS VARCHAR), 65.0, CAST(NULL AS VARCHAR)), " +
        "('WHOSIS_000001', NULL, 'SDN', 2017, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE), 'Africa')" +
        ") AS t(indicator_code, indicator_name, country, year, sex, value, region)"),
    "q_src_who_catalog" ->
      ("SELECT indicator_code, indicator_name, language FROM (VALUES " +
        "('WHOSIS_000001', 'Life expectancy at birth (years)', 'EN'), " +
        "('MDG_0000000001', 'Infant mortality rate', 'EN'), " +
        "('NCD_BMI_30A', 'Obesity prevalence', CAST(NULL AS VARCHAR))" +
        ") AS t(indicator_code, indicator_name, language)"),
    "q_src_fao" ->
      ("SELECT dataset, area, item, element, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value, unit FROM (VALUES " +
        "('QCL', 'Sudan', 'Wheat', 'Production', 2021, 601000.0, 't'), " +
        "('QCL', 'Sudan', 'Sorghum', 'Production', 2020, 3746000.0, 't'), " +
        "('QCL', 'Sudan', 'Millet', 'Production', 2020, 1034000.0, 't'), " +
        "('QCL', 'Sudan', 'Dates', 'Production', 2019, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR))" +
        ") AS t(dataset, area, item, element, year, value, unit)"),
    "q_src_unhcr" ->
      ("SELECT CAST(year AS INTEGER) AS year, population_type, country_origin, " +
        "country_origin_name, country_asylum, country_asylum_name, " +
        "CAST(value AS BIGINT) AS value FROM (VALUES " +
        "(2023, 'refugees', 'SDN', 'Sudan', 'TCD', 'Chad', 409235), " +
        "(2023, 'refugees', 'SDN', 'Sudan', 'EGY', 'Egypt', 318533), " +
        "(2023, 'refugees', 'ERI', 'Eritrea', 'SDN', 'Sudan', 126000)" +
        ") AS t(year, population_type, country_origin, country_origin_name, " +
        "country_asylum, country_asylum_name, value)"),
    "q_src_ilo" ->
      ("SELECT indicator, country, sex, classif1, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_T', 'AGE_YTHADULT_Y15-64', 2022, 13.1), " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_T', 'AGE_YTHADULT_Y15-64', 2023, 13.4), " +
        "('UNE_DEAP_SEX_AGE_RT', 'SDN', 'SEX_M', 'AGE_YTHADULT_Y15-64', 2022, 11.2)" +
        ") AS t(indicator, country, sex, classif1, year, value)"),
    "q_src_ilo_legacy" ->
      ("SELECT indicator, country, sex, classif1, CAST(year AS INTEGER) AS year, " +
        "CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('EMP_TEMP_SEX_ECO_NB', 'SDN', CAST(NULL AS VARCHAR), 'ECO_SECTOR_AGR', 2021, 7.5)" +
        ") AS t(indicator, country, sex, classif1, year, value)"),
    // ANN recall constants (deterministic: fixed corpus, hyperplanes,
    // centroids). IVF with nprobe=4/nlist=16 recovers the exact top-10;
    // single-table LSH on this isotropic corpus probes ~31% → recall 0.5.
    "q_ann_lsh" ->
      ("SELECT method, k, n_true, n_hit, recall FROM (VALUES " +
        "('lsh', 10, CAST(10 AS BIGINT), CAST(5 AS BIGINT), " +
        "CAST(0.5 AS DOUBLE))) AS t(method, k, n_true, n_hit, recall)"),
    // recall re-pinned r5: the layout-independent hash-ordered training
    // sample reorders k-means init, and on this isotropic corpus (no
    // neighbor structure) probing nprobe/nlist = 4/16 of the cells lands
    // recall ≈ coverage — 0.5, same regime as the LSH entry above
    "q_ann_ivf" ->
      ("SELECT method, k, n_true, n_hit, recall FROM (VALUES " +
        "('ivf', 10, CAST(10 AS BIGINT), CAST(5 AS BIGINT), " +
        "CAST(0.5 AS DOUBLE))) AS t(method, k, n_true, n_hit, recall)"),
    // PQ-ADC recall: 4-byte codes (m=8, k=16) of 256-byte vectors on an
    // isotropic corpus — the pinned constant is re-derived whenever the
    // deterministic codebook inputs change (same contract as lsh/ivf)
    "q_ann_pq" ->
      ("SELECT method, k, n_true, n_hit, recall FROM (VALUES " +
        "('pq', 10, CAST(10 AS BIGINT), CAST(4 AS BIGINT), " +
        "CAST(0.4 AS DOUBLE))) AS t(method, k, n_true, n_hit, recall)"),
    // composed IVF-PQ two-stage (prune → ADC shortlist → exact re-rank):
    // recall equals the plain-IVF entry above — the pruning stage sets
    // the ceiling and the ADC shortlist + exact re-rank loses NOTHING
    // that survived pruning, which is exactly the two-stage contract
    "q_ann_ivfpq" ->
      ("SELECT method, k, n_true, n_hit, recall FROM (VALUES " +
        "('ivfpq', 10, CAST(10 AS BIGINT), CAST(5 AS BIGINT), " +
        "CAST(0.5 AS DOUBLE))) AS t(method, k, n_true, n_hit, recall)"),
    // grown index (built on the even-id half, odd half appended under
    // the frozen model): deterministic end to end — hash-gated sample
    // of the base half, deterministic Lloyd, exact append (same model
    // ⇒ same cells/codes as a rebuild, spec-pinned in PqSpec) — so the
    // recall over base+appended is a pinned constant like the other ANN
    // entries; lower than q_ann_ivfpq's because the model trained on
    // half the corpus prunes with coarser cells
    "q_ann_ivfpq_append" ->
      ("SELECT method, k, n_true, n_hit, recall FROM (VALUES " +
        "('ivfpq_append', 10, CAST(10 AS BIGINT), CAST(3 AS BIGINT), " +
        "CAST(0.3 AS DOUBLE))) AS t(method, k, n_true, n_hit, recall)"),
    // cell-histogram summary of the same deterministic grown index —
    // every value a pinned constant (hash-gated sample, deterministic
    // Lloyd, exact append)
    "q_ann_index_health" ->
      ("SELECT n_cells, n_empty_cells, n_vectors, max_cell, min_cell, " +
        "imbalance FROM (VALUES (CAST(16 AS BIGINT), CAST(0 AS BIGINT), " +
        "CAST(500 AS BIGINT), CAST(46 AS BIGINT), CAST(18 AS BIGINT), " +
        "CAST(1.472 AS DOUBLE))) AS t(n_cells, n_empty_cells, n_vectors, " +
        "max_cell, min_cell, imbalance)"),
    // drift → alarm → rebuild-and-swap lifecycle: deterministic build
    // (hash-gated samples, deterministic Lloyd, vec_id tie-breaks) ⇒
    // every value a pinned constant; booleans derive from the
    // 4-dp-rounded doubles they summarize
    "q_ann_rebuild" ->
      ("SELECT imbalance_drifted, alarm, imbalance_rebuilt, " +
        "alarm_cleared, recall_stale, recall_rebuilt, recovered " +
        "FROM (VALUES (CAST(8.48 AS DOUBLE), true, " +
        "CAST(1.568 AS DOUBLE), true, CAST(0.2 AS DOUBLE), " +
        "CAST(0.5 AS DOUBLE), true)) AS t(imbalance_drifted, alarm, " +
        "imbalance_rebuilt, alarm_cleared, recall_stale, " +
        "recall_rebuilt, recovered)"),
    "q_src_search" ->
      ("SELECT provider, indicator_id, indicator_name FROM (VALUES " +
        "('worldbank', 'SH.DYN.MORT', 'Mortality rate, under-5'), " +
        "('who', 'MDG_0000000001', 'Infant mortality rate')" +
        ") AS t(provider, indicator_id, indicator_name)"),
    // SQL TVF spellings: same expected rows as their factory twins —
    // hash-identical results prove the TVF path binds the same scan
    "q_sql_tvf_worldbank" ->
      ("SELECT indicator_id, indicator_name, country, country_name, " +
        "CAST(year AS INTEGER) AS year, CAST(value AS DOUBLE) AS value FROM (VALUES " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2020, 44440486.0), " +
        "('SP.POP.TOTL', 'Population, total', 'SD', 'Sudan', 2019, 43232954.5)" +
        ") AS t(indicator_id, indicator_name, country, country_name, year, value)"),
    "q_sql_tvf_search" ->
      ("SELECT provider, indicator_id, indicator_name FROM (VALUES " +
        "('worldbank', 'SH.DYN.MORT', 'Mortality rate, under-5'), " +
        "('who', 'MDG_0000000001', 'Infant mortality rate')" +
        ") AS t(provider, indicator_id, indicator_name)"),
    // same golden rows as q_states: the TVF spelling must hash-match the
    // factory spelling, so they share one oracle string
    "q_sql_tvf_states" -> statesOracleSql,
    // n-gram language ID: same (score, lang) argmax as TextOps.langId —
    // struct comparison is field-order lexicographic in BOTH engines, and
    // Spark's greatest(...) over structs == DuckDB's list_max of structs
    "q_lang_id" ->
      ("SELECT doc_id, lang AS declared_lang, " +
        "CASE WHEN m.s > 0 THEN m.l ELSE 'und' END AS predicted_lang " +
        "FROM (SELECT doc_id, lang, list_max([" +
        graft.operators.TextOps.langProfiles.map { case (lang, toks) =>
          "{'s': (" + toks.map(t =>
            s"CASE WHEN contains(' ' || lower(text) || ' ', '$t') " +
              "THEN 1 ELSE 0 END").mkString(" + ") + s"), 'l': '$lang'}"
        }.mkString(", ") +
        "]) AS m FROM documents)"),
    // confusion matrix over the same classifier CTE + share-of-declared
    "q_langid_confusion" ->
      ("WITH p AS (SELECT doc_id, lang AS declared_lang, " +
        "CASE WHEN m.s > 0 THEN m.l ELSE 'und' END AS predicted_lang " +
        "FROM (SELECT doc_id, lang, list_max([" +
        graft.operators.TextOps.langProfiles.map { case (lang, toks) =>
          "{'s': (" + toks.map(t =>
            s"CASE WHEN contains(' ' || lower(text) || ' ', '$t') " +
              "THEN 1 ELSE 0 END").mkString(" + ") + s"), 'l': '$lang'}"
        }.mkString(", ") +
        "]) AS m FROM documents)) " +
        "SELECT declared_lang, predicted_lang, " +
        "CAST(count(*) AS BIGINT) AS n, " +
        "round(CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER " +
        "(PARTITION BY declared_lang) AS DOUBLE), 4) AS share " +
        "FROM p GROUP BY declared_lang, predicted_lang"),
    // winnowing fingerprints (Schleimer et al., SIGMOD'03): see fpCte
    "q_fingerprints" ->
      (fpCte + " SELECT doc_id, fp_hash FROM fp"),
    // cross-document containment: the fingerprint pipeline re-derived in
    // DuckDB end-to-end (hash → winnow → hot-gram prune → pair join →
    // shared / min-size score), same >100-df cap and >=0.5 cutoff
    "q_containment" ->
      (fpCte +
        ", hotf AS (SELECT fp_hash FROM fp GROUP BY fp_hash " +
        "HAVING count(*) > 100), " +
        "p AS (SELECT doc_id, fp_hash FROM fp " +
        "WHERE fp_hash NOT IN (SELECT fp_hash FROM hotf)), " +
        "sz AS (SELECT doc_id, count(*) AS n FROM p GROUP BY doc_id), " +
        "sh AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
        "count(*) AS shared FROM p a JOIN p b ON a.fp_hash = b.fp_hash " +
        "AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
        "SELECT sh.doc_a, sh.doc_b, sh.shared, " +
        s"round($containSqlExpr, 4) AS containment " +
        "FROM sh JOIN sz sa ON sh.doc_a = sa.doc_id " +
        "JOIN sz sb ON sh.doc_b = sb.doc_id " +
        s"WHERE round($containSqlExpr, 4) >= 0.5"),
    // eval containment: winnowed fingerprints of eval docs (id < 10) vs
    // the corpus — shared / |fp(eval)| at the 0.2 default cutoff
    "q_eval_containment" ->
      (fpCte +
        ", ev AS (SELECT doc_id AS eval_id, fp_hash FROM fp " +
        "WHERE doc_id < 10), " +
        "evs AS (SELECT eval_id, count(*) AS n_eval FROM ev GROUP BY 1), " +
        "hits AS (SELECT fp.doc_id, ev.eval_id, count(*) AS shared " +
        "FROM fp JOIN ev ON fp.fp_hash = ev.fp_hash " +
        "WHERE fp.doc_id >= 10 GROUP BY 1, 2) " +
        "SELECT doc_id, eval_id, shared, " +
        "round(CAST(shared AS DOUBLE) / CAST(n_eval AS DOUBLE), 4) " +
        "AS containment FROM hits JOIN evs USING (eval_id) " +
        "WHERE round(CAST(shared AS DOUBLE) / CAST(n_eval AS DOUBLE), 4) " +
        ">= 0.2"),
    // TF-IDF: unnest words → tf/df aggregates → smoothed idf; ln over
    // doubles is the same correctly-rounded libm call in both engines
    "q_tfidf" ->
      (wordCte +
        ", tf AS (SELECT doc_id, word, count(*) AS tf FROM w " +
        "GROUP BY doc_id, word), " +
        "df AS (SELECT word, count(*) AS df FROM tf GROUP BY word), " +
        "n AS (SELECT count(*) AS n_docs FROM documents) " +
        "SELECT tf.doc_id, tf.word, tf.tf, df.df, " +
        "round(CAST(tf.tf AS DOUBLE) * (ln(CAST(n.n_docs + 1 AS DOUBLE) / " +
        "CAST(df.df + 1 AS DOUBLE)) + 1.0), 4) AS tfidf " +
        "FROM tf JOIN df ON tf.word = df.word CROSS JOIN n"),
    // Shannon char entropy, same sorted-distinct fold on both engines:
    // list_sort fixes the summation order, so the double arithmetic is
    // the identical IEEE sequence (DuckDB codepoints == JVM UTF-16 units
    // on this ASCII corpus). Spark's split keeps a trailing '' — both
    // sides filter empties; length(text) is the denominator on both.
    "q_char_entropy" -> {
      val p = "(CAST(len(list_filter(string_split(text, ''), " +
        "x -> x = c)) AS DOUBLE) / CAST(length(text) AS DOUBLE))"
      "SELECT doc_id, round(CASE WHEN length(text) = 0 THEN 0.0 ELSE " +
        "0.0 - list_aggregate(list_transform(list_sort(list_distinct(" +
        s"string_split(text, ''))), c -> $p * log2($p)), 'sum') END, 4) " +
        "AS char_entropy FROM documents"
    },
    // Okapi BM25 (k1=1.2, b=0.75) over fixed query terms, re-derived
    // end-to-end: every intermediate (tf, df, dl, avgdl) is an exact
    // integer-valued double, so only the final ≤3-term sum is
    // order-sensitive (round 4 absorbs the ulp)
    "q_bm25" ->
      (wordCteWith() +
        ", dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1), " +
        "stats AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl, " +
        "CAST(count(*) AS DOUBLE) AS n_docs FROM dl), " +
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM w " +
        "WHERE word IN ('join', 'scan', 'filter') GROUP BY 1, 2), " +
        "df AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM tf " +
        "GROUP BY 1) " +
        "SELECT tf.doc_id, round(sum(" +
        "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * " +
        "CAST(tf AS DOUBLE) * (1.2 + 1.0) / (CAST(tf AS DOUBLE) + " +
        "1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 4) " +
        "AS bm25 FROM tf JOIN df USING (word) JOIN dl USING (doc_id) " +
        "CROSS JOIN stats GROUP BY tf.doc_id"),
    // RRF fusion: both rankings re-derived in full (the q_bm25 and
    // q_tfidf pipelines as CTEs), rank windows capped at the shortlist,
    // 1/(60+rank) contributions summed across the FULL-joined lists
    "q_rrf_fusion" ->
      (wordCteWith() +
        ", dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY 1), " +
        "stats AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl, " +
        "CAST(count(*) AS DOUBLE) AS n_docs FROM dl), " +
        "qtf AS (SELECT doc_id, word, count(*) AS tf FROM w " +
        "WHERE word IN ('join', 'scan', 'filter') GROUP BY 1, 2), " +
        "qdf AS (SELECT word, CAST(count(*) AS DOUBLE) AS df FROM qtf " +
        "GROUP BY 1), " +
        "b25 AS (SELECT qtf.doc_id, round(sum(" +
        "ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) * " +
        "CAST(tf AS DOUBLE) * (1.2 + 1.0) / (CAST(tf AS DOUBLE) + " +
        "1.2 * (1.0 - 0.75 + 0.75 * CAST(dl AS DOUBLE) / avgdl))), 4) " +
        "AS bm25 FROM qtf JOIN qdf USING (word) JOIN dl USING (doc_id) " +
        "CROSS JOIN stats GROUP BY qtf.doc_id), " +
        "atf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2), " +
        "adf AS (SELECT word, count(*) AS df FROM atf GROUP BY 1), " +
        "n AS (SELECT count(*) AS n_docs FROM documents), " +
        "ti AS (SELECT atf.doc_id, round(CAST(atf.tf AS DOUBLE) * " +
        "(ln(CAST(n.n_docs + 1 AS DOUBLE) / CAST(adf.df + 1 AS DOUBLE)) " +
        "+ 1.0), 4) AS tfidf FROM atf JOIN adf ON atf.word = adf.word " +
        "CROSS JOIN n WHERE atf.word IN ('join', 'scan', 'filter')), " +
        "ts AS (SELECT doc_id, round(sum(tfidf), 4) AS s FROM ti " +
        "GROUP BY doc_id), " +
        "ra AS (SELECT * FROM (SELECT doc_id, row_number() OVER " +
        "(ORDER BY bm25 DESC, doc_id) AS rank_bm25 FROM b25) " +
        "WHERE rank_bm25 <= 20), " +
        "rb AS (SELECT * FROM (SELECT doc_id, row_number() OVER " +
        "(ORDER BY s DESC, doc_id) AS rank_tfidf FROM ts) " +
        "WHERE rank_tfidf <= 20) " +
        "SELECT coalesce(ra.doc_id, rb.doc_id) AS doc_id, ra.rank_bm25, " +
        "rb.rank_tfidf, round(coalesce(1.0 / (60 + ra.rank_bm25), 0) + " +
        "coalesce(1.0 / (60 + rb.rank_tfidf), 0), 6) AS rrf_score " +
        "FROM ra FULL JOIN rb ON ra.doc_id = rb.doc_id"),
    "q_top_terms" ->
      (wordCte +
        ", c AS (SELECT lang, word, count(*) AS n FROM w " +
        "GROUP BY lang, word) " +
        "SELECT lang, word, n, rank FROM " +
        "(SELECT lang, word, n, CAST(row_number() OVER (PARTITION BY lang " +
        "ORDER BY n DESC, word ASC) AS INTEGER) AS rank FROM c) t " +
        "WHERE rank <= 10"),
    // KMV sketch: EXACT below k by construction (it keeps all hashes until
    // k distinct are seen — the contract KmvSketchSpec pins). The oracle SF
    // has 150 distinct users per event_type < k=256, so count(DISTINCT) is
    // a true oracle of the sketch here; the estimator regime (1500 > k at
    // the bench SF) is covered by the spec's error-bound test.
    "q_kmv_distinct" ->
      ("SELECT event_type, count(DISTINCT user_id) AS approx_users " +
        "FROM events GROUP BY event_type"),
    // sketch-table estimates, exact-below-k regime (distinct texts per
    // scope << k=65536, so the stored states hold every distinct hash and
    // estimates/inclusion-exclusion overlaps are exact counts — same
    // oracle pattern as q_kmv_distinct; estimator-regime error bounds and
    // the state merge law are pinned in KmvSketchSpec)
    "q_sketch_sources" ->
      ("SELECT source AS scope, CAST(count(DISTINCT text) AS BIGINT) " +
        "AS est_distinct FROM documents GROUP BY source " +
        "UNION ALL SELECT '__ALL__' AS scope, " +
        "CAST(count(DISTINCT text) AS BIGINT) AS est_distinct " +
        "FROM documents"),
    // merging the two persisted snapshot sketch tables must equal the
    // whole-corpus distinct counts (the snapshots partition the corpus
    // by doc_id parity; states stay exact below k)
    "q_sketch_snapshot_merge" ->
      ("SELECT source AS scope, CAST(count(DISTINCT text) AS BIGINT) " +
        "AS est_distinct FROM documents GROUP BY source " +
        "UNION ALL SELECT '__ALL__' AS scope, " +
        "CAST(count(DISTINCT text) AS BIGINT) AS est_distinct " +
        "FROM documents"),
    // bottom-k quantile sketch, exact-below-k regime: the state holds
    // every (hash, n_chars) row, and quantileExpr's ceil(q*n) discrete
    // rule is quantile_disc's — so sketch quantiles ARE the exact ones
    "q_quantile_sources" ->
      ("SELECT source AS scope, " +
        "CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS p25, " +
        "CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) AS p50, " +
        "CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS p75 " +
        "FROM documents GROUP BY source " +
        "UNION ALL SELECT '__ALL__' AS scope, " +
        "CAST(quantile_disc(n_chars, 0.25) AS DOUBLE) AS p25, " +
        "CAST(quantile_disc(n_chars, 0.5) AS DOUBLE) AS p50, " +
        "CAST(quantile_disc(n_chars, 0.75) AS DOUBLE) AS p75 " +
        "FROM documents"),
    // sketch cube rollup, exact-below-k regime: every level's merged
    // state still holds every distinct hash, so each cell is the exact
    // distinct count the corresponding GROUP BY would produce
    "q_sketch_rollup" ->
      ("SELECT source AS scope_source, lang AS scope_lang, " +
        "CAST(count(DISTINCT text) AS BIGINT) AS est_distinct " +
        "FROM documents GROUP BY source, lang " +
        "UNION ALL SELECT source, '__ALL__', " +
        "CAST(count(DISTINCT text) AS BIGINT) FROM documents " +
        "GROUP BY source " +
        "UNION ALL SELECT '__ALL__', lang, " +
        "CAST(count(DISTINCT text) AS BIGINT) FROM documents " +
        "GROUP BY lang " +
        "UNION ALL SELECT '__ALL__', '__ALL__', " +
        "CAST(count(DISTINCT text) AS BIGINT) FROM documents"),
    // join pre-flight, exact-below-k regime: distincts and overlap are
    // exact, est_rows is the same arithmetic over the exact inputs
    "q_join_estimate" ->
      ("WITH ka AS (SELECT CAST(count(*) AS BIGINT) AS n_a, " +
        "CAST(count(DISTINCT o_custkey) AS BIGINT) AS est_keys_a " +
        "FROM orders), " +
        "kb AS (SELECT CAST(count(*) AS BIGINT) AS n_b, " +
        "CAST(count(DISTINCT c_custkey) AS BIGINT) AS est_keys_b " +
        "FROM customer), " +
        "ov AS (SELECT CAST(count(*) AS BIGINT) AS est_key_overlap " +
        "FROM (SELECT DISTINCT o_custkey FROM orders " +
        "INTERSECT SELECT DISTINCT c_custkey FROM customer)) " +
        "SELECT n_a, n_b, est_keys_a, est_keys_b, est_key_overlap, " +
        "round(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * " +
        "CAST(est_key_overlap AS DOUBLE) / " +
        "(CAST(est_keys_a AS DOUBLE) * CAST(est_keys_b AS DOUBLE)), 4) " +
        "AS est_rows FROM ka, kb, ov"),
    // range selectivity, exact-below-k regime: the sample IS the
    // population, so the fraction is the exact row fraction
    "q_range_estimate" ->
      ("SELECT source AS scope, " +
        "round(CAST(sum(CASE WHEN n_chars BETWEEN 200 AND 400 " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) " +
        "AS selectivity FROM documents GROUP BY source " +
        "UNION ALL SELECT '__ALL__' AS scope, " +
        "round(CAST(sum(CASE WHEN n_chars BETWEEN 200 AND 400 " +
        "THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4) " +
        "AS selectivity FROM documents"),
    // priority sampling, exact-below-n regime: the state holds every
    // (priority, id, weight) row, τ = 0, and the DLT estimator
    // Σ max(w, τ) collapses to the exact BIGINT sum
    "q_priority_totals" ->
      ("SELECT source AS scope, " +
        "CAST(sum(n_chars) AS DOUBLE) AS est_total_chars " +
        "FROM documents GROUP BY source " +
        "UNION ALL SELECT '__ALL__' AS scope, " +
        "CAST(sum(n_chars) AS DOUBLE) AS est_total_chars " +
        "FROM documents"),
    // bloom guard is EXACT by composition (no false negatives; false
    // positives die in the confirm join) — the oracle is the plain
    // blocklist anti-semantics the bloom accelerates
    "q_bloom_guard" ->
      ("SELECT d.doc_id, d.source FROM documents d " +
        "WHERE d.doc_id % 7 <> 0 AND NOT EXISTS (" +
        "SELECT 1 FROM documents b " +
        "WHERE b.doc_id % 7 = 0 AND b.text = d.text)"),
    "q_sketch_overlap" ->
      ("WITH s AS (SELECT DISTINCT event_type, user_id FROM events), " +
        "c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM s " +
        "GROUP BY event_type), " +
        "ov AS (SELECT a.event_type AS type_a, b.event_type AS type_b, " +
        "CAST(count(*) AS BIGINT) AS est_overlap FROM s a JOIN s b " +
        "ON a.user_id = b.user_id AND a.event_type < b.event_type " +
        "GROUP BY a.event_type, b.event_type) " +
        "SELECT ov.type_a, ov.type_b, ca.n AS est_a, cb.n AS est_b, " +
        "ov.est_overlap FROM ov " +
        "JOIN c ca ON ca.event_type = ov.type_a " +
        "JOIN c cb ON cb.event_type = ov.type_b"),
    // Misra-Gries heavy hitters, exact-below-k regime (distinct sources
    // <= k=64, so no decrement/truncation ever fires and the sketch IS
    // the histogram — same oracle pattern as q_kmv_distinct; the
    // estimate-regime N/(k+1) bounds are pinned in HeavyHittersSpec)
    "q_heavy_hitters" ->
      "SELECT source, count(*) AS n_docs FROM documents GROUP BY source",
    // LSH-bucketed k-NN join, fully re-derived in DuckDB: identical
    // hyperplane constants → identical buckets (see bucketSqlExpr), then
    // the same per-vector top-5 window over in-bucket cosine
    "q_knn_join" ->
      ("WITH b AS (SELECT vec_id, e, " + bucketSqlExpr(8) + " AS bucket " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings) t0), " +
        cappedBucketCte +
        "p AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, " +
        cosineSql("a.e", "c.e") + " AS cosine " +
        "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id) " +
        "SELECT vec_a, vec_b, cosine, rank FROM " +
        "(SELECT vec_a, vec_b, cosine, CAST(row_number() OVER " +
        "(PARTITION BY vec_a ORDER BY cosine DESC, vec_b ASC) AS INTEGER) " +
        "AS rank FROM p) t WHERE rank <= 5"),
    // diversity sampling: buckets + sizes re-derived, the same numeric
    // md5 gate (first 8 hex chars as a uniform [0, 2^32) draw) under
    // the per-bucket rate — strict-< on identical IEEE doubles
    "q_diversity_sample" ->
      ("WITH b AS (SELECT vec_id, label, e, " + bucketSqlExpr(8) +
        " AS bucket FROM (SELECT vec_id, label, " +
        "CAST(embedding AS DOUBLE[]) AS e FROM embeddings) t0), " +
        "s AS (SELECT bucket, count(*) AS bucket_n FROM b GROUP BY 1) " +
        "SELECT b.vec_id, b.label, b.bucket, s.bucket_n " +
        "FROM b JOIN s ON s.bucket = b.bucket " +
        "WHERE CAST(CAST('0x' || substr(md5(CAST(b.vec_id AS VARCHAR) || " +
        "'graft-diversity-v1'), 1, 8) AS BIGINT) AS DOUBLE) < " +
        "least(CAST(1.0 AS DOUBLE), CAST(8.0 AS DOUBLE) / " +
        "CAST(s.bucket_n AS DOUBLE)) * CAST(4294967296.0 AS DOUBLE)"),
    // dedup-graph QA over the SAME re-derived k-NN graph, undirected:
    // exact triangle closure (edges src<dst; triangle a<b<c counted once
    // as (a,b)+(b,c)+(a,c)) and unrolled fixed-iteration PageRank
    "q_graph_triangles" ->
      (knnEdgeCte +
        ", deg AS (SELECT node, count(*) AS deg FROM " +
        "(SELECT src AS node FROM e UNION ALL SELECT dst FROM e) t " +
        "GROUP BY 1), " +
        "tri AS (SELECT e1.src AS a, e1.dst AS b, e2.dst AS c " +
        "FROM e e1 JOIN e e2 ON e2.src = e1.dst " +
        "JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst), " +
        "pn AS (SELECT node, count(*) AS n_tri FROM " +
        "(SELECT a AS node FROM tri UNION ALL SELECT b FROM tri " +
        "UNION ALL SELECT c FROM tri) t GROUP BY 1) " +
        "SELECT d.node, d.deg, CAST(COALESCE(pn.n_tri, 0) AS BIGINT) " +
        "AS n_tri FROM deg d LEFT JOIN pn ON pn.node = d.node"),
    "q_graph_pagerank" -> pageRankOracleSql(10),
    "q_graph_ppr" -> pprOracleSql(10, 0),
    // batch twin of the tumbling-window stream stats: epoch-aligned
    // hour buckets (time_bucket == Spark's window()), decimal-exact sums
    "q_windowed_stats" ->
      ("SELECT strftime(time_bucket(INTERVAL '1 hour', ts), " +
        "'%Y-%m-%d %H:%M:%S') AS window_start, " +
        "strftime(time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour', " +
        "'%Y-%m-%d %H:%M:%S') AS window_end, " +
        "event_type, count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value, " +
        "count(DISTINCT user_id) AS n_users " +
        "FROM events GROUP BY 1, 2, 3"),
    // hourly LOCF resample: epoch-hour LONG buckets (engine-exact), the
    // same rn-desc last-observation rule, dense per-user grid, and
    // IGNORE NULLS carry-forward — carried values are exact copies of
    // parquet doubles, so no rounding is needed anywhere
    "q_resample_locf" ->
      ("WITH e AS (SELECT user_id, event_id, value, ts, " +
        "CAST(floor(epoch(ts) / 3600) AS BIGINT) AS hb FROM events), " +
        "h AS (SELECT user_id, hb, value AS v FROM (SELECT user_id, hb, " +
        "value, row_number() OVER (PARTITION BY user_id, hb " +
        "ORDER BY ts DESC, event_id DESC) AS rn FROM e) t WHERE rn = 1), " +
        "b AS (SELECT user_id, min(hb) AS lo, max(hb) AS hi FROM e " +
        "GROUP BY user_id), " +
        "g AS (SELECT user_id, unnest(range(lo, hi + 1)) AS hb FROM b), " +
        "j AS (SELECT g.user_id, g.hb, h.v FROM g LEFT JOIN h " +
        "ON h.user_id = g.user_id AND h.hb = g.hb) " +
        "SELECT user_id, hb AS hour_bucket, " +
        "last_value(v IGNORE NULLS) OVER (PARTITION BY user_id " +
        "ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) " +
        "AS value, v IS NULL AS filled FROM j"),
    // embedding near-dup pairs: same bucket re-derivation, threshold filter
    "q_embed_neardup" ->
      ("WITH b AS (SELECT vec_id, e, " + bucketSqlExpr(8) + " AS bucket " +
        "FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings) t0), " +
        cappedBucketCte.stripSuffix(", ") + " " +
        "SELECT a.vec_id AS vec_a, c.vec_id AS vec_b, " +
        cosineSql("a.e", "c.e") + " AS cosine " +
        "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id < c.vec_id " +
        "WHERE " + cosineSql("a.e", "c.e") + " >= 0.3"),
    // SemDeDup clusters: RECURSIVE transitive closure over the exact same
    // bucketed cosine pair graph (cluster_id = min reachable vec_id),
    // mirroring the q_dedup_clusters oracle pattern
    "q_embed_clusters" ->
      ("WITH RECURSIVE b AS (SELECT vec_id, e, " + bucketSqlExpr(8) +
        " AS bucket FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings) t0), " +
        cappedBucketCte +
        "pairs AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b " +
        "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id < c.vec_id " +
        "WHERE " + cosineSql("a.e", "c.e") + " >= 0.3), " +
        "edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs " +
        "UNION ALL SELECT vec_b, vec_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e2.dst FROM walk w JOIN edges e2 " +
        "ON e2.src = w.u), " +
        "comp AS (SELECT v AS vec_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT vec_id, cluster_id, " +
        "count(*) OVER (PARTITION BY cluster_id) AS cluster_n FROM comp"),
    // keep-filter twin: embeddings minus non-canonical cluster members
    "q_embed_cluster_keep" ->
      ("WITH RECURSIVE b AS (SELECT vec_id, e, " + bucketSqlExpr(8) +
        " AS bucket FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e " +
        "FROM embeddings) t0), " +
        cappedBucketCte +
        "pairs AS (SELECT a.vec_id AS vec_a, c.vec_id AS vec_b " +
        "FROM bc a JOIN bc c ON a.bucket = c.bucket AND a.vec_id < c.vec_id " +
        "WHERE " + cosineSql("a.e", "c.e") + " >= 0.3), " +
        "edges AS (SELECT vec_a AS src, vec_b AS dst FROM pairs " +
        "UNION ALL SELECT vec_b, vec_a FROM pairs), " +
        "walk(v, u) AS (SELECT src, dst FROM edges " +
        "UNION SELECT w.v, e2.dst FROM walk w JOIN edges e2 " +
        "ON e2.src = w.u), " +
        "comp AS (SELECT v AS vec_id, least(v, min(u)) AS cluster_id " +
        "FROM walk GROUP BY v) " +
        "SELECT emb.vec_id, emb.label FROM embeddings emb " +
        "WHERE NOT EXISTS (SELECT 1 FROM comp c " +
        "WHERE c.vec_id = emb.vec_id AND c.cluster_id <> emb.vec_id)"),
    // as-of join: DuckDB's NATIVE ASOF LEFT JOIN is the oracle for the
    // union+window rewrite (purchases deduped per (user_id, ts) on both
    // sides so the as-of match is unique)
    "q_asof_join" ->
      ("SELECT l.event_id, l.user_id, " +
        "strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts, l.event_type, " +
        "strftime(r.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts, " +
        "r.value AS purchase_value " +
        "FROM events l ASOF LEFT JOIN " +
        "(SELECT user_id, ts, max(value) AS value FROM events " +
        "WHERE event_type = 'purchase' GROUP BY user_id, ts) r " +
        "ON l.user_id = r.user_id AND l.ts >= r.ts"),
    // attribution interval join (batch twin of the stream-stream join):
    // inclusive [click, click + 30 min] bounds on both engines
    "q_attribution" ->
      ("SELECT c.event_id AS click_id, p.event_id AS purchase_id, " +
        "c.user_id, epoch_us(p.ts) - epoch_us(c.ts) AS gap_us, " +
        "p.value AS purchase_value FROM events c JOIN events p " +
        "ON c.event_type = 'click' AND p.event_type = 'purchase' " +
        "AND p.user_id = c.user_id " +
        "AND p.ts BETWEEN c.ts AND c.ts + INTERVAL 30 MINUTE"),
    // range join: the binned equi-join rewrite must equal the plain
    // inequality join (which DuckDB runs natively as an IEJoin)
    "q_range_join" ->
      ("SELECT e.event_id AS error_id, c.event_id AS click_id, " +
        "epoch_us(c.ts) - epoch_us(e.ts) AS gap_us " +
        "FROM events e JOIN events c ON e.event_type = 'error' " +
        "AND c.event_type = 'click' " +
        "AND c.ts BETWEEN e.ts - INTERVAL 60 SECOND " +
        "AND e.ts + INTERVAL 60 SECOND"),
    // time_bucket ≡ Spark's tumbling window start; same smoothing, same
    // densified window×type grid, same KL reduction
    "q_type_drift" ->
      ("WITH g AS (SELECT event_type, count(*) AS n_g FROM events " +
        "GROUP BY 1), " +
        "tot AS (SELECT CAST(sum(n_g) AS DOUBLE) AS n, " +
        "CAST(count(*) AS DOUBLE) AS t FROM g), " +
        "w AS (SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, " +
        "event_type, count(*) AS n_w FROM events GROUP BY 1, 2), " +
        "wins AS (SELECT ws, CAST(sum(n_w) AS DOUBLE) AS n_tot FROM w " +
        "GROUP BY 1), " +
        "grid AS (SELECT wins.ws, wins.n_tot, g.event_type, g.n_g, " +
        "CAST(coalesce(w.n_w, 0) AS DOUBLE) AS n_w FROM wins " +
        "CROSS JOIN g LEFT JOIN w ON w.ws = wins.ws " +
        "AND w.event_type = g.event_type), " +
        "p AS (SELECT ws, n_tot, " +
        "(n_w + 0.5) / (n_tot + 0.5 * tot.t) AS pw, " +
        "(n_g + 0.5) / (tot.n + 0.5 * tot.t) AS pg FROM grid, tot), " +
        "k AS (SELECT ws, n_tot, sum(pw * ln(pw / pg)) AS kl FROM p " +
        "GROUP BY ws, n_tot) " +
        "SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start, " +
        "CAST(n_tot AS BIGINT) AS n_events, round(kl, 6) AS kl, " +
        "kl > 0.2 AS drifted FROM k"),
    "q_sessionize" ->
      ("WITH m AS (SELECT user_id, ts, value, " +
        "CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL " +
        "OR epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id ORDER BY ts)) " +
        "> 1800000 THEN 1 ELSE 0 END AS new_session FROM events), " +
        "g AS (SELECT user_id, ts, value, " +
        "sum(new_session) OVER (PARTITION BY user_id ORDER BY ts " +
        "ROWS UNBOUNDED PRECEDING) AS session_no FROM m) " +
        "SELECT user_id, " +
        "strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start, " +
        "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_end, " +
        "count(*) AS n_events, " +
        "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value " +
        "FROM g GROUP BY user_id, session_no"),
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
    "q_stream_neardup" -> streamNearDupGolden
  )

  /** Golden for q_stream_neardup at the oracle SF (see comment above). */
  private val streamNearDupGolden: String =
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
  private val simhashGolden: String =
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
