#!/usr/bin/env python3
"""Assemble BENCH_sf10_r16.json — the second-decade evidence artifact
(r13 verdict task #1; extended r15 per r14 verdict task #8: the as-of /
overlap / privacy / Count-Min / unigram / funnel families re-measured
at n=9 medians on all three twins, plus the new q_asof_auto router row,
q_range_join, and the asof_skew probe; extended r16: the three outer
band-join rows, the full asOfJoinAuto probe router, and the twin
re-measures for the rows whose r16 plans changed — q_asof_auto,
q_overlap_join, q_range_join).

Reads the committed twin ledgers (bench_sfx01/sfx1/sfx10_{medians,
build_costs}.json), this round's supplemental rows (bench14_sfx*_
medians.json from the SPARK_GRAFT_ONLY runs), and the probe outputs
passed on stdin or inlined below (pair_volume / bag_prune / scale_probe
JSON lines), then emits one self-describing artifact: per-query warm +
build medians at the 1x/10x/100x generator twins, both decade ratios,
and the adjudicated scaling class for every heavy family.

Usage: python3 tools/make_bench_sf10.py <probe_lines.jsonl> > BENCH_sf10_r14.json
"""
import json, sys, os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

def load(name):
    p = os.path.join(ROOT, name)
    return json.load(open(p)) if os.path.exists(p) else {}

def med(d, q):
    v = d.get(q)
    if isinstance(v, dict):
        return v.get('med')
    return v

# committed r13 ledgers + r14 supplemental ONLY-run ledgers (merged;
# supplemental rows only ADD queries the r13 set did not carry)
def merged(suffix):
    out = {}
    # bench15a LAST: its n=9 rows override the r14 min-of-3 supplemental
    # rows for the re-measured families (r14 verdict task #8)
    for prefix in ('bench', 'bench14', 'bench14b', 'bench14c', 'bench14d',
                   'bench14e', 'bench14g', 'bench14h', 'bench14i', 'bench14j',
                   'bench15a', 'bench15b', 'bench15d', 'bench16b',
                   'bench16c', 'bench16d'):
        out.update(load(f'{prefix}_{suffix}.json'))
    return out

m01, m1, m10 = (merged(f'{s}_medians') for s in ('sfx01', 'sfx1', 'sfx10'))
b01, b1, b10 = (merged(f'{s}_build_costs')
                for s in ('sfx01', 'sfx1', 'sfx10'))

# adjudicated scaling class per query (the honesty ledger: 'linear'
# families are proven two decades deep; the three non-linear classes
# name WHY and what the in-repo scale-safe path is)
CLASSES = {
    'q_edit_distance': ('enumeration-bound', 'banded candidate enumeration is Theta(sum_band n_b^2); length diversity is fixed so pairs grow x100/decade (pair_volume rows). Guarded since r14 (PairGuard, default budget fails the sfx10 twin in the first second). Scale-safe: simHashPairs or tighter maxLenDiff.'),
    'q_setsim_pairs': ('collision-quadratic', 'Delta=2 pair-key document frequencies grow with n once the shingle domain saturates, so sum_key df^2 turns quadratic (x29/decade, pair_volume rows). Guarded since r14 (PairGuard). Scale-safe: minHashPairs (band keys hash whole sets; domain never saturates).'),
    'q_image_neardup': ('output-bound', 'the 256-periodic twin has ~n^2/512 TRUE pairs; no algorithm emits a quadratic pair set in subquadratic time. Production default on dup-heavy corpora is q_image_keep (distinct-dHash reduction, near-flat below).'),
    'q_image_keep': ('linear', 'reduces to DISTINCT dHashes (d = content diversity, corpus-independent) before any join; the linear-scale keep form of image near-dup.'),
    'q_minhash_pairs': ('linear', 'the scale-out backbone: LSH band keys hash whole sets, domain never saturates; near-flat both decades (sub-second absolute).'),
    'q_minhash_keep': ('linear', 'keep form of the backbone; near-flat.'),
    'q_simhash_pairs': ('acceptable-superlinear', 'signature keys grow with content so buckets do not fully saturate; x7.2/decade at the second decade.'),
    'q_stream_neardup': ('acceptable-superlinear', 'x5.5/decade warm.'),
    'q_repeated_spans': ('linear', 'x2.8 at x10 data, two decades deep.'),
    'q_span_guard': ('linear', 'x1.9/decade, two decades deep.'),
    'q_containment': ('linear', 'winnowing fingerprint join; df^2 term bounded by fingerprint sampling (verdict task #7 row).'),
    'q_graph_pagerank': ('linear', 'iterative message passing, fixed iteration count (verdict task #7 row).'),
    'q_graph_ppr': ('linear', 'iterative, fixed iterations (verdict task #7 row).'),
    'q_decontaminate_bloom': ('linear', 'bloom-state probe; map-side (verdict task #7 row).'),
    'q_priority_totals': ('linear', 'stored-state merge; near-flat.'),
    'q_quantile_sources': ('linear', 'stored-state merge; near-flat.'),
    'q_sketch_snapshot_merge': ('linear', 'stored-state reads; FLAT (x0.87) - the 100 TB steady-state shape.'),
    'q_kanon_release': ('linear', 'one shuffle to the distinct-activity grain, then group-level ladder rollups bounded by types x time buckets (privacy family); r15 n=9: x2.0/x3.5 per decade - the second decade carries the countDistinct rollup constants at 32 partitions, volume term stays the single grain shuffle.'),
    'q_noisy_hist': ('linear', 'one groupBy; noise applied at group grain post-aggregate, O(cells) never O(rows).'),
    'q_cm_error_bound': ('linear', 'one shuffle carrying a constant-size counter array per group; probes are literal-index column reads (sketch family, added late r14).'),
    'q_unigram_vocab': ('linear', 'one distributed word-count; EM runs on the bounded distinct-word dictionary, corpus-size-independent after the aggregate (tokenizer family, added late r14).'),
    'q_cm_rare_ratio': ('linear', 'native cm_estimate probe scores every token map-side inside codegen; the exact-join half exists for the contract only (added late r14).'),
    'q_sql_range_join': ('output-bound', 'the +-60s proximity band over events with a FIXED time range: true pairs are n_err*n_click*(band/range) = Theta(n^2) by density - same class as q_image_neardup, a property of the QUERY, not the rewrite (the rule only changes the plan from BNLJ to the binned equi-join). r16 replaces the r14 stated exclusion with a MEASURED x100 row: 3.80 s counting the actual 185.5M true pairs (2.0M errors x 2.0M clicks x 4.6e-5 measured band density - the old 1.6e9 estimate used a ~9x-stale density; the binned equi-join streams quadratic output through codegen count at ~60M pairs/s on local[32]). Production callers still aggregate the pairs or band-join a bounded reference rather than materializing them.'),
    'q_overlap_join': ('linear', 'interval x interval overlap via the canonical-bin equi-join: candidates are Sum_(bin,part) n_a*n_b with li-per-part and dates-per-bin both corpus-constant, so volume is linear; r16 re-measure with the SINGLE-ACTION guard (both sides priced in one union+grouped-SUM job, was two - gate median 2.88 -> 2.25 s, back inside the r14 band) and saturating span arithmetic: twins 1.39 -> 3.57 -> 35.7 s (x2.6/x10.0) - the second decade is shuffle-spill constants at local[32] (60M exploded rows / 32 partitions), consistent with r15 x100 34.0 s on a slower host; cluster partition counts scale with input.'),
    'q_asof_join': ('linear', 'compose form (union+window): one codegen window pass over the keyed shuffle; x1.4/x2.8 per decade, the local wall-clock default at every measured scale (as-of family, added late r14).'),
    'q_asof_exec': ('linear', 'custom sort-merge SparkPlan: two narrow shuffles + O(1)-state merge; r15 n=9: x1.7/x2.7 per decade (merge path pinned via autoBroadcast=false). Pays interpreted-merge constants vs the codegen window locally; its value is plan composability (zero-exchange when pre-partitioned, (keys, ts) ordering propagates to downstream windows) - same oracle, same rows. Hot-key skew path since r15: the factory auto-routes to the broadcast exec under the threshold, asOfJoinSalted covers large skewed rights (asof_skew probe rows below).'),
    'q_asof_bucketed': ('linear', 'the r15 ts-range-split row: join key (keys, floor(ts/1h)) with one carry row per bucket, the bucket grain persisted once and a single spine distinct; x2.0/x3.1 per decade at n=9 - the merge exec family plus the spine pass (x100: 5.4 s vs exec 2.4 s on uniform keys), the deliberate price of hot-key time-axis parallelism the flat exec cannot have (asof_skew probe: x2.85 vs salting x4.48 of uniform in the heavy-right skew regime this operator exists for).'),
    'q_asof_salted': ('linear', 'the r15 salted-skew row on UNIFORM twin keys (the oracle workload; the 90%-hot-key economics live in the asof_skew probe rows): left salted x8, right replicated x8, merge on (keys, salt); x1.9/x3.6 per decade at n=9 - the merge exec family paying the x8 right replication (x100: 3.4 s vs exec 2.4 s), the deliberate price that buys hot-key parallelism when skew is present.'),
    'q_asof_auto': ('linear', 'r16: the FULL measured router (asOfJoinAuto) - a sampled pre-flight probe (per-key counts -> hottest share + ts span on the left, count on the right) picks broadcast / exec / salted / bucketed and sizes salts/bucketWidth from the committed r15 asof_skew crossovers; broadcast additionally requires the PROBED row count under a 1M cap (the stats-underestimate failure mode). Twins 0.68 -> 2.46 -> 3.86 s (single-action probe, late r16: both sides priced in ONE tagged-union aggregate job, worth -17% at x100 where scan scheduling dominates): the uniform-key twin routes broadcast at x1 and exec beyond, so the delta vs q_asof_exec (~2.4 s at x100) is the probe itself - one 5%-sampled pass over each side in one job, the PairGuard economics: pure overhead when keys are uniform, but it is what catches the 90%-hot-key regime where the wrong plan costs x5.5-7.0 (probe rows below); callers who know their regime call the explicit path (all four oracle-checked against the same DuckDB ASOF).'),
    'q_range_join': ('output-bound', 'Scala-API twin of q_sql_range_join (same +-60s proximity band, intervalJoin instead of the optimizer rule): same fixed-time-range density argument, so true pairs are Theta(n^2); r16 twins with the single-action saturating guard: 0.33 -> 0.53 -> 2.98 s, the x100 counting the measured 185.5M true pairs (the r14/r15 stated exclusion is retired - see q_sql_range_join). The guard pre-flight is one map-side SUM over probe intervals with try_add/try_subtract saturation.'),
    'q_quality_funnel': ('linear', 'per-row signals bound once below the aggregate; r15 n=9: x1.2/x2.5 per decade, sub-second absolute at x100.'),
    'q_edit_estimate': ('linear', 'the PairGuard pre-flight itself as a gate row: one length-histogram aggregate; FLAT across both decades (0.08 -> 0.06 s) because the histogram is bounded by distinct lengths, not corpus size.'),
    'q_asof_forward': ('linear', 'forward (next-row) direction of the sort-merge exec: descending-ts merge, same shape - x4.0 then x1.8/decade (short-run variance dominates the absolute sub-4s numbers). The only oracle-pinned forward as-of (DuckDB ASOF with the inequality flipped).'),
    'q_asof_tolerance': ('linear', 'sort-merge exec + tolerance check; x1.9/x2.7 per decade, same shape as q_asof_exec.'),
    'q_stream_asof': ('linear', 'the broadcast contract done RIGHT: keyless as-of against a day-grain reference whose size is O(days), corpus-independent - x1.7/x2.8 per decade, all growth on the left scan. Streaming form (stream-static as-of, EventStream.asOfEnrichStream) is spec-pinned equal.'),
    'q_sql_range_join_left': ('output-bound', 'r16: LEFT OUTER band join through the rule (keep-unmatched attribution, +-2 s band) - output is the Theta(n) unmatched errors plus a Theta(n^2)-by-density pair term the narrow band keeps second-order through both measured decades: 0.22 -> 0.49 -> 1.73 s (x2.2/x3.6). Without the r16 join-type extension this exact SQL planned as BroadcastNestedLoopJoin.'),
    'q_sql_range_join_right': ('output-bound', 'r16: RIGHT OUTER band join - the rule mirrors the band and swaps child roles so the generate lands on the non-preserved side; 0.21 -> 0.56 -> 1.83 s (x2.7/x3.3), same density argument as the LEFT form.'),
    'q_sql_range_join_full': ('output-bound', 'r16: FULL OUTER band join = binned LEFT OUTER union mirrored binned LEFT ANTI (unmatched rights null-extended exactly once); 0.29 -> 0.70 -> 3.44 s (x2.4/x4.9) - roughly the LEFT and RIGHT forms added, as the union construction predicts.'),
    'q_asof_broadcast': ('broadcast-contract', 'map-side enrichment, ZERO left shuffle/sort (spec-pinned plan). The twin GROWS the right side with n (purchases ~ n/5, 2M rows at x100), deliberately violating the small-right contract to measure the envelope: x2.6 then x5.8/decade, the second decade dominated by the per-execution index rebuild of the oversized right side - when the right grows, the sort-merge exec (2.2 s) or compose (0.6 s) is the path. Two measured build-sharing bugs fixed en route: per-task index duplication OOM-ed an 8g heap (32 concurrent 2M-row builds), then an identity-keyed cache missed per-task-deserialized Broadcast handles and serialized 32 redundant builds behind the lock (4.4 s at x10); keying by the BlockManager-cached value array restores one build per executor (0.9 s at x10, 5.4 s at x100).'),
}

queries = {}
for q, (cls, note) in CLASSES.items():
    w01, w1, w10 = med(m01, q), med(m1, q), med(m10, q)
    c01, c1, c10 = b01.get(q), b1.get(q), b10.get(q)
    row = {
        'warm_med_s': {'x1': w01, 'x10': w1, 'x100': w10},
        'build_rep0_s': {'x1': c01, 'x10': c1, 'x100': c10},
        'class': cls, 'note': note,
    }
    if w01 and w1:
        row['warm_decade1'] = round(w1 / w01, 2)
    if w1 and w10:
        row['warm_decade2'] = round(w10 / w1, 2)
    if c1 and c10:
        row['build_decade2'] = round(c10 / c1, 2)
    queries[q] = row

probes = {'pair_volume': [], 'bag_prune': [], 'scale_probe': [],
          'asof_skew': []}
# always carry the committed prior-round probe rows forward (a ledger-
# extension rerun must not drop measured probes), then append any fresh
# lines — DEDUPED on the full normalized row (r15 advice fix: a fresh
# probe file re-containing an already-committed row must not silently
# duplicate it in the evidence artifact)
_seen = set()
def _add(kind, row):
    key = json.dumps(row, sort_keys=True)
    if key not in _seen:
        _seen.add(key)
        probes.setdefault(kind, []).append(row)

prev = load('BENCH_sf10_r15.json')  # r16 carries r15's committed probe rows
if isinstance(prev.get('probes'), dict):
    for k, v in prev['probes'].items():
        for row in v:
            _add(k, row)
if len(sys.argv) > 1:
    for line in open(sys.argv[1]):
        line = line.strip()
        if not line:
            continue
        j = json.loads(line)
        kind = j.get('probe')
        if kind == 'pair_volume':
            _add('pair_volume', j)
        elif kind == 'bag_prune':
            _add('bag_prune', j)
        elif kind == 'knn_join_autoplanes':
            _add('scale_probe', j)
        elif kind == 'asof_skew':
            _add('asof_skew', j)

out = {
    'artifact': 'BENCH_sf10_r16.json',
    'round': 16,
    'protocol': (
        'generator twins (tools/GenData, deterministic xxhash64 fixtures '
        'matching the sf0.1 schema/domains) at scale 1/10/100 of the '
        'sf0.1 row counts = sf0.1/sf1/sf10 equivalents; warm = per-query '
        'median of 3 interleaved passes after a rep-0 build pass '
        '(committed bench_sfx*_medians.json from r13 + the r14 '
        'bench14_sfx* supplemental ONLY-runs + the r15 bench15a_sfx* '
        'n=9 re-measures of the as-of/overlap/privacy/CM/unigram/'
        'funnel families, which override the r14 min-of-3 rows for '
        'those queries, + the r16 bench16b/16c_sfx* ONLY-runs for the '
        'three outer band-join rows and the rows whose r16 plans '
        'changed (q_asof_auto full router, q_overlap_join/q_range_join '
        'single-action guard), which override earlier rows; the r15 '
        'runs were taken under a host ~1.47x '
        'slower than the r13 pinning - same-run decade RATIOS are '
        'unaffected, cross-round absolute compares need the sentinel); '
        'build = rep-0 seconds. pair_volume = exact enumerated '
        'candidate-row counts (tools/PairVolumeProbe, the PairGuard '
        'estimates); bag_prune = tools/BagPruneProbe 10%-doc sample; '
        'scale_probe = tools/ScaleProbe AutoPlanes knn cold/warm per '
        'scale, fresh JVM each.'),
    'queries': queries,
    'probes': probes,
    'headline': {
        'linear_backbone': 'minhash pairs/keep, image keep, repeated spans, span guard, sketch merges: all <=x2.8 warm per decade through BOTH decades',
        'guarded_quadratics': 'q_edit_distance (x99.5 warm, enumeration-bound) and q_setsim_pairs (x28 warm, collision-quadratic) now FAIL FAST via PairGuard above 5e8 enumerated candidates instead of running',
        'output_bound': 'q_image_neardup x85/decade is the pair SET growing, not the algorithm; q_image_keep is the production default on dup-heavy corpora',
        'asof_skew': 'a 90%-hot-key layout costs the pinned sort-merge exec x5-8 the uniform runtime (one straggler task AQE cannot split on a custom node). Three r15 paths, measured COMPLEMENTARY: the router picks the broadcast exec under the threshold; asOfJoinSalted brings the enrichment shape (right=left/50) to x1.63-1.74 of uniform but is capped at (L+R)/R when the right run is huge (x4.48 at right=left/5); asOfJoinBucketed (ts-range split, one carry row per bucket, right never replicated) wins exactly that heavy-right regime (x2.85 vs x4.48) and stays within ~2x on the enrichment shape (x2.11 vs x1.63) - complementary, crossover at the right-side size. r16: asOfJoinAuto encodes exactly these crossovers - a sampled pre-flight probe picks router/exec/salted/bucketed and sizes salts/bucketWidth, spec-pinned so each regime picks its measured-best path (AsOfRouteSpec)',
    },
}
json.dump(out, sys.stdout, indent=1)
print()
