#!/usr/bin/env python3
"""Off-gate oracle cross-check at an arbitrary (possibly generated) SF.

Same compare as selfcheck.py, plus what a big off-gate corpus needs:
- table paths may be directories of part files (generated fixtures) —
  globbed automatically;
- each DuckDB oracle runs under a wall-clock budget (default 120 s,
  SELFCHECK_BUDGET) and is interrupted past it — a DuckDB-side CTE that
  can't finish at 10-100x the gate scale is an oracle-cost exclusion,
  not an engine failure;
- results are CLASSIFIED: ok / golden (fixture-pinned VALUES or
  constant oracles that cannot match a different corpus by design) /
  oracle_timeout / mismatch / error, with a summary line.

Usage: SELFCHECK_SF=<dir> SELFCHECK_DIR=<verify out> python3 selfcheck_offgate.py
"""
import duckdb, json, glob, os, threading
import pyarrow.parquet as pq
import pandas as pd

d = os.environ['SELFCHECK_SF']
out = os.environ['SELFCHECK_DIR']
budget = float(os.environ.get('SELFCHECK_BUDGET', '120'))

# SELFCHECK_THREADS caps DuckDB's thread pool. Needed because this
# process also imports pyarrow/pandas, and on this box a MULTI-threaded
# DuckDB LEFT IE_JOIN livelocks (kernel-time futex storm, immune to
# con.interrupt) once pyarrow is loaded — reproduced minimally r16: the
# identical query runs in 0.5-0.7 s without the pyarrow import or with
# threads=1, and hangs indefinitely with both. Cap to 1 for the outer
# band-join oracles; leave unset for the rest (multi-threaded is fine).
_th = os.environ.get('SELFCHECK_THREADS')
con = duckdb.connect(config={'threads': int(_th)} if _th else {})
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    p = f'{d}/{t}.parquet'
    src = f"'{p}/*.parquet'" if os.path.isdir(p) else f"'{p}'"
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet({src})")

oracle = json.load(open(f'{out}/oracle_sql.json'))
# optional focus filter (same contract as Verify's SPARK_GRAFT_ONLY);
# filtered runs update only the listed keys in offgate_classes.json
only = {q for q in os.environ.get('SELFCHECK_ONLY', '').split(',') if q}
if only:
    oracle = {k: v for k, v in oracle.items() if k in only}

# fixture-pinned oracles: VALUES goldens over corpus-derived results and
# literal-weight re-scores — these pin the DRIVER fixture at the gate SF
# and cannot match a different corpus by design. The dir-independent
# goldens (states/providers/geocode/boundaries/TVF states) stay in.
GOLDEN_DIR_INDEPENDENT = {'q_states', 'q_sql_tvf_states', 'q_providers',
                          'q_geocode', 'q_boundary_country',
                          'q_src_worldbank', 'q_src_wb_catalog',
                          'q_src_wb_pushdown', 'q_src_who',
                          'q_src_who_catalog', 'q_src_fao', 'q_src_unhcr',
                          'q_src_ilo', 'q_src_ilo_legacy', 'q_src_search',
                          'q_sql_tvf_worldbank', 'q_sql_tvf_search'}

def is_golden(name, sql):
    if name in GOLDEN_DIR_INDEPENDENT:
        return False
    if name == 'q_quality_classifier':
        return True  # oracle re-scores with gate-SF-trained weight literals
    up = sql.upper()
    return '(VALUES' in up or 'FROM (VALUES' in up

# Estimator-regime tolerance compares: these queries are EXACT at the
# gate SF (exact-below-k sketch regime — the hash-compared oracle there)
# but at 10-100x the distinct counts exceed k and the published estimator
# error bound, not bit-equality, is the correct off-gate contract.
# Tolerances are ~3 sigma of the estimator's rsd ≈ 1/sqrt(k-2):
# q_kmv_distinct k=256 → 6.3% rsd → 0.20; q_join_estimate k=65536 →
# 0.4% rsd → 0.02. Non-listed columns still compare exactly.
APPROX_TOL = {
    'q_kmv_distinct': {'approx_users': 0.20},
    'q_join_estimate': {'est_keys_a': 0.02, 'est_keys_b': 0.02,
                        'est_key_overlap': 0.02, 'est_rows': 0.02},
}

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif 'float' in str(df[c].dtype):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def run_with_budget(sql):
    timer = threading.Timer(budget, con.interrupt)
    timer.start()
    try:
        return con.execute(sql).df(), None
    except Exception as e:
        msg = str(e)
        return None, ('timeout' if 'INTERRUPT' in msg.upper() else msg[:200])
    finally:
        timer.cancel()

counts = {}
detail = {}
for name, sql in sorted(oracle.items()):
    if is_golden(name, sql):
        counts.setdefault('golden_excluded', []).append(name)
        continue
    odf, err = run_with_budget(sql)
    if err == 'timeout':
        counts.setdefault('oracle_timeout', []).append(name)
        continue
    if err is not None:
        counts.setdefault('oracle_error', []).append(name)
        detail[name] = err
        continue
    try:
        files = glob.glob(f'{out}/{name}/*.parquet')
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        if name in APPROX_TOL:
            tols = APPROX_TOL[name]
            keys = sorted(c for c in odf.columns if c not in tols)
            o = odf.sort_values(keys).reset_index(drop=True)
            s = sdf.sort_values(keys).reset_index(drop=True)
            ok = (o.shape == s.shape and
                  sorted(odf.columns) == sorted(sdf.columns) and
                  all((o[c].astype(str).values ==
                       s[c].astype(str).values).all() for c in keys) and
                  all((abs(o[c].astype(float) - s[c].astype(float)) <=
                       tol * o[c].astype(float).clip(lower=1)).all()
                      for c, tol in tols.items()))
            cls = 'approx_ok' if ok else 'mismatch'
            counts.setdefault(cls, []).append(name)
            if not ok:
                detail[name] = 'estimator outside tolerance ' + str({
                    c: (o[c].tolist()[:5], s[c].tolist()[:5])
                    for c in tols})
            continue
        o, s = canon(odf), canon(sdf)
        kind = lambda dt: dt.kind.replace('u', 'i')
        same = (o.shape == s.shape and
                sorted(odf.columns) == sorted(sdf.columns) and
                all(kind(o[c].dtype) == kind(s[c].dtype) for c in o.columns) and
                all((o[c].values == s[c].values).all() or
                    ('float' in str(o[c].dtype) and
                     ((o[c].isna() & s[c].isna()) |
                      (abs(o[c] - s[c]) < 1e-9)).all())
                    for c in o.columns))
        if same:
            counts.setdefault('ok', []).append(name)
        else:
            counts.setdefault('mismatch', []).append(name)
            detail[name] = f'oracle {len(odf)} rows vs spark {len(sdf)} rows'
    except Exception as e:
        counts.setdefault('compare_error', []).append(name)
        detail[name] = str(e)[:200]

for cls in ['ok', 'approx_ok', 'golden_excluded', 'oracle_timeout',
            'oracle_error', 'mismatch', 'compare_error']:
    names = counts.get(cls, [])
    print(f'{cls}: {len(names)}')
    if cls != 'ok':
        for n in names:
            print(f'  {n}' + (f' — {detail[n]}' if n in detail else ''))
merged = {k: sorted(v) for k, v in counts.items()}
if only and os.path.exists(f'{out}/offgate_classes.json'):
    prev = json.load(open(f'{out}/offgate_classes.json'))
    merged = {k: sorted(set(v) - only) for k, v in prev.items()}
    for k, v in counts.items():
        merged[k] = sorted(set(merged.get(k, [])) | set(v))
    merged = {k: v for k, v in merged.items() if v}
json.dump(merged, open(f'{out}/offgate_classes.json', 'w'), indent=1)
