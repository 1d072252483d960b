#!/usr/bin/env python3
"""Focused oracle check: python3 tools/check_one.py q_a q_b ...
Reads /tmp/verify_out (from a SPARK_GRAFT_ONLY-filtered Verify run)."""
import duckdb, json, sys, glob, os
import pyarrow.parquet as pq
import pandas as pd

OUT = os.environ.get('VERIFY_OUT', '/tmp/verify_out')
con = duckdb.connect()
d = '/root/testdata/sf0.01'
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

oracle = json.load(open(f'{OUT}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif 'float' in str(df[c].dtype):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

for name in sys.argv[1:]:
    try:
        odf = con.execute(oracle[name]).df()
        files = glob.glob(f'{OUT}/{name}/*.parquet')
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files],
                        ignore_index=True)
        rows = (len(odf) == len(sdf))
        cols = sorted(odf.columns) == sorted(sdf.columns)
        o, s = canon(odf), canon(sdf)
        # driver's hash is dtype-sensitive: int-vs-float kind mismatch must
        # FAIL here even when values compare equal (r8's q_mixture_plan)
        kind = lambda dt: dt.kind.replace('u', 'i')
        dtype_bad = [c for c in o.columns
                     if o.shape == s.shape and kind(o[c].dtype) != kind(s[c].dtype)]
        same = o.shape == s.shape and not dtype_bad and all(
            (o[c].values == s[c].values).all() or
            ('float' in str(o[c].dtype) and
             ((o[c].isna() & s[c].isna()) |
              (abs(o[c] - s[c]) < 1e-9)).all())
            for c in o.columns)
        ok = rows and cols and same
        if dtype_bad:
            print('  dtype mismatch:', {c: f'oracle={odf[c].dtype} spark={sdf[c].dtype}'
                                        for c in dtype_bad})
        print(('OK  ' if ok else 'FAIL'), name,
              dict(rows_o=len(odf), rows_s=len(sdf), rows=rows,
                   cols=cols, hash=same))
        if not ok and cols:
            merged = o.compare(s) if o.shape == s.shape else None
            if merged is not None and len(merged):
                print(merged.head(10))
        if not cols:
            print('  oracle cols:', sorted(odf.columns))
            print('  spark  cols:', sorted(sdf.columns))
    except Exception as e:
        print('ERR ', name, str(e)[:300])
