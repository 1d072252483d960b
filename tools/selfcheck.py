import duckdb, json, glob, math, os
import pyarrow.parquet as pq
import pandas as pd

# overridable for off-gate runs (e.g. the sf0.1 cross-check)
d = os.environ.get('SELFCHECK_SF', '/root/testdata/sf0.01')
out = os.environ.get('SELFCHECK_DIR', '/tmp/verify_out')

con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")

oracle = json.load(open(f'{out}/oracle_sql.json'))
def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif 'float' in str(df[c].dtype):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

results = {}
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).df()
        files = glob.glob(f'{out}/{name}/*.parquet')
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in files], ignore_index=True)
        rows = (len(odf) == len(sdf))
        cols = sorted(odf.columns) == sorted(sdf.columns)
        o, s = canon(odf), canon(sdf)
        # the driver's hash is dtype-sensitive: a float64 oracle column vs an
        # int64 Spark column fails there even when values match, so a kind
        # mismatch (int vs float vs object) must FAIL locally too
        kind = lambda dt: dt.kind.replace('u', 'i')
        dtype_bad = [c for c in o.columns
                     if o.shape == s.shape and kind(o[c].dtype) != kind(s[c].dtype)]
        try:
            same = o.shape == s.shape and not dtype_bad and all(
                (o[c].values == s[c].values).all() or
                ('float' in str(o[c].dtype) and ((o[c].isna() & s[c].isna()) | (abs(o[c]-s[c]) < 1e-9)).all())
                for c in o.columns)
        except Exception as e:
            same = f'cmp-err {e}'
        results[name] = dict(rows_o=len(odf), rows_s=len(sdf), rows_match=rows, cols_match=cols, hash_match=same)
        if dtype_bad:
            results[name]['dtype_mismatch'] = {
                c: f'oracle={odf[c].dtype} spark={sdf[c].dtype}' for c in dtype_bad}
    except Exception as e:
        results[name] = dict(error=str(e)[:300])
for k, v in sorted(results.items()):
    status = 'OK ' if v.get('hash_match') is True and v.get('rows_match') and v.get('cols_match') else 'FAIL'
    print(status, k, v)
