import duckdb, json, glob, os, sys, math
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

def canon(df):
    df = df[sorted(df.columns)]
    # normalize types for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        ddf = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append((name, f'duckdb error: {e}')); continue
    files = glob.glob(f'{out}/{name}/*.parquet')
    if not files:
        fails.append((name, 'no spark output')); continue
    sdf = pd.concat([pq.read_table(f).to_pandas() for f in files])
    if sorted(sdf.columns) != sorted(ddf.columns):
        fails.append((name, f'cols spark={sorted(sdf.columns)} duck={sorted(ddf.columns)}')); continue
    a, b = canon(sdf), canon(ddf)
    if len(a) != len(b):
        fails.append((name, f'rowcount spark={len(a)} duck={len(b)}')); continue
    # exact compare incl dtype-insensitive values
    mismatch = None
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if isinstance(x, float) and isinstance(y, float):
                if x != y and not (math.isnan(x) and math.isnan(y)):
                    mismatch = (c, i, x, y); break
            elif str(x) != str(y):
                mismatch = (c, i, x, y); break
        if mismatch: break
    if mismatch:
        fails.append((name, f'value mismatch col={mismatch[0]} row={mismatch[1]} spark={mismatch[2]!r} duck={mismatch[3]!r}'))
    else:
        print(f'PASS {name} rows={len(a)}')
for n, m in fails:
    print(f'FAIL {n}: {m}')
print(f'\n{len(oracle)-len(fails)}/{len(oracle)} pass; rows-only queries: {set(os.listdir(out)) - set(oracle) - {"oracle_sql.json"}}')
