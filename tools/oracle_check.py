import duckdb, json, sys, glob, os
import pyarrow.parquet as pq
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
oracles = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
for t in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(t).replace('.parquet','')
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c], utc=True).dt.tz_localize(None) if getattr(df[c].dt, 'tz', None) is not None else df[c]
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

ok, bad = [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d): continue
    spark_df = pq.read_table(d).to_pandas()
    if name not in oracles:
        ok.append(f"{name}: rows-only ({len(spark_df)} rows)")
        continue
    try:
        import time as _t; _t0 = _t.time()
        print(f"[oracle] {name} ...", file=sys.stderr, flush=True)
        oracle_df = con.sql(oracles[name]).df()
        print(f"[oracle] {name} done in {_t.time()-_t0:.1f}s", file=sys.stderr, flush=True)
        a, b = canon(spark_df.copy()), canon(oracle_df.copy())
        if list(a.columns) != list(b.columns):
            bad.append(f"{name}: COLUMN MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        elif len(a) != len(b):
            bad.append(f"{name}: ROWCOUNT spark={len(a)} oracle={len(b)}")
        else:
            eq = True
            for c in a.columns:
                av, bv = a[c], b[c]
                # Driver hashes stringified values: float64 on one side and
                # int64 on the other ("1.0" vs "1") is a hash mismatch even
                # when numerically equal. Flag it hard.
                if pd.api.types.is_float_dtype(av) != pd.api.types.is_float_dtype(bv):
                    eq = False
                    print(f"--- {name} col {c}: DTYPE HASH-RISK spark={av.dtype} oracle={bv.dtype}")
                    break
                if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
                    if not ((pd.Series(av).astype(float) - pd.Series(bv).astype(float)).abs() < 1e-9).all():
                        eq = False; break
                else:
                    if not (av.astype(str) == bv.astype(str)).all():
                        eq = False; break
            if eq: ok.append(f"{name}: MATCH ({len(a)} rows)")
            else:
                bad.append(f"{name}: VALUE MISMATCH col={c}")
                m = (a[c].astype(str) != b[c].astype(str))
                print(f"--- {name} col {c} first diffs:\n", pd.concat([a[m][[c]].head(3).rename(columns={c:'spark'}), b[m][[c]].head(3).rename(columns={c:'oracle'})], axis=1))
    except Exception as e:
        bad.append(f"{name}: ORACLE ERROR {str(e)[:200]}")
print("== OK =="); [print(" ", x) for x in ok]
print("== BAD =="); [print(" ", x) for x in bad]
sys.exit(1 if bad else 0)
