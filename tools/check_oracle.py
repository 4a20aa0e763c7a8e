# Dev tooling (driver-side python): mimic the driver's DuckDB oracle compare
# locally so oracle mismatches are caught before the round gate.
# Usage: python3 tools/check_oracle.py /tmp/verify_r4 /root/testdata/sf0.01 [only_prefix...]
import sys, os, json, glob
import duckdb, pandas as pd, numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
only = sys.argv[3:]

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    p = os.path.join(sfdir, f"{t}.parquet")
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')"
                    if os.path.isdir(p) else
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: ints/decimals -> float where possible for compare
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

fails = []
for name in sorted(oracle):
    if only and not any(name.startswith(o) for o in only):
        continue
    sql = oracle[name]
    spark_path = os.path.join(outdir, name)
    if not os.path.isdir(spark_path):
        print(f"{name}: MISSING spark output"); fails.append(name); continue
    try:
        sdf = pd.concat([pd.read_parquet(f) for f in glob.glob(spark_path + "/*.parquet")],
                        ignore_index=True)
        odf = con.execute(sql).df()
    except Exception as e:
        print(f"{name}: ERR {e}"); fails.append(name); continue
    ok_rows = len(sdf) == len(odf)
    s_cols, o_cols = sorted(sdf.columns), sorted(odf.columns)
    ok_schema = s_cols == o_cols
    ok_vals = False
    if ok_rows and ok_schema:
        try:
            a, b = canon(sdf), canon(odf)
            ok_vals = True
            for c in a.columns:
                av, bv = a[c], b[c]
                if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                    eq = np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=0, equal_nan=True)
                    exact = bool(np.array_equal(av.astype(float).values, bv.astype(float).values, equal_nan=True))
                    if not exact:
                        ok_vals = False
                        print(f"  {name}.{c}: float mismatch (allclose={eq})")
                else:
                    if not av.astype(str).equals(bv.astype(str)):
                        ok_vals = False
                        print(f"  {name}.{c}: value mismatch")
        except Exception as e:
            print(f"  {name}: compare err {e}")
    status = "OK" if (ok_rows and ok_schema and ok_vals) else \
             f"FAIL rows={len(sdf)}/{len(odf)} schema={ok_schema} ({s_cols} vs {o_cols})" if not (ok_rows and ok_schema) else "FAIL values"
    print(f"{name}: {status}")
    if status != "OK": fails.append(name)

print(f"\n{len(fails)} failures: {fails}" if fails else "\nall green")
sys.exit(1 if fails else 0)
