#!/usr/bin/env python3
"""Dev-loop emulation of the driver's correctness gate: run each oracle SQL
in DuckDB over the same parquet tables and diff against the Verify output
(columns sorted by name, rows sorted, exact value compare)."""
import sys, os, json, glob
import duckdb

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    qdir = os.path.join(out_dir, name)
    if not os.path.isdir(qdir):
        continue
    try:
        spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
        spark_types = dict(zip(spark_rel.columns, map(str, spark_rel.types)))
        spark_df = spark_rel.fetchdf()
    except Exception as e:
        results[name] = f"SPARK-READ-FAIL {e}"
        continue
    if name not in oracle:
        results[name] = f"rows-only ({len(spark_df)} rows)"
        continue
    try:
        ora_rel = con.sql(oracle[name])
        ora_types = dict(zip(ora_rel.columns, map(str, ora_rel.types)))
        ora_df = ora_rel.fetchdf()
    except Exception as e:
        results[name] = f"ORACLE-FAIL {type(e).__name__}: {e}"
        continue
    # dtype-parity gate (r11): a value-exact result can still hash-red in
    # the driver when the two sides carry different logical types (DuckDB
    # SUM(BIGINT) -> HUGEINT, raw DECIMAL(38,0) outputs, INT32 vs INT64) —
    # exactly the class that kept q176/q233 red for a round+. Fail loudly
    # here so it can't ship.
    dtype_bad = sorted(
        c for c in set(spark_types) & set(ora_types)
        if spark_types[c] != ora_types[c])
    if dtype_bad:
        results[name] = "DTYPE-MISMATCH " + "; ".join(
            f"{c}: spark={spark_types[c]} oracle={ora_types[c]}"
            for c in dtype_bad)
        continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = ora_df.reindex(sorted(ora_df.columns), axis=1)
    if list(s.columns) != list(o.columns):
        results[name] = f"SCHEMA-MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
        continue
    if len(s) != len(o):
        results[name] = f"ROWS-MISMATCH spark={len(s)} oracle={len(o)}"
        continue
    # array-typed columns (unhashable ndarrays) -> canonical strings so
    # pandas can sort and compare them (the driver's gate stringifies too)
    def canon(df):
        import numpy as np
        for c in df.columns:
            # ANY cell may be an array (first row can be None/scalar in a
            # nullable array column) — scan the whole column, not iloc[0]
            if len(df) and df[c].map(
                    lambda v: isinstance(v, (list, np.ndarray))).any():
                df[c] = df[c].apply(lambda v: str(
                    [x.item() if hasattr(x, "item") else x for x in v])
                    if isinstance(v, (list, np.ndarray)) else str(v))
        return df
    s, o = canon(s), canon(o)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    mismatch = None
    for c in s.columns:
        sv, ov = s[c], o[c]
        try:
            eq = (sv.fillna("__NULL__") == ov.fillna("__NULL__")) if sv.dtype == object \
                else ((sv == ov) | (sv.isna() & ov.isna()))
        except Exception:
            eq = sv.astype(str) == ov.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = f"VALUE-MISMATCH col={c} row={i} spark={sv[i]!r} oracle={ov[i]!r}"
            break
    results[name] = mismatch or f"OK ({len(s)} rows)"

bad = 0
for k in sorted(results):
    v = results[k]
    flag = "  " if v.startswith(("OK", "rows-only")) else "XX"
    if flag == "XX":
        bad += 1
    print(f"{flag} {k}: {v}")
print(f"\n{bad} failing / {len(results)} total")
sys.exit(1 if bad else 0)
