#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each dumped query
result (parquet) + its oracle SQL, run the SQL in DuckDB over the sf tables
and compare rows / schema / values. Dev tool only — the real gate is the
driver's. Usage: local_oracle_check.py <sfdir> <outdir> [prefix...]"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq

sfdir, outdir = sys.argv[1], sys.argv[2]
prefixes = sys.argv[3:] or None

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if prefixes and not any(name.startswith(p) for p in prefixes):
        continue
    d = f"{outdir}/{name}"
    if not os.path.isdir(d):
        print(f"{name}: NO SPARK DUMP"); fails += 1; continue
    spark_tbl = pq.read_table(d)
    spark_df = spark_tbl.to_pandas()
    try:
        duck_df = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    ok = True
    if len(spark_df) != len(duck_df):
        print(f"{name}: ROWS {len(spark_df)} vs {len(duck_df)}"); ok = False
    sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
    if sc != dc:
        print(f"{name}: COLS {sc} vs {dc}"); ok = False
    if ok:
        s = spark_df[sc].reset_index(drop=True)
        k = duck_df[dc].reset_index(drop=True)
        for c in sc:
            sv, kv = s[c], k[c]
            try:
                import pandas as pd
                eq = (sv.isna() & kv.isna()) | (sv == kv)
                # exact compare incl. dtype-coerced values
                if not bool(eq.all()):
                    bad = (~eq).idxmax()
                    print(f"{name}: VALUE MISMATCH col={c} row={bad}: "
                          f"spark={sv[bad]!r} duck={kv[bad]!r} "
                          f"(dtypes {sv.dtype}/{kv.dtype})")
                    ok = False
            except Exception as e:
                print(f"{name}: COMPARE ERROR col={c}: {e}"); ok = False
        # dtype report (schema compare is driver-side; warn only)
        for c in sc:
            if str(s[c].dtype) != str(k[c].dtype):
                print(f"{name}: dtype note col={c}: {s[c].dtype} vs {k[c].dtype}")
    if ok:
        print(f"{name}: OK ({len(spark_df)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
