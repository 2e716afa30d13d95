#!/usr/bin/env python3
# Local stand-in for the driver's t2 correctness gate: run Verify, then
#   python3 tools/check_oracle.py <sfDir> <verifyOutDir>
# Compares each oracle SQL result (DuckDB) against the Spark parquet dump,
# columns sorted by name, rows compared exactly in order.
import duckdb, json, glob, sys, os
import pandas as pd
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.001'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify001'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.sql(sql).df()
        got = duckdb.sql(f"SELECT * FROM '{out}/{name}/*.parquet'").df()
        exp = exp[sorted(exp.columns)]
        got = got[sorted(got.columns)]
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"cols exp={list(exp.columns)} got={list(got.columns)}")); continue
        if len(exp) != len(got):
            fails.append((name, f"rows exp={len(exp)} got={len(got)}")); continue
        # The driver's hash is dtype-sensitive (float64 0.0 != int64 0), so
        # the local gate must be dtype-strict too. The ONLY normalization is
        # timezone on datetimes (Spark writes UTC-instant timestamps, DuckDB
        # returns naive ones — the driver normalizes the same way); every
        # other dtype divergence is an oracle bug: CAST it in the SQL.
        dt_fails = []
        for c in exp.columns:
            e, g = exp[c], got[c]
            if str(e.dtype).startswith('datetime') or str(g.dtype).startswith('datetime'):
                exp[c] = pd.to_datetime(e).dt.tz_localize(None) if getattr(e.dtype,'tz',None) is None else pd.to_datetime(e).dt.tz_convert('UTC').dt.tz_localize(None)
                got[c] = pd.to_datetime(g).dt.tz_localize(None) if getattr(g.dtype,'tz',None) is None else pd.to_datetime(g).dt.tz_convert('UTC').dt.tz_localize(None)
            elif exp[c].dtype != got[c].dtype:
                dt_fails.append(f"dtype[{c}] oracle={exp[c].dtype} spark={got[c].dtype}")
        if dt_fails:
            fails.append((name, dt_fails)); continue
        try:
            pd.testing.assert_frame_equal(exp.reset_index(drop=True), got.reset_index(drop=True), check_dtype=True, check_exact=True)
            print(f"OK    {name} ({len(exp)} rows)")
        except AssertionError as e:
            fails.append((name, str(e).split(chr(10))[0:4]))
    except Exception as e:
        fails.append((name, f"ERROR {e}"))
for n, m in fails:
    print(f"FAIL  {n}: {m}")
print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
