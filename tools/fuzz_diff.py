#!/usr/bin/env python3
# DuckDB replay half of the differential fuzz harness (see
# src/main/scala/graft/tools/Fuzz.scala). For every seed directory under
# the fuzz root, replays each family's oracle SQL in DuckDB against the
# generated corpus and diffs it (dtype-strict, rows in order — exactly the
# check_oracle.py / driver discipline) against the engine's parquet dump.
#
#   sbt "runMain graft.tools.Fuzz /tmp/graft-fuzz 20"
#   python3 tools/fuzz_diff.py /tmp/graft-fuzz
#
# Prints one line per (seed, family), then a summary; exits nonzero on any
# divergence. A failing seed is a found bug: pin it in FuzzSpec.
import duckdb, json, sys, os, glob
import pandas as pd

root = sys.argv[1] if len(sys.argv) > 1 else '/tmp/graft-fuzz'
oracle = json.load(open(f'{root}/oracle_sql.json'))
# optional argv[2]: comma list of families — diff only those (the dev
# loop after a targeted Fuzz re-run of a subset)
if len(sys.argv) > 2:
    only = set(x.strip() for x in sys.argv[2].split(',') if x.strip())
    missing = only - set(oracle)
    assert not missing, f"unknown families: {missing}"
    oracle = {k: v for k, v in oracle.items() if k in only}
seeds = sorted((d for d in os.listdir(root) if d.startswith('s')),
               key=lambda s: int(s[1:]))
fails, n_ok = [], 0
for sd in seeds:
    sdir = f'{root}/{sd}'
    con = duckdb.connect()
    for t in ['orders', 'events', 'documents', 'lineitem', 'customer', 'nation',
              'embeddings']:
        if os.path.isdir(f'{sdir}/{t}.parquet'):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sdir}/{t}.parquet/*.parquet'")
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
            got = duckdb.sql(f"SELECT * FROM '{sdir}/out/{name}/*.parquet'").df()
            exp = exp[sorted(exp.columns)]
            got = got[sorted(got.columns)]
            if list(exp.columns) != list(got.columns):
                fails.append((sd, name, f"cols exp={list(exp.columns)} got={list(got.columns)}")); continue
            if len(exp) != len(got):
                fails.append((sd, name, f"rows exp={len(exp)} got={len(got)}")); continue
            dt_fails = []
            for c in exp.columns:
                e, g = exp[c], got[c]
                if str(e.dtype).startswith('datetime') or str(g.dtype).startswith('datetime'):
                    exp[c] = pd.to_datetime(e).dt.tz_localize(None) if getattr(e.dtype, 'tz', None) is None else pd.to_datetime(e).dt.tz_convert('UTC').dt.tz_localize(None)
                    got[c] = pd.to_datetime(g).dt.tz_localize(None) if getattr(g.dtype, 'tz', None) is None else pd.to_datetime(g).dt.tz_convert('UTC').dt.tz_localize(None)
                elif e.dtype != g.dtype:
                    dt_fails.append(f"dtype[{c}] oracle={e.dtype} spark={g.dtype}")
            if dt_fails:
                fails.append((sd, name, dt_fails)); continue
            try:
                pd.testing.assert_frame_equal(exp.reset_index(drop=True), got.reset_index(drop=True), check_dtype=True, check_exact=True)
                n_ok += 1
            except AssertionError as e:
                fails.append((sd, name, str(e).split(chr(10))[0:4]))
        except Exception as e:
            fails.append((sd, name, f"ERROR {e}"))
    con.close()
    print(f"{sd}: {'OK' if not any(f[0] == sd for f in fails) else 'FAIL'}")
for sd, n, m in fails:
    print(f"FAIL  {sd}/{n}: {m}")
summary = {"seeds": len(seeds), "families": len(oracle), "ok": n_ok,
           "fails": [f"{sd}/{n}" for sd, n, _ in fails]}
print(json.dumps(summary))
sys.exit(1 if fails else 0)
