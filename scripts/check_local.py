#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run after
`sbt "runMain graft.Verify <sfDir> <outDir>"`, compares each query's
parquet dump against its DuckDB oracle on the same tables.

Usage: python3 scripts/check_local.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        results[name] = {"error": "no parquet output"}
        continue
    got = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if name not in oracles:
        results[name] = {"rows": len(got), "rows_only": True, "ok": len(got) > 0}
        continue
    try:
        want = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        results[name] = {"error": f"oracle failed: {e}"}
        continue
    got_s = got[sorted(got.columns)]
    want_s = want[sorted(want.columns)]
    cols_match = list(got_s.columns) == list(want_s.columns)
    rows_match = len(got_s) == len(want_s)
    types_got = [str(t) for t in got_s.dtypes]
    types_want = [str(t) for t in want_s.dtypes]
    hash_match = False
    if cols_match and rows_match:
        try:
            hash_match = got_s.reset_index(drop=True).equals(want_s.reset_index(drop=True))
            if not hash_match:
                # show first diff
                import pandas as pd
                for c in got_s.columns:
                    if not got_s[c].reset_index(drop=True).equals(want_s[c].reset_index(drop=True)):
                        g, w = got_s[c].tolist(), want_s[c].tolist()
                        for i, (a, b) in enumerate(zip(g, w)):
                            if a != b and not (a != a and b != b):
                                print(f"  [{name}] col {c} row {i}: got={a!r} want={b!r}")
                                break
                        break
        except Exception as e:
            print(f"  [{name}] compare error: {e}")
    results[name] = {
        "rows": len(got_s), "oracle_rows": len(want_s),
        "cols_match": cols_match, "rows_match": rows_match,
        "hash_match": bool(hash_match),
        "types": dict(zip(got_s.columns, types_got)) if not hash_match else None,
        "oracle_types": dict(zip(want_s.columns, types_want)) if not hash_match else None,
    }

n_ok = sum(1 for r in results.values() if r.get("hash_match") or r.get("ok"))
for name, r in results.items():
    status = "OK " if (r.get("hash_match") or r.get("ok")) else "FAIL"
    extra = "" if status == "OK " else f" {r}"
    print(f"{status} {name} rows={r.get('rows')}{extra}")
print(f"\n{n_ok}/{len(results)} green")
sys.exit(0 if n_ok == len(results) else 1)
