#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare to the Verify parquet dump
(rows / schema-ish / value-hash, column-name-sorted, row-sorted).

Usage: python3 scripts/check_correctness.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(os.listdir(out_dir)):
    path = os.path.join(out_dir, name)
    if not os.path.isdir(path):
        continue
    files = glob.glob(f"{path}/*.parquet")
    if not files:
        results[name] = {"error": "no parquet written"}
        continue
    got = con.sql(f"SELECT * FROM '{files[0]}'").df()
    if name not in oracles:
        results[name] = {"rows": len(got), "rows_only": True}
        continue
    try:
        exp = con.sql(oracles[name]).df()
    except Exception as e:
        results[name] = {"error": f"oracle failed: {e}"}
        continue
    r = {"rows_match": len(got) == len(exp),
         "got_rows": len(got), "exp_rows": len(exp)}
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    r["schema_match"] = gcols == ecols
    if r["rows_match"] and r["schema_match"]:
        gs = got[gcols].astype(str).sort_values(by=gcols, ignore_index=True)
        es = exp[ecols].astype(str).sort_values(by=ecols, ignore_index=True)
        g, e = gs, es
        r["hash_match"] = gs.equals(es)
        if not r["hash_match"]:
            diff = (gs != es).any(axis=1)
            idx = list(gs.index[diff])[:3]
            r["first_diffs"] = [
                {"row": int(i), "got": g.loc[i].to_dict() | {},
                 "exp": e.loc[i].to_dict() | {}}
                for i in idx]
            r["first_diffs"] = json.loads(json.dumps(r["first_diffs"],
                                                     default=str))
    results[name] = r

ok = sum(1 for r in results.values()
         if r.get("hash_match") or r.get("rows_only"))
print(json.dumps(results, indent=1, default=str))
print(f"\n{ok}/{len(results)} green "
      f"({sum(1 for r in results.values() if r.get('rows_only'))} rows-only)")
