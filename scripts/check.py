#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf tables, compare
schema (sorted column names), row count, and value hash.

Usage: python3 scripts/check.py [sfDir] [outDir]
(Run `sbt "runMain graft.Verify <sfDir> <outDir>"` first.)
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

fails, passes, weak = [], [], []
# a query that failed inside Verify writes no parquet — that must FAIL
# the gate, not vanish from it
manifest_path = f"{out}/queries.json"
declared = set(json.load(open(manifest_path))) if os.path.exists(manifest_path) else set()
found = {os.path.basename(f)[: -len(".parquet")] for f in glob.glob(f"{out}/*.parquet")}
for name in sorted(declared - found):
    fails.append((name, "no spark output"))
for f in sorted(glob.glob(f"{out}/*.parquet")):
    name = os.path.basename(f)[: -len(".parquet")]
    got = con.execute(f"SELECT * FROM '{f}'").df()
    if name not in oracle:
        weak.append((name, len(got)))
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"schema: got {list(g.columns)} want {list(e.columns)}"))
        continue
    if len(g) != len(e):
        fails.append((name, f"rows: got {len(g)} want {len(e)}"))
        continue
    try:
        pd.testing.assert_frame_equal(g, e, check_dtype=False, check_exact=True)
        passes.append(name)
    except AssertionError as ex:
        fails.append((name, str(ex).split("\n")[0:6]))

print(f"PASS ({len(passes)}): {' '.join(passes)}")
print(f"WEAK rows-only ({len(weak)}): {[(n, r) for n, r in weak]}")

# optional CORRECTNESS-style dump (driver schema) so survey_gate.py can
# run against a fresh LOCAL gate, not just the last driver round:
#   python3 scripts/check.py <sfDir> <outDir> --json /tmp/correctness.json
if "--json" in sys.argv:
    jp = sys.argv[sys.argv.index("--json") + 1]
    rec = {}
    for n in passes:
        rec[n] = {"rows_match": True, "schema_match": True,
                  "hash_match": True, "err": None}
    for n, r in weak:
        rec[n] = {"rows_match": True, "schema_match": True,
                  "hash_match": None, "spark_rows": r, "err": None}
    for n, msg in fails:
        rec[n] = {"rows_match": False, "schema_match": False,
                  "hash_match": False, "err": str(msg)[:200]}
    json.dump(rec, open(jp, "w"), indent=1)
    print(f"wrote {jp}")

if fails:
    print(f"FAIL ({len(fails)}):")
    for n, msg in fails:
        print(f"  {n}: {msg}")
    sys.exit(1)
print("ALL GREEN")
