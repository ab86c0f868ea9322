#!/usr/bin/env python3
"""Dev-side replica of the driver's correctness gate: for each query result
parquet written by graft.Verify, run the corresponding oracle SQL in DuckDB
over the same testdata tables and compare (columns sorted by name, rows
sorted, values hashed). Dev tool only — the engine itself is pure Scala.

Optional third arg: a path to write a JSON replica in the driver's
CORRECTNESS_r{N}.json per-query schema (rows_match/schema_match/hash_match/
spark_rows/oracle_rows/err) — committed as CORRECTNESS_r{N}_local.json
whenever the driver's own artifact arrives missing or empty (the r12 gate
artifact was `{}`; the round would have been ungradeable without a re-run).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
JSON_OUT = sys.argv[3] if len(sys.argv) > 3 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    p = f"{SF}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True,
                        key=lambda s: s.astype(str))
    return df

fails, passes = [], []
report = {}
for name in sorted(oracle):
    rec = {"rows_match": False, "schema_match": False, "hash_match": False,
           "spark_rows": None, "oracle_rows": None, "err": None}
    report[name] = rec
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        rec["err"] = "no spark output"
        fails.append((name, "no spark output")); continue
    try:
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        want = con.sql(oracle[name]).df()
    except Exception as e:
        rec["err"] = f"exec error: {e}"
        fails.append((name, f"exec error: {e}")); continue
    g, w = canon(got), canon(want)
    rec["spark_rows"], rec["oracle_rows"] = len(g), len(w)
    rec["schema_match"] = list(g.columns) == list(w.columns)
    rec["rows_match"] = len(g) == len(w)
    if not rec["schema_match"]:
        # err mirrors the fails message (r13 advice: the committed JSON
        # replica must carry the diagnostic, not just the console list)
        rec["err"] = f"columns differ: spark={list(g.columns)} duckdb={list(w.columns)}"
        fails.append((name, rec["err"])); continue
    if not rec["rows_match"]:
        rec["err"] = f"row count: spark={len(g)} duckdb={len(w)}"
        fails.append((name, rec["err"])); continue
    gs = g.astype(str); ws = w.astype(str)
    if not gs.equals(ws):
        diff = (gs != ws).any(axis=1)
        idx = diff[diff].index[:3]
        detail = []
        for i in idx:
            for c in g.columns:
                if gs.at[i, c] != ws.at[i, c]:
                    detail.append(f"row{i}.{c}: spark={gs.at[i, c]!r} duckdb={ws.at[i, c]!r}")
        rec["err"] = "; ".join(detail[:4])
        fails.append((name, "; ".join(detail[:4]))); continue
    rec["hash_match"] = True
    dt_note = ""
    for c in g.columns:
        if str(g[c].dtype) != str(w[c].dtype):
            dt_note += f" [dtype {c}: {g[c].dtype} vs {w[c].dtype}]"
    passes.append((name, f"{len(g)} rows{dt_note}"))

for n, m in passes:
    print(f"PASS {n}: {m}")
for n, m in fails:
    print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} pass / {len(fails)} fail")
if JSON_OUT:
    with open(JSON_OUT, "w") as f:
        json.dump(report, f, indent=2)
    print(f"json replica -> {JSON_OUT}")
sys.exit(1 if fails else 0)
