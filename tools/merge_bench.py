#!/usr/bin/env python3
"""Min-merge this round's quiet-window bench sidecars into the committed
chain artifact (BENCH_r{N}_local.json), applying the adjudication protocol
in docs/BENCH_NOTES.md "Round 13":

 - per-query r{N} minimum over the given windows;
 - cross-round min-merge with the PREVIOUS chain only for queries whose
   timed code is UNCHANGED since that chain (changed/new queries carry
   this-round-only minima — the stale-minimum hazard, r11 finding);
 - per-query fair-segment annotation: a window draw counts as FAIR when
   the canary samples bracketing its leg position are <= 1.25x the 0.26
   cross-round fair value.

Usage:
  merge_bench.py OUT.json PREV_CHAIN.json CHANGED.txt W1.json [W2.json ...]

CHANGED.txt: one query name per line (comments with #) — queries whose
timed code changed since PREV_CHAIN's commit.
"""
import json, sys

FAIR = 0.26
FAIR_BAR = 1.25 * FAIR

out_path, prev_path, changed_path = sys.argv[1], sys.argv[2], sys.argv[3]
windows = sys.argv[4:]

prev = json.load(open(prev_path))
prev_q = prev.get("queries", {})
changed = set()
for line in open(changed_path):
    line = line.split("#")[0].strip()
    if line:
        changed.add(line)

wins = [json.load(open(w)) for w in windows]

def bracket_fair(win, name):
    """True when the canary samples bracketing this query's position ran fair."""
    spread = win.get("spread", {})
    series = win.get("canary", {}).get("series", [])
    if name not in spread or not series:
        return False
    pos = spread[name].get("pos")
    if pos is None:
        return False
    before = [c["sec"] for c in series if c["pos"] <= pos]
    after = [c["sec"] for c in series if c["pos"] > pos]
    lo = before[-1] if before else None
    hi = after[0] if after else None
    vals = [v for v in (lo, hi) if v is not None]
    return bool(vals) and all(v <= FAIR_BAR for v in vals)

names = sorted({n for w in wins for n in w.get("queries", {})})
queries, detail = {}, {}
for n in names:
    draws = [(w.get("queries", {}).get(n), bracket_fair(w, n)) for w in wins
             if w.get("queries", {}).get(n) is not None]
    r_min = min(v for v, _ in draws)
    fair_min = any(f for v, f in draws if v == r_min)
    if n in changed or n not in prev_q:
        queries[n] = r_min
        detail[n] = {"min": r_min, "src": "r13", "fair_segment": fair_min}
    else:
        merged = min(r_min, prev_q[n])
        queries[n] = merged
        detail[n] = {"min": merged,
                     "src": "r13" if merged == r_min else "prev_chain",
                     "fair_segment": fair_min if merged == r_min else True}

total = sum(queries.values())
artifact = {
    "metric": "total", "value": total, "unit": "sec",
    "runs_merged": len(wins),
    "provenance": None,  # filled by caller below via --provenance? keep simple:
    "canaries_r13": [[ [c["pos"], round(c["sec"], 3)] for c in w.get("canary", {}).get("series", []) ] for w in wins],
    "changed_queries_r13_only": sorted(changed & set(names)),
    "queries": queries,
    "detail": detail,
    "sf": wins[0].get("sf") if wins else None,
}
prov = (f"per-query min over {len(wins)} r13 quiet windows (canary series in "
        f"canaries_r13, per-query leg positions in the window sidecars), "
        f"cross-round min-merged with {prev_path.split('/')[-1]} for queries "
        f"whose timed code is unchanged since that chain's commit; "
        f"changed_queries_r13_only carry r13-only minima (their pre-r13 chain "
        f"values predate the r12 SNB/lm/range-join rewrites or the r13 "
        f"ann_index_build close-per-run). fair_segment per the BENCH_NOTES "
        f"round-13 protocol: bracketing canary samples <= 1.25x the 0.26 fair value.")
artifact["provenance"] = prov
json.dump(artifact, open(out_path, "w"), indent=1)
n_fair = sum(1 for d in detail.values() if d["src"] == "r13" and d["fair_segment"])
n_r13 = sum(1 for d in detail.values() if d["src"] == "r13")
print(f"merged {len(names)} queries over {len(wins)} windows -> {out_path}")
print(f"total {total:.2f}s; {n_r13} minima from r13 windows ({n_fair} in fair segments), "
      f"{len(names) - n_r13} carried from the previous chain")
