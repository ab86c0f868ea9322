#!/usr/bin/env python3
"""Min-merge this round's quiet-window bench sidecars into the committed
chain artifact (BENCH_r{N}_local.json), applying the adjudication protocol
in docs/BENCH_NOTES.md "Round 13":

 - per-query r{N} minimum over the given windows;
 - cross-round min-merge with the PREVIOUS chain only for queries whose
   timed code is UNCHANGED since that chain (changed/new queries carry
   this-round-only minima — the stale-minimum hazard, r11 finding);
 - per-query fair-segment annotation (MACHINE-derived, never manual): a
   window draw counts as FAIR when the canary samples bracketing its leg
   position are <= 1.25x the 0.26 cross-round fair value;
 - NO silent coverage shrink (r13 advice): an UNCHANGED query present in
   the previous chain but absent from every window this round carries its
   previous value (src=prev_chain) and is listed in `carried_missing`; a
   CHANGED query absent from every window ABORTS the merge — its previous
   value is stale by definition and this round produced no replacement.

Usage:
  merge_bench.py [--round rN] OUT.json PREV_CHAIN.json CHANGED.txt W1.json [W2.json ...]

CHANGED.txt: one query name per line (comments with #) — queries whose
timed code changed since PREV_CHAIN's commit.
"""
import json, sys

FAIR = 0.26
FAIR_BAR = 1.25 * FAIR

args = sys.argv[1:]
rnd = "r14"
if args and args[0] == "--round":
    rnd = args[1]
    args = args[2:]
out_path, prev_path, changed_path = args[0], args[1], args[2]
windows = args[3:]

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

win_names = {n for w in wins for n in w.get("queries", {})}
# union with the previous chain: a query must never VANISH from the chain
# just because every window this round failed (-1 sentinel) or skipped it
names = sorted(win_names | set(prev_q))

missing_changed = sorted(n for n in names
                         if n in changed and n not in win_names)
if missing_changed:
    sys.exit(f"merge_bench: ABORT — changed queries absent from every window "
             f"(their previous-chain values are stale and this round timed "
             f"nothing): {missing_changed}")

queries, detail, carried_missing = {}, {}, []
for n in names:
    draws = [(w.get("queries", {}).get(n), bracket_fair(w, n)) for w in wins
             if w.get("queries", {}).get(n) is not None]
    if not draws:
        # unchanged + untimed this round: carry the previous chain value
        # (src=prev_chain) instead of silently dropping the row
        queries[n] = prev_q[n]
        detail[n] = {"min": prev_q[n], "src": "prev_chain",
                     "fair_segment": True, "carried_missing": True}
        carried_missing.append(n)
        continue
    r_min = min(v for v, _ in draws)
    fair_min = any(f for v, f in draws if v == r_min)
    if n in changed or n not in prev_q:
        queries[n] = r_min
        detail[n] = {"min": r_min, "src": rnd, "fair_segment": fair_min}
    else:
        merged = min(r_min, prev_q[n])
        queries[n] = merged
        detail[n] = {"min": merged,
                     "src": rnd if merged == r_min else "prev_chain",
                     "fair_segment": fair_min if merged == r_min else True}

total = sum(queries.values())
artifact = {
    "metric": "total", "value": total, "unit": "sec",
    "runs_merged": len(wins),
    "provenance": None,
    f"canaries_{rnd}": [[[c["pos"], round(c["sec"], 3)] for c in w.get("canary", {}).get("series", [])] for w in wins],
    f"changed_queries_{rnd}_only": sorted(changed & set(names)),
    "carried_missing": carried_missing,
    "queries": queries,
    "detail": detail,
    "sf": wins[0].get("sf") if wins else prev.get("sf"),
}
prov = (f"per-query min over {len(wins)} {rnd} quiet windows (canary series in "
        f"canaries_{rnd}, per-query leg positions in the window sidecars), "
        f"cross-round min-merged with {prev_path.split('/')[-1]} for queries "
        f"whose timed code is unchanged since that chain's commit; "
        f"changed_queries_{rnd}_only carry {rnd}-only minima. fair_segment is "
        f"MACHINE-derived per the BENCH_NOTES round-13 protocol: bracketing "
        f"canary samples <= 1.25x the 0.26 fair value. Unchanged queries "
        f"absent from every {rnd} window carry their previous chain value "
        f"(carried_missing); changed queries absent from every window abort "
        f"the merge.")
artifact["provenance"] = prov
json.dump(artifact, open(out_path, "w"), indent=1)
n_fair = sum(1 for d in detail.values() if d["src"] == rnd and d["fair_segment"])
n_rnd = sum(1 for d in detail.values() if d["src"] == rnd)
print(f"merged {len(names)} queries over {len(wins)} windows -> {out_path}")
print(f"total {total:.2f}s; {n_rnd} minima from {rnd} windows ({n_fair} in fair segments), "
      f"{len(names) - n_rnd} carried from the previous chain "
      f"({len(carried_missing)} of them absent from every {rnd} window: {carried_missing})")
