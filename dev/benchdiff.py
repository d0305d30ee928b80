#!/usr/bin/env python3
"""Dev-only bench comparator: diffs a builder-local bench_full.json
against the driver's BENCH_r{N}.json artifact per query and flags
divergence beyond a threshold (default 3x), so a local narrative can
never silently drift from the driver's numbers again (round-3 lesson).
NOT part of the shipped library.

Usage: python3 dev/benchdiff.py [local_bench.json] [driver_BENCH.json] [--ratio 3.0]
Defaults: ./bench_full.json vs the highest-numbered ./BENCH_r*.json.
"""
import sys, os, json, glob, re

args = [a for a in sys.argv[1:] if not a.startswith("--")]
ratio = 3.0
for a in sys.argv[1:]:
    if a.startswith("--ratio"):
        ratio = float(a.split("=", 1)[1]) if "=" in a else float(sys.argv[sys.argv.index(a) + 1])

local_path = args[0] if len(args) > 0 else "bench_full.json"
if len(args) > 1:
    driver_path = args[1]
else:
    cands = sorted(glob.glob("BENCH_r*.json"))
    if not cands:
        print("no BENCH_r*.json found"); sys.exit(1)
    driver_path = cands[-1]

def load_queries(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"], d.get("value")
    # driver artifact: the JSON line may be wrapped ({"tail": ...}) or parsed
    if d.get("parsed"):
        p = d["parsed"]
        return p.get("queries", {}), p.get("value")
    m = re.findall(r'\{"metric".*', d.get("tail", ""))
    if m:
        p = json.loads(m[-1])
        return p.get("queries", {}), p.get("value")
    print(f"cannot find a queries map in {path}"); sys.exit(1)

lq, ltot = load_queries(local_path)
dq, dtot = load_queries(driver_path)

common = sorted(set(lq) & set(dq))
only_driver = sorted(set(dq) - set(lq))
flagged = []
for q in common:
    a, b = lq[q], dq[q]
    if min(a, b) <= 0:
        continue
    r = max(a, b) / min(a, b)
    if r >= ratio and max(a, b) >= 0.5:  # ignore sub-500ms jitter
        flagged.append((r, q, a, b))

print(f"local  {local_path}: total={ltot}s over {len(lq)} queries")
print(f"driver {driver_path}: total={dtot}s over {len(dq)} queries")
if only_driver:
    print(f"driver-only queries (not in local run): {', '.join(only_driver[:10])}"
          + (" ..." if len(only_driver) > 10 else ""))
for r, q, a, b in sorted(flagged, reverse=True):
    direction = "local SLOWER" if a > b else "driver slower (co-tenant? plan?)"
    print(f"XX {q}: local {a:.2f}s vs driver {b:.2f}s ({r:.1f}x — {direction})")
if not flagged:
    print(f"no per-query divergence >= {ratio}x (ignoring <0.5s)")
sys.exit(1 if any(a > b for _, _, a, b in flagged) else 0)
