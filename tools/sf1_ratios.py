#!/usr/bin/env python3
"""Diff the standing sf1 full-board bench against the sf0.1 board.

Usage: python3 tools/sf1_ratios.py [BENCH_FULL.json] [BENCH_FULL_SF1.json]

Prints per-query sf1/sf0.1 wall-clock ratios sorted descending and
flags everything past the 10x threshold (BASELINE.md protocol: a
query 10x slower on 10x data without a recorded reason needs a look —
linear operators should land well under that, metadata-rate ones near
1x). Mind the passes: BENCH_FULL.json is min-of-2, the sf1 board is
single-pass, which biases every ratio upward by the warm-up delta.
"""
import json
import sys

base_p = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
sf1_p = sys.argv[2] if len(sys.argv) > 2 else "BENCH_FULL_SF1.json"
base = json.load(open(base_p))
sf1 = json.load(open(sf1_p))
bq, sq = base["queries"], sf1["queries"]
common = sorted(set(bq) & set(sq))
rows = [(sq[q] / bq[q] if bq[q] > 0 else float("inf"), bq[q], sq[q], q)
        for q in common]
rows.sort(reverse=True)
print(f"{'ratio':>7} {'sf0.1':>8} {'sf1':>8}  query")
flagged = 0
for r, b, s1, q in rows:
    flag = " <-- >10x" if r > 10 else ""
    if r > 10:
        flagged += 1
    if r > 3 or flag:
        print(f"{r:7.2f} {b:8.3f} {s1:8.3f}  {q}{flag}")
tot_b = sum(bq[q] for q in common)
tot_s = sum(sq[q] for q in common)
print(f"\n{len(common)} shared queries; board ratio "
      f"{tot_s / tot_b:.2f}x for 10x data; {flagged} past 10x")
missing = sorted(set(sq) - set(bq)) + sorted(set(bq) - set(sq))
if missing:
    print("not shared:", ", ".join(missing))
