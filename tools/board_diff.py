#!/usr/bin/env python3
"""Cross-round board diff with CALIBRATION-NORMALIZED ratios.

Usage: python3 tools/board_diff.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json
       [--threshold 1.5]

Each BENCH_FULL.json carries `calib_series`: single-shot CPU probes
interleaved every N queries per pass ({"pass":p,"i":slot,"sec":s}).
A query's machine speed at measurement time is estimated as the MIN,
across passes, of its nearest probe in each pass (min matches the
min-of-k query estimator: one-sided noise only ever inflates). The
normalized time is wall_sec / nearest_probe_sec, so a co-tenant load
burst that slows both the probe and the queries around it cancels
out — the exact adjudication the round-9 judge had to do by hand with
an hour of solo A/B re-runs (BASELINE.md "Interleaved calibration").

Boards written before calib_series fall back to the single start-of-
run calib_sec (the pre-round-10 method, start-load-blind).
"""
import json
import sys

argv = sys.argv[1:]
args = []
thr = 1.5
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--threshold"):
        if "=" in a:
            thr = float(a.split("=", 1)[1])
        else:
            i += 1
            thr = float(argv[i])
    else:
        args.append(a)
    i += 1
if len(args) < 2:
    sys.exit(__doc__)
old = json.load(open(args[0]))
new = json.load(open(args[1]))


def calib_at(board, names):
    """name -> calibration estimate (sec) from the nearest probe.

    Probe slots were recorded against the BOARD'S OWN sorted query
    list, so nearest-probe matching must index each query there —
    indexing into the cross-board intersection would shift every
    query after an added/removed name by its offset.
    """
    series = board.get("calib_series") or []
    fallback = board.get("calib_sec", 1.0)
    if not series:
        return {n: fallback for n in names}
    own_index = {n: i for i, n in enumerate(sorted(board["queries"]))}
    by_pass = {}
    for e in series:
        by_pass.setdefault(e["pass"], []).append((e["i"], e["sec"]))
    for v in by_pass.values():
        v.sort()
    out = {}
    for n in names:
        idx = own_index.get(n, 0)
        per_pass = []
        for probes in by_pass.values():
            nearest = min(probes, key=lambda p: abs(p[0] - idx))
            per_pass.append(nearest[1])
        out[n] = min(per_pass)
    return out


oq, nq = old["queries"], new["queries"]
common = sorted(set(oq) & set(nq))
oc = calib_at(old, common)
nc = calib_at(new, common)
rows = []
for q in common:
    if oq[q] <= 0:
        continue
    raw = nq[q] / oq[q]
    norm = (nq[q] / nc[q]) / (oq[q] / oc[q])
    rows.append((norm, raw, oq[q], nq[q], q))
rows.sort(reverse=True)
print(f"{'norm':>6} {'raw':>6} {'old_s':>8} {'new_s':>8}  query")
flagged = 0
for norm, raw, o, n, q in rows:
    if norm > thr or raw > thr:
        flag = " <-- norm regression" if norm > thr else " (calib-explained)"
        flagged += norm > thr
        print(f"{norm:6.2f} {raw:6.2f} {o:8.3f} {n:8.3f}  {q}{flag}")
tot_o = sum(oq[q] for q in common)
tot_n = sum(nq[q] for q in common)
co = sum(oc[q] for q in common) / max(len(common), 1)
cn = sum(nc[q] for q in common) / max(len(common), 1)
print(f"\n{len(common)} shared queries; board raw {tot_n / tot_o:.3f}x,"
      f" mean calib old {co:.3f}s new {cn:.3f}s"
      f" (machine factor {cn / co:.3f}x),"
      f" board calib-normalized {(tot_n / cn) / (tot_o / co):.3f}x;"
      f" {flagged} queries past {thr}x normalized")
missing = sorted(set(nq) - set(oq))
gone = sorted(set(oq) - set(nq))
if missing:
    print("new-only:", ", ".join(missing))
if gone:
    print("removed:", ", ".join(gone))
