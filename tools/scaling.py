#!/usr/bin/env python3
"""Per-query scaling report between two Bench JSON lines.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [factor]

Prints per-family ratios (big/small) sorted worst-first, flagging
queries whose ratio exceeds the data-scale factor (default 10) —
i.e. super-linear scaling. Dev tool only.
"""
import sys, json


def load(p):
    line = open(p).read().strip()
    return json.loads(line[line.index('{'):])


def main():
    small, big = load(sys.argv[1]), load(sys.argv[2])
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small['queries'], big['queries']
    rows = sorted(
        ((qb[k] / qs[k], k, qs[k], qb[k]) for k in qb if k in qs and qs[k] > 0),
        reverse=True)
    print(f"small: {small['value']:.1f}s/{len(qs)}q (passes={small['passes']})  "
          f"big: {big['value']:.1f}s/{len(qb)}q (passes={big['passes']})  "
          f"data factor: {factor:g}x")
    flagged = 0
    for r, k, x, y in rows:
        flag = " <-- SUPER-LINEAR" if r > factor else ""
        if r > factor or rows.index((r, k, x, y)) < 20:
            print(f"{k:28s} {x:7.2f} -> {y:8.2f}  x{r:5.1f}{flag}")
        flagged += r > factor
    med = sorted(r for r, *_ in rows)[len(rows) // 2]
    print(f"median ratio {med:.2f}; {flagged} quer{'y' if flagged == 1 else 'ies'} over {factor:g}x")


if __name__ == '__main__':
    main()
