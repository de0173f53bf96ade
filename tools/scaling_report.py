#!/usr/bin/env python3
"""Per-query scale-growth report: compares two graft.Bench JSON
artifacts (e.g. sf0.1 vs sf1) and classifies each query's time growth
against the data growth factor.

A query is flagged super-linear when t_big/t_small exceeds
factor * SLACK (SLACK absorbs host drift + fixed overheads that
amortize the other way). Sub-linear/flat growth is the common good
case: fixed per-query overhead (plan, JIT, small dims) dominating at
small scale.

Usage: scaling_report.py <bench_small.json> <bench_big.json> <factor> [out.md]
"""
import json
import sys

SLACK = 1.6


def load(p):
    d = json.load(open(p))
    # driver BENCH_r*.json wraps the parsed line under "parsed"
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main():
    small_p, big_p, factor = sys.argv[1], sys.argv[2], float(sys.argv[3])
    out = sys.argv[4] if len(sys.argv) > 4 else None
    small, big = load(small_p), load(big_p)
    qs, qb = small["queries"], big["queries"]
    rows = []
    for name in sorted(set(qs) & set(qb)):
        g = qb[name] / qs[name] if qs[name] > 0 else float("inf")
        rows.append((name, qs[name], qb[name], g))
    rows.sort(key=lambda r: -r[3])
    supers = [r for r in rows if r[3] > factor * SLACK]
    lines = [
        f"| query | t_small (s) | t_big (s) | growth | verdict |",
        f"|---|---|---|---|---|",
    ]
    for name, ts, tb, g in rows:
        verdict = ("SUPER-LINEAR" if g > factor * SLACK
                   else "~linear" if g > factor / SLACK
                   else "sub-linear")
        lines.append(f"| {name} | {ts:.3f} | {tb:.3f} | {g:.2f}x | {verdict} |")
    totals = (sum(qs[n] for n, *_ in [(r[0],) for r in rows]),
              sum(qb[n] for n, *_ in [(r[0],) for r in rows]))
    header = (
        f"data growth: {factor:.0f}x | queries: {len(rows)} | "
        f"total {totals[0]:.1f}s -> {totals[1]:.1f}s "
        f"({totals[1]/totals[0]:.2f}x) | super-linear (> {factor*SLACK:.1f}x): "
        f"{len(supers)}"
    )
    text = header + "\n\n" + "\n".join(lines) + "\n"
    if out:
        open(out, "w").write(text)
        print(header)
        print(f"wrote {out}")
    else:
        print(text)


if __name__ == "__main__":
    main()
