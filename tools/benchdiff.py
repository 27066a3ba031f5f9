#!/usr/bin/env python3
"""Same-HEAD bench stability check (r19 verdict ask #2).

Compares two BENCH.json artifacts on their common per-query MINS and
reports the movement distribution. The bench's estimator is already
min-of-interleaved-passes with spread-gated resampling — what totals
hide is that a sum of 300+ mins moves when ANY min was contended in
every pass; the per-query comparison is the signal the verdict should
read. Queries under the spread floor (0.25 s) are compared but
reported separately: at that size the ratio measures scheduler jitter,
not plan cost.

A "mover" needs BOTH a relative move > threshold AND an absolute move
> 0.1 s: on a shared box, sub-second queries' mins wobble by a few
tens of ms no matter how many samples corroborate them (scheduler
quantum + one GC), and a 60 ms delta on a 0.4 s query is 15% of
nothing — a plan regression that matters at scale either moves real
wall time here or shows up in the ladder/plan audits. Pure-relative
micro-moves are reported separately as jitter so nothing is hidden.

Usage: python3 tools/benchdiff.py A.json B.json [threshold_pct=10]
Exit 1 if any query moved more than threshold AND more than 0.1 s.
"""
import json, sys

ABS_FLOOR_S = 0.1

def main():
    a = json.load(open(sys.argv[1]))['queries']
    b = json.load(open(sys.argv[2]))['queries']
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    common = sorted(set(a) & set(b))
    movers, tiny_movers = [], []
    for q in common:
        lo, hi = sorted((a[q], b[q]))
        pct = (hi / lo - 1.0) * 100 if lo > 0 else 0.0
        if pct > thr:
            (movers if hi - lo > ABS_FLOOR_S else tiny_movers)\
                .append((pct, q, a[q], b[q]))
    pcts = sorted((max(a[q], b[q]) / min(a[q], b[q]) - 1) * 100
                  for q in common if min(a[q], b[q]) > 0)
    if not pcts:
        # mismatched artifacts (no shared queries, or all-zero mins)
        # should diagnose, not stack-trace (ADVICE r20)
        print("no comparable queries between the two artifacts "
              f"(common={len(common)})")
        sys.exit(2)
    def pctl(p):
        return pcts[min(len(pcts) - 1, int(p / 100 * len(pcts)))]
    print(f"common queries: {len(common)}")
    print(f"total A={sum(a[q] for q in common):.1f}s "
          f"B={sum(b[q] for q in common):.1f}s")
    print(f"per-query |move|: p50={pctl(50):.1f}% p90={pctl(90):.1f}% "
          f"p99={pctl(99):.1f}% max={pcts[-1]:.1f}%")
    print(f">{thr:.0f}% AND >{ABS_FLOOR_S}s movers: {len(movers)}; "
          f"relative-only jitter (<={ABS_FLOOR_S}s delta): {len(tiny_movers)}")
    for pct, q, va, vb in sorted(movers, reverse=True):
        print(f"  MOVED {q}: {va:.3f} vs {vb:.3f} ({pct:.0f}%)")
    for pct, q, va, vb in sorted(tiny_movers, reverse=True)[:10]:
        print(f"  (jitter) {q}: {va:.3f} vs {vb:.3f} ({pct:.0f}%)")
    sys.exit(1 if movers else 0)

if __name__ == '__main__':
    main()
