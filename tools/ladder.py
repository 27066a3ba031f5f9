#!/usr/bin/env python3
"""Scale-ladder regression harness: run the full bench corpus at sf0.01
AND sf0.1 and flag any query whose time ratio exceeds the superlinear
band. 10x data should cost ~10x on a linear/n-log-n plan; with fixed
per-query overhead the observed ratio sits well BELOW 10, so a ratio
above the flag line means genuinely superlinear work (a plan that is
fast at sf0.1 but quadratic would sail through every other gate — this
is the only harness that can see it).

Usage:
  python3 tools/ladder.py                 # run both benches, then compare
  python3 tools/ladder.py --use A.json B.json
                                          # compare two existing bench
                                          # artifacts (A = sf0.01, B = sf0.1)

Writes LADDER.json {query: {sf001, sf01, ratio, flag[, expected]}} plus
a summary line, and exits non-zero if any query is flagged.

Flag rule: ratio = t(sf0.1) / max(t(sf0.01), FLOOR) > 8, with the
additional condition t(sf0.1) > 0.5 s — a sub-half-second query's ratio
is dominated by scheduling jitter, and a "blowup" that still lands
under half a second at sf0.1 is a measurement artifact, not a plan
risk. Bench artifacts already record the per-query MIN across
interleaved shuffled passes, which is the noise-robust estimator (see
Bench.scala).

Known-superlinear rows (EXPECTED, annotated in the artifact, flagged
only above their own tier of 2x the historical ratio): shapes whose
work grows faster than the input BY DESIGN — quadratic-per-key
self-joins, bootstrap trials over bigger groups, exact all-pairs truth
arms. Listing them here keeps the GLOBAL flag line tight (8x) without
red-flagging physics; a regression WITHIN one of these shapes still
flags when it doubles its own historical ratio.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLOOR = 0.05   # s: denominator guard for near-zero sf0.01 times
RATIO_FLAG = 8.0
MIN_ABS = 0.5  # s: sf0.1 time below this can't be a scale risk

# Shapes that are superlinear by design, with the r14-observed ratio
# and why. Their per-row flag line is 2x the historical ratio — a
# genuine trend regression (the shape got WORSE) still flags.
EXPECTED_SUPERLINEAR = {
    "a14_bootstrap":   (5.1, "bootstrap: per-group trial fan-out grows with group size"),
    "j05_self_theta":  (4.9, "banded self theta-join: pairs per band grow ~quadratically"),
    "r15_scene_graph": (4.5, "frame self-joins: object pairs per frame grow quadratically"),
    "a04_sum_distinct":(3.9, "distinct agg: distinct-key volume grows superlinearly at this SF step"),
    "p02_computed":    (3.8, "computed-key shuffle: key cardinality grows with SF"),
}


def run_bench(sf_dir: str, out_path: str) -> dict:
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_OUT=out_path)
    env.pop("SPARK_GRAFT_BENCH_ONLY", None)  # the ladder is full-corpus
    print(f"[ladder] benching {sf_dir} -> {out_path}", flush=True)
    subprocess.run(["sbt", "-batch", "runMain graft.Bench"],
                   cwd=REPO, env=env, check=True,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    with open(out_path) as f:
        return json.load(f)


def main() -> int:
    if len(sys.argv) >= 4 and sys.argv[1] == "--use":
        with open(sys.argv[2]) as f:
            lo = json.load(f)
        with open(sys.argv[3]) as f:
            hi = json.load(f)
    else:
        lo = run_bench("/root/testdata/sf0.01", "/tmp/ladder_sf001.json")
        hi = run_bench("/root/testdata/sf0.1", "/tmp/ladder_sf01.json")

    qlo, qhi = lo["queries"], hi["queries"]
    missing = sorted(set(qlo) ^ set(qhi))
    if missing:
        print(f"[ladder] WARNING: query sets differ: {missing}")

    report, flagged = {}, []
    for name in sorted(set(qlo) & set(qhi)):
        t001, t01 = qlo[name], qhi[name]
        ratio = t01 / max(t001, FLOOR)
        exp = EXPECTED_SUPERLINEAR.get(name)
        line = 2.0 * exp[0] if exp else RATIO_FLAG
        flag = ratio > line and t01 > MIN_ABS
        row = {"sf001": round(t001, 3), "sf01": round(t01, 3),
               "ratio": round(ratio, 2), "flag": flag}
        if exp:
            row["expected"] = {"historical_ratio": exp[0], "why": exp[1],
                               "flag_line": line}
        report[name] = row
        if flag:
            flagged.append(name)

    out = os.path.join(REPO, "LADDER.json")
    with open(out, "w") as f:
        json.dump({"floor_s": FLOOR, "ratio_flag": RATIO_FLAG,
                   "min_abs_s": MIN_ABS, "flagged": flagged,
                   "queries": report}, f, indent=1, sort_keys=True)

    top = sorted(report.items(), key=lambda kv: -kv[1]["ratio"])[:10]
    print(f"[ladder] {len(report)} queries; {len(flagged)} flagged "
          f"(ratio > {RATIO_FLAG} [2x historical for annotated rows] "
          f"and sf0.1 > {MIN_ABS}s); top ratios:")
    for name, r in top:
        mark = " <-- FLAG" if r["flag"] else (
            " (expected)" if "expected" in r else "")
        print(f"  {name:28s} {r['sf001']:7.3f}s -> {r['sf01']:7.3f}s "
              f"x{r['ratio']:6.2f}{mark}")
    print(f"[ladder] wrote {out}")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
