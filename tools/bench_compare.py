#!/usr/bin/env python3
"""Bench regression tripwire: diff two bench_summary.json files and print
the rows that got more than FACTOR (default 1.5x) slower.

Usage: python3 tools/bench_compare.py <prev_summary.json> <cur_summary.json> [factor]

graft.Bench runs the same diff automatically, PREFERRING the best-known
per-query min map (bench_min.json — format-compatible with this tool, so
`bench_compare.py bench_min.json bench_summary.json` reproduces the
tripwire's exact diff) and falling back to the summary it is about to
overwrite (one `[bench] tripwire:` stderr line). Bench folds every run into
bench_min.json per-query-min-wise and never raises an entry, so a single
contended run (driver or builder) cannot poison the diff side. This tool is
the explicit cross-file form for comparing arbitrary rounds. Rows under
0.75 s in the current run never flag (sub-noise), and rows that are null
(failed) on either side are skipped — a failure is a correctness problem,
not a regression measurement.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.load(f)
    return {k: v for k, v in d["queries"].items()
            if isinstance(v, (int, float))}


def main(prev_path, cur_path, factor=1.5):
    prev, cur = load(prev_path), load(cur_path)
    shared = sorted(set(prev) & set(cur))
    regs = [(k, prev[k], cur[k], cur[k] / prev[k])
            for k in shared
            if cur[k] > prev[k] * factor and cur[k] >= 0.75]
    regs.sort(key=lambda r: -r[3])
    for k, p, c, r in regs:
        print(f"REGRESSION {k}: {p:.2f}s -> {c:.2f}s ({r:.2f}x)")
    faster = sum(1 for k in shared if cur[k] < prev[k])
    tp = sum(prev[k] for k in shared)
    tc = sum(cur[k] for k in shared)
    print(f"== {len(regs)} rows >{factor}x slower of {len(shared)} compared; "
          f"{faster} faster; shared total {tp:.1f}s -> {tc:.1f}s ==")
    return 1 if regs else 0


if __name__ == "__main__":
    f = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    sys.exit(main(sys.argv[1], sys.argv[2], f))
