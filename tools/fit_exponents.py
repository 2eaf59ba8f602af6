#!/usr/bin/env python
"""Fit log-log scaling exponents from measure_scaling.py output.

Usage:
  python tools/measure_scaling.py /tmp/scale1x /tmp/scale10x /tmp/scale30x \
      > /tmp/scaling_results.json
  python tools/fit_exponents.py /tmp/scaling_results.json

Input is the JSON list printed by measure_scaling.py (one entry per
corpus scale, each carrying the MEASURED candidate counts next to the
analytic bounds). For each bounded family this prints the least-squares
slope of log(candidates) vs log(n_docs) across all points — the
empirical scaling exponent. The design claims are linear-ish bounds
(n·K neighbors, collision-bounded postings), so the pass criterion is
an exponent ≈ 1 (and far below 2, the naive pair-space exponent).

Accepts either the raw list or the SCALING.json wrapper (uses its
``batch_families`` key), so it can re-fit the checked-in evidence.
"""

import json
import math
import sys


def _get(path, rec):
    cur = rec
    for k in path.split("."):
        cur = cur[k]
    return cur


METRICS = [
    ("jaccard.candidates", "jaccard candidates"),
    ("lsh.candidates", "lsh candidates"),
    ("er_fuzzy.candidates", "er comparator calls"),
    ("semdedup.comparisons_6bit", "semdedup cmp (fixed 6-bit)"),
    ("semdedup.comparisons_scaled_bits", "semdedup cmp (scaled bits)"),
    ("semdedup.comparisons_ivf", "semdedup cmp (trained IVF cells)"),
    ("ts_similarity.candidates", "ts candidates"),
    ("source_overlap.shingle_source_rows", "overlap postings"),
]


def main() -> None:
    res = json.load(open(sys.argv[1]))
    if isinstance(res, dict):
        res = res["batch_families"]
    xs = [r["n_docs"] for r in res]
    print(f"scales (n_docs): {xs}")
    lx = [math.log(x) for x in xs]
    for path, label in METRICS:
        try:
            ys = [_get(path, r) for r in res]
        except KeyError:
            continue
        if any(y is None or y <= 0 for y in ys):
            print(f"{label}: {ys} (skip fit)")
            continue
        ly = [math.log(y) for y in ys]
        n = len(lx)
        sx, sy = sum(lx), sum(ly)
        sxx = sum(a * a for a in lx)
        sxy = sum(a * b for a, b in zip(lx, ly))
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        print(f"{label}: {ys}  exponent≈{slope:.2f}")


if __name__ == "__main__":
    main()
