#!/usr/bin/env python
"""Cross-round bench comparison, calibration-normalized.

Raw per-query deltas between rounds conflate plan changes with host
drift (measured range so far: calib_shuffle_sec 0.34-0.52 across
rounds, a 1.5x swing on identical code). This tool divides that out:

    ratio(q)      = new_min(q) / old_min(q)
    norm_ratio(q) = ratio(q) / (new_calib / old_calib)

and flags structural regressions (norm_ratio > FLAG_AT on queries
above the noise floor). Feed it two bench outputs — either the
driver's BENCH_r{N}.json captures (it reads the parsed dict or
re-parses the tail) or local bench_detail.json files.

Usage:
  python tools/compare_bench.py BENCH_r05.json bench_detail.json
"""

from __future__ import annotations

import json
import re
import sys

FLAG_AT = 1.5  #: normalized ratio above this = structural regression
NOISE_FLOOR_SEC = 0.3  #: sub-noise rows are host scheduling, not plans

#: rows whose wall is dominated by Arrow/NumPy kernels, not shuffle:
#: these track the host's COMPUTE drift (calib_cpu_sec, r9), which on
#: this box swings ~2x independently of shuffle speed — normalizing
#: them by the shuffle calibration produced three rounds of phantom
#: regression flags that each needed a manual microbench session
#: (BASELINE.md r6/r7/r8 notes). Prefix families + named singletons.
_CPU_BOUND_PREFIXES = ("ann_", "multimodal_")
_CPU_BOUND_NAMES = {
    "dedup_embedding_pairs",
    "dedup_semantic_groups",
    "decontam_semantic_overlap",
    "ts_similarity_pairs",
}


def _is_cpu_bound(name: str) -> bool:
    return name.startswith(_CPU_BOUND_PREFIXES) or name in _CPU_BOUND_NAMES


def load_bench(path: str) -> dict:
    """Accept a driver capture ({"parsed": ..., "tail": ...}) or a raw
    bench detail/compact dict; recover queries from the tail when the
    driver's parse failed (rounds 3-5)."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d or "queries_min" in d:
        return d
    if d.get("parsed"):
        return d["parsed"]
    tail = d.get("tail", "")
    # Preferred recovery: the compact final line is itself JSON — parse the
    # last brace-balanced object in the tail and read its queries sub-dict
    # (regex-scraping a JSON line invites scalar keys into the query map).
    start = tail.rfind('{"metric"')
    if start < 0:
        start = tail.rfind("{")
    if start >= 0:
        try:
            parsed = json.loads(tail[start:])
            if isinstance(parsed, dict) and (
                "queries" in parsed or "queries_min" in parsed
            ):
                return parsed
        except (json.JSONDecodeError, ValueError):
            pass
    # Last resort: regex over a truncated tail. ":\s*" tolerates both the
    # spaced and the compact (separators=(",", ":")) serializations, and the
    # exclusion list names every known scalar so none is mistaken for a
    # query timing.
    _SCALARS = {
        "n",
        "rc",
        "cpus",
        "sf",
        "value",
        "total_min",
        "calib",
        "calib_shuffle_sec",
        "calib_cpu_sec",
        "streaming_rows_per_sec",
        "streaming_rows_per_sec_cold",
        "streaming_startup_sec",
        "hist_gate_rps",
        "omitted_sec",
        "queries_omitted",
    }
    q = {
        n: float(v)
        for n, v in re.findall(r'"([a-z0-9_]+)":\s*([0-9.]+)', tail)
        if n not in _SCALARS
    }
    calib = None
    m = re.search(r'"calib(?:_shuffle_sec)?":\s*([0-9.]+)', tail)
    if m:
        calib = float(m.group(1))
    return {"queries": q, "queries_min": q, "calib_shuffle_sec": calib}


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__.strip(), file=sys.stderr)
        raise SystemExit(2)
    old, new = load_bench(sys.argv[1]), load_bench(sys.argv[2])
    qo = old.get("queries_min") or old["queries"]
    qn = new.get("queries_min") or new["queries"]
    co = old.get("calib_shuffle_sec") or old.get("calib")
    cn = new.get("calib_shuffle_sec") or new.get("calib")
    drift = (cn / co) if co and cn else 1.0
    cpu_o, cpu_n = old.get("calib_cpu_sec"), new.get("calib_cpu_sec")
    # CPU-bound rows normalize by compute drift when BOTH captures carry
    # the r9+ scalar; otherwise they fall back to shuffle drift (the
    # pre-r9 behavior — flags on those rows then still need the manual
    # microbench adjudication the scalar exists to retire)
    cpu_drift = (cpu_n / cpu_o) if cpu_o and cpu_n else drift
    common = sorted(set(qo) & set(qn))
    rows = []
    for q in common:
        if not qo[q]:
            continue
        ratio = qn[q] / qo[q]
        d = cpu_drift if _is_cpu_bound(q) else drift
        rows.append((q, qo[q], qn[q], ratio, ratio / d))
    rows.sort(key=lambda r: -r[4])
    flagged = [
        r for r in rows if r[4] > FLAG_AT and max(r[1], r[2]) > NOISE_FLOOR_SEC
    ]
    # streaming: steady-state rate + startup tax compared when both
    # captures carry them (r7+). Pre-r7 captures stored the COLD wall
    # rate under the name "streaming_rows_per_sec"; comparing that
    # against the r7+ steady-state rate under the same key would report
    # the semantic change as a throughput win, so when the old capture
    # lacks the _cold key, compare the NEW cold scalar against the old
    # value instead and skip the steady-state key entirely.
    streaming = {}
    old_is_pre_r7 = (
        "streaming_rows_per_sec" in old
        and "streaming_rows_per_sec_cold" not in old
    )
    for key in (
        "streaming_rows_per_sec",
        "streaming_startup_sec",
        "streaming_rows_per_sec_cold",
        "hist_gate_rps",
    ):
        so, sn = old.get(key), new.get(key)
        if old_is_pre_r7 and key == "streaming_rows_per_sec":
            sn = new.get("streaming_rows_per_sec_cold")
            if so and sn:
                streaming["streaming_rows_per_sec_cold_vs_old_cold"] = {
                    "old": so,
                    "new": sn,
                    "ratio": round(sn / so, 3),
                }
            continue
        if old_is_pre_r7 and key == "streaming_rows_per_sec_cold":
            continue  # folded into the explicit cold-vs-cold row above
        if so and sn:
            streaming[key] = {
                "old": so,
                "new": sn,
                "ratio": round(sn / so, 3),
            }
    print(
        json.dumps(
            {
                "common_queries": len(common),
                "old_total_min": round(sum(qo[q] for q in common), 2),
                "new_total_min": round(sum(qn[q] for q in common), 2),
                "calib_drift": round(drift, 3),
                "calib_cpu_drift": round(cpu_drift, 3)
                if cpu_o and cpu_n
                else None,
                **({"streaming": streaming} if streaming else {}),
                "flagged": [
                    {
                        "query": q,
                        "old": o,
                        "new": n,
                        "raw_ratio": round(r, 2),
                        "norm_ratio": round(nr, 2),
                    }
                    for q, o, n, r, nr in flagged
                ],
                "top5_norm": [
                    {"query": q, "old": o, "new": n, "norm_ratio": round(nr, 2)}
                    for q, o, n, r, nr in rows[:5]
                ],
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
