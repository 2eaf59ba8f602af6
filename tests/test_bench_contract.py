"""bench.py silently skips HEADLINE names missing from the registry
(`queries.get(name)`); this pins every headline row to a real registry
entry so a rename can't quietly drop a benchmark row — and pins the
scalar keys the driver parses."""

import importlib
import os
import sys

# repo root derived from this file (r5 ADVICE: a hardcoded /root/repo
# imported nothing — or the wrong tree — on any relocated checkout)
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


def test_headline_names_all_registered():
    bench = importlib.import_module("bench")
    entry = importlib.import_module("__spark_entry__")
    registered = set(entry.queries())
    # the two raw ANN probes are injected by bench.main itself
    injected = {"ann_lsh_topk", "ann_pq_topk"}
    missing = [n for n in bench.HEADLINE if n not in registered | injected]
    assert not missing, f"headline rows not in registry: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_every_query_has_oracle_or_is_documented():
    entry = importlib.import_module("__spark_entry__")
    qs, os_ = entry.queries(), entry.oracle_sql()
    assert set(os_) <= set(qs)
    no_oracle = sorted(set(qs) - set(os_))
    # the engine's standing contract since r3: zero no-oracle rows
    assert no_oracle == [], no_oracle


def test_core_scaling_queries_registered():
    """tools/measure_core_scaling.py names one query per heavy family;
    a registry rename must fail here, not at measurement time."""
    tool = importlib.import_module("tools.measure_core_scaling")
    entry = importlib.import_module("__spark_entry__")
    registered = set(entry.queries())
    missing = [n for n in tool.QUERIES if n not in registered]
    assert not missing, f"core-scaling rows not in registry: {missing}"


def test_compact_line_fits_driver_tail_window():
    """The driver keeps only the LAST 2000 chars of bench stdout and
    parses a JSON line out of them — rounds 3-5 all recorded
    "parsed": null because the single output line outgrew that window.
    Pin the final-line contract: with the CURRENT headline set and
    worst-case value widths, the line parses, stays under budget,
    keeps the required driver keys, and any omission drops only the
    fastest rows while "value" still covers all of them."""
    import json

    bench = importlib.import_module("bench")
    names = list(bench.HEADLINE)  # includes the two injected ANN probes
    q = {n: 9.999 for n in names}  # 5-char worst case at 2 decimals
    detail = {
        "metric": "headline_queries_total_wall_sec",
        "value": 999.999,
        "unit": "sec",
        "sf": 0.1,
        "total_min": 999.999,
        "calib_shuffle_sec": 0.518,
        "streaming_rows_per_sec": 123456.7,
        "streaming": {"streaming_rows_per_sec": 123456.7},
        "ann_lsh_warm_sec": 9.999,
        "ann_pq_warm_sec": 9.999,
        "queries": q,
        "queries_min": q,
    }
    line = bench.compact_line(detail)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    for key in ("metric", "value", "unit", "queries", "sf",
                "total_min", "calib_shuffle_sec"):
        assert key in parsed, key
    # uniform values → omission (if any) is by the slowest-first order;
    # the parsed dict plus the omitted count must account for every row
    n_omitted = parsed.get("queries_omitted", 0)
    assert len(parsed["queries"]) + n_omitted == len(names)
    # value covers ALL queries even when some are omitted from the dict
    assert parsed["value"] == 999.999
    # with REALISTIC sub-3s values most rows fit: sanity-floor so a
    # future key addition can't silently shrink coverage to a stub
    real = dict(detail, queries={n: 0.95 for n in names})
    parsed_real = json.loads(bench.compact_line(real))
    assert len(parsed_real["queries"]) >= 55


def test_query_index_in_sync():
    """QUERIES.md is generated; its count line must match the live
    registry so the index can't silently go stale."""
    entry = importlib.import_module("__spark_entry__")
    n = len(entry.queries())
    with open(os.path.join(REPO_ROOT, "QUERIES.md")) as f:
        text = f.read()
    assert f"{n} queries, {n} with DuckDB oracles" in text, (
        "QUERIES.md stale — run tools/gen_query_index.py"
    )
