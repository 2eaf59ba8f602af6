"""bench.py silently skips HEADLINE names missing from the registry
(`queries.get(name)`); this pins every headline row to a real registry
entry so a rename can't quietly drop a benchmark row — and pins the
scalar keys the driver parses."""

import importlib
import sys


def test_headline_names_all_registered():
    sys.path.insert(0, "/root/repo")
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
    sys.path.insert(0, "/root/repo")
    tool = importlib.import_module("tools.measure_core_scaling")
    entry = importlib.import_module("__spark_entry__")
    registered = set(entry.queries())
    missing = [n for n in tool.QUERIES if n not in registered]
    assert not missing, f"core-scaling rows not in registry: {missing}"


def test_query_index_in_sync():
    """QUERIES.md is generated; its count line must match the live
    registry so the index can't silently go stale."""
    entry = importlib.import_module("__spark_entry__")
    n = len(entry.queries())
    with open("/root/repo/QUERIES.md") as f:
        text = f.read()
    assert f"{n} queries, {n} with DuckDB oracles" in text, (
        "QUERIES.md stale — run tools/gen_query_index.py"
    )
