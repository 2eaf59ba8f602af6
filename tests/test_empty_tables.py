"""Every registered query must run (not crash) on zero-row tables —
at warehouse scale, empty slices (a day with no events, a tenant with
no documents, a cold-start corpus) are routine inputs, and an ANSI
divide-by-zero or a NumPy stack-of-nothing must not abort the job.

Found and fixed in round 3: ads_funnel_view_signup (DIVIDE_BY_ZERO on
zero viewers → try_divide) and the three ANN entry points (np.stack on
an empty query block → empty-result early exit).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in _TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
    assert not failures, failures
