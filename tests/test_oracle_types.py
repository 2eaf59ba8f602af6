"""Every oracle's output schema must be pandas-hash-safe (driver contract).

The external driver fetches oracle results through pandas; DuckDB types
outside this allowlist canonicalize lossily there and go hash-red even
when values match Spark exactly:

* HUGEINT (int128) -> float64 — DuckDB promotes window ``sum(BIGINT)``
  and propagates it through ``//``; cost us the r3
  ``pack_training_sequences`` / ``graph_pagerank_event_transitions``
  rows (``72.0`` hashed against Spark's ``72``). Fix: ``CAST(... AS
  BIGINT)`` in the final projection.
* LIST/STRUCT/MAP -> numpy arrays / dicts — unhashable under the
  driver's row sort; cost us the r2 ``fn_array_suite`` row. Fix:
  serialize to strings (``concat_ws`` / ``to_json``) on BOTH sides.
* DECIMAL -> precision-dependent float rendering.

This sweep needs no Spark session and runs in seconds: any window
``sum()`` / ``//`` chain or array-returning expression someone adds to a
final projection fails HERE, locally, instead of in the next round's
CORRECTNESS report.
"""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import oracle_connection

SF_DIR = "/root/testdata/sf0.001"

ALLOWED = {"BIGINT", "INTEGER", "SMALLINT", "TINYINT", "DOUBLE", "FLOAT",
           "VARCHAR", "DATE", "BOOLEAN"}

_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = oracle_connection(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_schema_is_driver_hashable(con, name):
    sql = _ORACLES[name].rstrip().rstrip(";")
    desc = con.execute(f"DESCRIBE ({sql})").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in desc
        if typ not in ALLOWED and not typ.startswith("TIMESTAMP")
    ]
    assert not bad, (
        f"oracle {name!r} emits pandas-hostile column types {bad}; "
        "CAST integer chains to BIGINT and serialize containers to VARCHAR "
        "in the final projection (driver hashes through pandas)"
    )
