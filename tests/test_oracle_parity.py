"""Every registered query must hash-match its DuckDB oracle (driver contract)."""

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare_query_to_oracle

# the entry module imports every registering module — the same loader
# the driver uses, so this parameterization can never miss a newly
# added plans/operators module the way per-module imports could
_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = _QUERIES[name](spark, sf_dir)
    compare_query_to_oracle(df, _ORACLES[name], sf_dir)
