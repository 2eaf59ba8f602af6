"""Hostile-session parity: every registered query must hash-match its
oracle from a session configured the way the round-1 bug reproduced —
non-UTC session timezone (Asia/Shanghai) and parquet NTZ inference off.

This is the verify-skill probe promoted to a permanent suite tier: the
driver runs queries in ITS OWN session, so any result that depends on
the session timezone (date_trunc coercion, LTZ casts, date_format) or
on NTZ inference is a live correctness bug even while the UTC suite is
green. Queries must be session-proof by construction (NTZ transport,
epoch-integer arithmetic), not by luck of the driver's config.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare_query_to_oracle

#: hostile-session sweep — deselected from the default (driver-window) profile;
#: runs in the recorded slow-tier pass (see pytest.ini)
pytestmark = pytest.mark.slowtier


_QUERIES = entrymod.queries()
_ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def hostile_spark(spark):
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "Asia/Shanghai")
    s2.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    s2.conf.set("spark.sql.shuffle.partitions", "8")
    return s2


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle_under_hostile_session(hostile_spark, sf_dir, name):
    df = _QUERIES[name](hostile_spark, sf_dir)
    compare_query_to_oracle(df, _ORACLES[name], sf_dir)
