"""dq_validation_suite must *detect* planted violations, not just pass
on clean data — the parity test only proves agreement with the oracle
on the pristine corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from flink_realtime_data_warehouse_spark.operators.dq import dq_validation_suite
from flink_realtime_data_warehouse_spark.sources.tables import load_table


@pytest.fixture()
def dirty_sf_dir(spark, sf_dir, tmp_path):
    """Copy of the smoke tables with planted contract violations:
    a duplicated order PK, a null o_custkey, an orphan o_custkey,
    and a lineitem with quantity 99."""
    out = tmp_path / "dirty"
    out.mkdir()
    orders = load_table(spark, sf_dir, "orders")
    first = orders.limit(1)
    planted = (
        orders.unionByName(first)  # pk_dup += 1
        .unionByName(
            first.withColumn("o_orderkey", F.lit(999_999_001))
            .withColumn("o_custkey", F.lit(None).cast("long"))  # null fk
        )
        .unionByName(
            first.withColumn("o_orderkey", F.lit(999_999_002))
            .withColumn("o_custkey", F.lit(888_888_888))  # orphan fk
        )
    )
    planted.coalesce(1).write.parquet(str(out / "orders.parquet"))

    lineitem = load_table(spark, sf_dir, "lineitem")
    bad_li = lineitem.limit(1).withColumn("l_quantity", F.lit(99.0))
    lineitem.unionByName(bad_li).coalesce(1).write.parquet(
        str(out / "lineitem.parquet")
    )

    for t in ("customer",):
        load_table(spark, sf_dir, t).write.parquet(str(out / f"{t}.parquet"))
    return str(out)


def test_dq_detects_planted_violations(spark, dirty_sf_dir):
    got = {
        r["check_name"]: (r["violations"], r["passed"])
        for r in dq_validation_suite(spark, dirty_sf_dir).collect()
    }
    assert got["pk_unique"] == (1, False)
    assert got["fk_not_null"] == (1, False)
    assert got["ri_orders_customer"] == (1, False)
    assert got["quantity_in_range"] == (1, False)
    # untouched contracts still pass
    assert got["totalprice_positive"][1] is True
    assert got["discount_in_range"][1] is True


def test_dq_checked_rows_counts(spark, dirty_sf_dir):
    rows = dq_validation_suite(spark, dirty_sf_dir).collect()
    by_table = {r["table_name"] for r in rows}
    assert by_table == {"orders", "lineitem"}
    n_orders = {r["checked_rows"] for r in rows if r["table_name"] == "orders"}
    assert len(n_orders) == 1  # every orders check saw the same row count


def test_drift_report_detects_planted_shift(spark):
    """A truncation bug in the incoming slice (texts cut to 3 words)
    must spike the TVD past the gate."""
    import pyspark.sql.functions as F

    from flink_realtime_data_warehouse_spark.operators.dq import (
        DRIFT_GATE_BP,
        DRIFT_MOD,
    )
    from flink_realtime_data_warehouse_spark.plans.loader import load_all
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    queries, _ = load_all()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    is_inc = F.pmod("doc_id", F.lit(DRIFT_MOD)) == DRIFT_MOD - 1
    broken = docs.withColumn(
        "text",
        F.when(is_inc, F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3))).otherwise(
            F.col("text")
        ),
    ).withColumn(
        "n_chars", F.length("text")
    )
    broken.createOrReplaceTempView("_drift_broken")
    # rebuild the operator body over the broken frame by monkey-loading:
    # simplest is to re-run the registered query against a temp dir is
    # not possible (it reads parquet), so drive the same logic inline
    import flink_realtime_data_warehouse_spark.operators.dq as dqmod

    orig = dqmod.load_table
    try:
        dqmod.load_table = lambda spark_, sf_dir_, name_: broken
        out = {r.feature: r for r in queries["dq_drift_report"](spark, "ignored").collect()}
    finally:
        dqmod.load_table = orig
    assert out["n_words"].tvd_bp >= DRIFT_GATE_BP
    assert out["n_words"].drifted
