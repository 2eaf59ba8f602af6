"""Tests for the hypertable rollup cascade, binned range join, and
heavy-hitter sketch (plans/rollups.py) beyond the oracle parity suite:
the physical-plan guarantee (single fact scan via exchange reuse) and
the algebraic identities the operators rely on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.rollups import (
    RANGE_BIN,
    RANGE_N_BANDS,
    FREQ_SUPPORT,
    join_range_binned,
    rollup_hypertable,
    sketch_topk_frequent,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table


def test_rollup_cascade_reuses_minute_exchange(spark, sf_dir):
    """The hour and day grains must re-aggregate the minute partials,
    not re-scan the fact table: after execution the adaptive plan has to
    show the minute exchange reused by both coarser branches. This is
    the operator's entire scale story (one scan for three grains), so it
    is pinned — a regression to three scans stays correct but 3× the IO.
    """
    df = rollup_hypertable(spark, sf_dir)
    # collect() (not write) so THIS DataFrame's adaptive plan executes —
    # AQE stage reuse only materializes in the executed final plan
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan, plan
    assert plan.count("ReusedExchange") >= 2, plan


def test_rollup_grains_are_consistent(spark, sf_dir):
    """Re-aggregated coarse grains must equal direct aggregation: the
    day row totals derived minute→hour→day have to match a one-shot
    day-level aggregation of the raw table (decomposability check)."""
    out = {
        (r["grain"], r["bucket"]): (r["n_events"], r["total_value"], r["max_value"])
        for r in rollup_hypertable(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    direct = (
        ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("tv"),
            F.round(F.max("value"), 2).alias("mv"),
        )
        .collect()
    )
    assert direct, "fixture must not be empty"
    for r in direct:
        key = ("day", __import__("datetime").datetime.combine(r["d"], __import__("datetime").time()))
        assert key in out, f"missing day bucket {r['d']}"
        n, tv, mv = out[key]
        assert n == r["n"] and mv == r["mv"]
        # sum cascades through two float re-aggregations; compare loosely
        assert abs(tv - r["tv"]) < 0.02, (tv, r["tv"])


def test_range_binned_equals_naive_theta_join(spark, sf_dir):
    """The binned equi-join must return exactly the naive BETWEEN
    theta-join's groups — binning is a physical rewrite, not an
    approximation."""
    binned = {
        r["band_id"]: (r["n_events"], r["avg_value"], r["total_value"])
        for r in join_range_binned(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    bands = spark.range(RANGE_N_BANDS).select(
        F.col("id").alias("band_id"),
        (F.col("id") * RANGE_BIN).cast("double").alias("lo"),
        (F.col("id") * RANGE_BIN + 2 * RANGE_BIN).cast("double").alias("hi"),
    )
    naive = {
        r["band_id"]: (r["n"], r["av"], r["tv"])
        for r in (
            ev.crossJoin(bands)
            .filter((F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")))
            .groupBy("band_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.avg("value"), 4).alias("av"),
                F.round(F.sum("value"), 2).alias("tv"),
            )
            .collect()
        )
    }
    assert binned == naive
    assert binned, "fixture produced no overlapping bands"


def test_freq_items_superset_guarantee(spark, sf_dir):
    """Every event_type with frequency > support must be flagged
    in_sketch — the freqItems contract the verdict column encodes."""
    rows = sketch_topk_frequent(spark, sf_dir).collect()
    assert rows, "all fixture event types sit above support"
    for r in rows:
        assert r["above_support"] is True
        assert r["in_sketch"] is True
    # sanity: thresholds actually bite — the filter kept only rows with
    # n > support * total
    total = load_table(spark, sf_dir, "events").count()
    for r in rows:
        assert r["n"] > FREQ_SUPPORT * total


def test_int_div_matches_duckdb_on_negatives(spark):
    """Pin the cross-engine integer-division semantics the gapfill
    interpolation relies on: Spark ``div`` and DuckDB integer ``//``
    BOTH truncate toward zero (``-7 // 2 = -3``), so the quotient
    agrees for negative gauges too — the fixture's positive domain is
    not load-bearing (ADVICE r3). Note this is NOT Python's floor
    ``//``; if either engine ever changes, this fails loudly."""
    import duckdb

    from flink_realtime_data_warehouse_spark.plans.rollups import int_div_sql

    cases = [(n, d) for n in (-7, -6, -1, 0, 1, 6, 7, -100, 99) for d in (1, 2, 3, 7)]
    df = spark.createDataFrame(cases, "num bigint, den bigint")
    got = {
        (r["num"], r["den"]): r["q"]
        for r in df.selectExpr("num", "den", int_div_sql("num", "den") + " AS q").collect()
    }
    con = duckdb.connect()
    trunc = lambda n, d: -(-n // d) if (n < 0) != (d < 0) else n // d
    for (n, d), q in got.items():
        expect = con.execute(f"SELECT {n} // {d}").fetchone()[0]
        assert q == expect == trunc(n, d), f"{n} // {d}: spark={q} duckdb={expect}"
