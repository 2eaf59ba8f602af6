"""Property tests for the export operators (sequence serialization,
temporal embargo split). Oracle parity is covered by the parity suite;
these pin shape/leakage invariants."""

from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from flink_realtime_data_warehouse_spark.operators.export import (
    EMBARGO_TEST_PCT,
    EMBARGO_TRAIN_PCT,
    SEQ_MAX_EVENTS,
)

_QUERIES = entrymod.queries()


def test_sequence_export_cap_and_total(spark, sf_dir):
    df = _QUERIES["export_user_event_sequences"](spark, sf_dir).cache()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # one row per user, total count preserved
    assert df.count() == ev.select("user_id").distinct().count()
    assert (
        df.agg(F.sum("n_events")).first()[0] == ev.count()
    )
    # the serialized sequence never exceeds the context cap
    bad = df.filter(
        F.size(F.split("seq", ">")) > F.least(F.col("n_events"), F.lit(SEQ_MAX_EVENTS))
    )
    assert bad.count() == 0
    # cap binds exactly when the user has more events than the budget
    over = df.filter(F.col("n_events") > SEQ_MAX_EVENTS)
    if over.count() > 0:
        assert (
            over.filter(F.size(F.split("seq", ">")) != SEQ_MAX_EVENTS).count() == 0
        )
    df.unpersist()


def test_sequence_export_single_hash_exchange(spark, sf_dir):
    """The rank/count windows and the final aggregation all key on
    user_id — Catalyst must plan exactly ONE hash exchange (the
    orderBy's range exchange is presentation, not data movement
    between compute stages)."""
    import re

    df = _QUERIES["export_user_event_sequences"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


def test_temporal_embargo_no_leakage_window(spark, sf_dir):
    df = _QUERIES["split_temporal_embargo"](spark, sf_dir).cache()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id", "ts")
    j = df.join(ev, "event_id")
    agg = j.groupBy("split").agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
    r = {row["split"]: row for row in agg.collect()}
    assert set(r) <= {"train", "test", "embargo"}
    # every event labeled exactly once
    assert df.count() == ev.count()
    # strict temporal ordering: max(train) < min(embargo) <= max(embargo) < min(test)
    if "train" in r and "test" in r:
        assert r["train"]["hi"] < r["test"]["lo"]
    if "train" in r and "embargo" in r:
        assert r["train"]["hi"] < r["embargo"]["lo"]
    if "embargo" in r and "test" in r:
        assert r["embargo"]["hi"] < r["test"]["lo"]
    # embargo fraction of the time range is (TEST-TRAIN)%, so it must be
    # nonempty whenever events span the gap densely (our fixtures do)
    assert EMBARGO_TRAIN_PCT < EMBARGO_TEST_PCT
    df.unpersist()


def test_token_budget_greedy_bounds(spark, sf_dir):
    """The selection spends the budget exactly greedily: total selected
    token mass reaches the budget and overshoots by less than one
    document (the crossing doc)."""
    from flink_realtime_data_warehouse_spark.operators.sampling import TOKEN_BUDGET

    sel = _QUERIES["sample_token_budget"](spark, sf_dir).cache()
    total = sel.agg(F.sum("n_tokens")).first()[0]
    biggest = sel.agg(F.max("n_tokens")).first()[0]
    corpus_mass = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.size(F.split("text", " ")).alias("nw"))
        .agg(F.sum("nw"))
        .first()[0]
    )
    if corpus_mass >= TOKEN_BUDGET:
        assert TOKEN_BUDGET <= total < TOKEN_BUDGET + biggest
    else:
        assert total == corpus_mass
    sel.unpersist()
