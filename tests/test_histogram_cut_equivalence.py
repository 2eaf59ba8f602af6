"""Equivalence of the histogram-cut scale tricks against their naive
window formulations ON ADVERSARIAL DATA — heavy score ties right at the
cut, empty strata, single-score corpora. The oracle parity suite proves
equivalence on the fixture distributions; these prove it where it's
actually hard.

Both sides run in Spark on the same DataFrame, so any divergence is the
algorithm's, not an engine artifact — and the histogram side calls the
PRODUCTION phase functions (``token_budget_select`` /
``quality_quota_select``), not a copy, so operator and test cannot
drift."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_realtime_data_warehouse_spark.operators.sampling import (
    QUOTA_PER_LANG,
    TOKEN_BUDGET,
    quality_quota_select,
    quota_survivors,
    token_budget_select,
)

# (q, nw) generators: lots of ties, boundary-straddling masses
CASES = {
    "all_one_score": [(5000, 10)] * 40,
    "tie_at_cut": [(9000, 100)] * 5 + [(5000, 97)] * 300 + [(1000, 3)] * 50,
    "single_doc_over_budget": [(9999, 50_000), (5000, 10)],
    "exact_boundary": [(9000, 10_000), (8000, 10_000), (7000, 5)],
    "many_distinct": [(i % 997 * 10, (i * 7) % 23 + 1) for i in range(500)],
}


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, q, nw) for i, (q, nw) in enumerate(rows)],
        "doc_id bigint, q bigint, nw bigint",
    )


def _naive_budget(scored):
    w = (
        Window.orderBy(F.col("q").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        scored.withColumn("cum_before", F.coalesce(F.sum("nw").over(w), F.lit(0)))
        .filter(F.col("cum_before") < TOKEN_BUDGET)
        .select("doc_id")
    )


@pytest.mark.parametrize("case", sorted(CASES))
def test_token_budget_histogram_equals_naive(spark, case):
    scored = _df(spark, CASES[case])
    naive = {r.doc_id for r in _naive_budget(scored).collect()}
    hist = {
        r.doc_id for r in token_budget_select(scored, TOKEN_BUDGET).collect()
    }
    assert hist == naive, f"{case}: {sorted(hist ^ naive)[:10]}"


QUOTA_CASES = {
    "all_tied": [("a", 5000)] * 100,
    "tie_at_rank_boundary": [("a", 9000)] * 39 + [("a", 5000)] * 10 + [("a", 1)] * 5,
    "under_quota_stratum": [("a", 7000)] * 7 + [("b", 6000)] * 90,
    "two_strata_mixed": [("a", i % 11 * 100) for i in range(200)]
    + [("b", i % 3 * 1000) for i in range(50)],
}


@pytest.mark.parametrize("case", sorted(QUOTA_CASES))
def test_quality_quota_precut_equals_naive(spark, case):
    rows = QUOTA_CASES[case]
    scored = spark.createDataFrame(
        [(lang, i, q) for i, (lang, q) in enumerate(rows)],
        "lang string, doc_id bigint, q bigint",
    )
    rank_w = Window.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    naive = {
        (r.lang, r.doc_id)
        for r in scored.withColumn("rn", F.row_number().over(rank_w))
        .filter(F.col("rn") <= QUOTA_PER_LANG)
        .collect()
    }
    precut = {
        (r.lang, r.doc_id)
        for r in quality_quota_select(scored, QUOTA_PER_LANG).collect()
    }
    assert precut == naive, f"{case}: {sorted(precut ^ naive)[:10]}"


@pytest.mark.parametrize("case", sorted(QUOTA_CASES))
def test_quality_quota_precut_actually_prunes(spark, case):
    """The scale claim itself: the rank window runs only over the
    pre-cut survivors, so per stratum the survivor count must be
    < quota + (largest tie group at one score). The r4 advisor found a
    min-vs-max cutoff bug that kept 100% of rows while staying
    value-correct — this assertion makes that regression loud."""
    rows = QUOTA_CASES[case]
    scored = spark.createDataFrame(
        [(lang, i, q) for i, (lang, q) in enumerate(rows)],
        "lang string, doc_id bigint, q bigint",
    )
    max_tie = {
        r.lang: r.mt
        for r in scored.groupBy("lang", "q")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("lang")
        .agg(F.max("c").alias("mt"))
        .collect()
    }
    surv = {
        r.lang: r.n
        for r in quota_survivors(scored, QUOTA_PER_LANG)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in surv.items():
        assert n < QUOTA_PER_LANG + max_tie[lang], (
            f"{case}/{lang}: {n} survivors — pre-cut is not pruning "
            f"(quota {QUOTA_PER_LANG}, max tie {max_tie[lang]})"
        )
