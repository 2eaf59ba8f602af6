"""Deterministic sampling / split assignment / PII redaction — the
bookkeeping operators every large-scale training-data pipeline needs
around the dedup + quality core.

All three are pure column expressions (JVM-side, shuffle-free, fully
pushdown-friendly): at 100 TB a sample or split assignment is a
map-only pass, and reruns are byte-identical because the bucketing
hash is content-derived (md5 of the key), not RNG state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

SAMPLE_PCT = 10  #: demo sample keeps bucket < 10 of 100
SPLIT_VAL_PCT = 5
SPLIT_TEST_PCT = 5


def hash_bucket(key: Column, buckets: int = 100) -> Column:
    """Engine-portable deterministic bucket: first 8 hex chars of
    md5(key) mod ``buckets``.

    md5 (not xxhash64) so any engine — Spark, DuckDB, Trino, plain
    Python — assigns the identical bucket; sampling and split
    membership survive engine migrations and are reproducible in
    reviews.
    """
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % buckets


_BUCKET_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100"


@query(
    "sample_deterministic",
    oracle=f"""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE {_BUCKET_SQL} < {SAMPLE_PCT}
    ORDER BY doc_id
    """,
)
def sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% deterministic sample by content-hash bucket.

    Unlike ``df.sample()`` (RNG + partition-dependent), membership is a
    pure function of the key: stable across runs, engines, partitioning
    and cluster size — the property an auditable data pipeline needs.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(hash_bucket(F.col("doc_id")) < SAMPLE_PCT)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT split, count(*) AS n_docs, round(avg(n_chars), 4) AS avg_chars
    FROM (
      SELECT CASE WHEN {_BUCKET_SQL} < {SPLIT_TEST_PCT} THEN 'test'
                  WHEN {_BUCKET_SQL} < {SPLIT_TEST_PCT + SPLIT_VAL_PCT} THEN 'val'
                  ELSE 'train' END AS split,
             n_chars
      FROM documents)
    GROUP BY split
    ORDER BY split
    """,
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment + per-split stats.

    The same hash-bucket trick: a document's split never changes when
    the corpus grows (no re-shuffling of held-out data into train), and
    any engine recomputes the identical assignment.
    """
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < SPLIT_TEST_PCT, "test")
        .when(b < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("train")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("split")
    )


# text_pii_redact moved to operators/pii.py (round 9): the PII family
# is now first-class there — email + IPv4 + phone detection
# (dq_pii_scan) and redaction with per-kind audit counters, selective
# deterministic planting, and idempotence pins (tests/test_pii.py).


# Language-rebalancing stratified sample: downsample the dominant
# stratum, keep more of the rare ones. Per-stratum rates are config,
# not data-dependent — at 100 TB the rate lookup is a CASE expression
# (or a broadcast join against a rates dim), so the whole operator
# stays a map-only pass + one tiny aggregate.
STRATUM_PCT = {"en": 20, "de": 60, "es": 60, "fr": 60, "zh": 60}
STRATUM_DEFAULT_PCT = 40

_STRATUM_CASE_SQL = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in STRATUM_PCT.items())
    + f" ELSE {STRATUM_DEFAULT_PCT} END"
)


@query(
    "sample_stratified",
    oracle=f"""
    SELECT lang,
           {_STRATUM_CASE_SQL} AS target_pct,
           count(*) AS n_total,
           count(*) FILTER (
             WHERE {_BUCKET_SQL} < {_STRATUM_CASE_SQL}
           ) AS n_sampled
    FROM documents
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: per-language keep rates
    (downsample dominant 'en', retain minority languages) applied via
    the same content-hash bucket as ``sample_deterministic``.

    Unlike ``df.sampleBy()`` (RNG seeds, partition-order dependent),
    membership is a pure function of (doc_id, lang-rate): reruns,
    engine migrations, and corpus growth never resample a document in
    or out. One map-only pass + a per-stratum counting aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    rate = F.lit(STRATUM_DEFAULT_PCT)
    for lang, pct in reversed(list(STRATUM_PCT.items())):
        rate = F.when(F.col("lang") == lang, F.lit(pct)).otherwise(rate)
    b = hash_bucket(F.col("doc_id"))
    return (
        docs.select("lang", rate.alias("target_pct"), b.alias("b"))
        .groupBy("lang", "target_pct")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.when(F.col("b") < F.col("target_pct"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_sampled"),
        )
        .orderBy("lang")
    )


PACK_SEQ_LEN = 512  #: tokens per packed training sequence
PACK_N_BUCKETS = 8  #: independent packing streams (the unit of parallelism)


@query(
    "pack_training_sequences",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             {_BUCKET_SQL.replace('% 100', f'% {PACK_N_BUCKETS}')} AS bucket,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    pos AS (
      SELECT doc_id, bucket, n_tokens,
             sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - n_tokens AS tok_start
      FROM toks)
    SELECT doc_id, bucket, n_tokens,
           CAST(tok_start AS BIGINT) AS tok_start,
           CAST(tok_start // {PACK_SEQ_LEN} AS BIGINT) AS pack_first,
           CAST((tok_start + n_tokens - 1) // {PACK_SEQ_LEN} AS BIGINT) AS pack_last
    FROM pos ORDER BY bucket, doc_id
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for LLM pretraining: documents are concatenated
    in deterministic (bucket, doc_id) order and cut at fixed
    ``PACK_SEQ_LEN``-token boundaries — each doc's global token offset
    places it in packs ``[pack_first, pack_last]`` (a doc straddling a
    boundary continues in the next sequence, the standard
    concat-then-cut regime).

    Shape: one window prefix-sum per hash bucket — the bucket is the
    unit of parallelism AND of determinism (membership is content-
    derived md5, so packing is reproducible across runs, engines, and
    corpus repartitioning; growing the corpus only appends to each
    bucket's tail in doc_id order). No collect, no Python; at 100 TB
    this is one shuffle on bucket with ~|corpus|/buckets rows per
    partition, and buckets scale with the cluster.
    """
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    toks = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id"), PACK_N_BUCKETS).alias("bucket"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn("tok_start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return pos.select(
        "doc_id",
        "bucket",
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / PACK_SEQ_LEN).alias("pack_first"),
        F.floor((F.col("tok_start") + F.col("n_tokens") - 1) / PACK_SEQ_LEN).alias(
            "pack_last"
        ),
    ).orderBy("bucket", "doc_id")


# ---------------------------------------------------------------------------
# weighted corpus mixture
# ---------------------------------------------------------------------------

#: DoReMi-style domain keep-rates (percent of each source's docs kept
#: in the training mixture). Any source not listed gets the default.
MIXTURE_WEIGHTS = {"src0": 80, "src1": 60, "src2": 40, "src3": 25}
MIXTURE_DEFAULT_PCT = 15

_MIX_CASE_SQL = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN {p}" for s, p in MIXTURE_WEIGHTS.items())
    + f" ELSE {MIXTURE_DEFAULT_PCT} END"
)


def mixture_rate(weights: dict[str, int] = MIXTURE_WEIGHTS) -> Column:
    """Per-source keep-rate column (percent) for a weight table."""
    rate = F.lit(MIXTURE_DEFAULT_PCT)
    for s, p in reversed(weights.items()):
        rate = F.when(F.col("source") == s, F.lit(p)).otherwise(rate)
    return rate


@query(
    "sample_weighted_mixture",
    oracle=f"""
    SELECT source,
           count(*) AS n_total,
           count(*) FILTER ({_BUCKET_SQL} < {_MIX_CASE_SQL}) AS n_kept,
           ((count(*) FILTER ({_BUCKET_SQL} < {_MIX_CASE_SQL}) * 10000)
                 // count(*)) / 10000.0 AS keep_frac
    FROM documents GROUP BY source ORDER BY source
    """,
)
def sample_weighted_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted corpus mixture (DoReMi-style reweighting).

    Each source keeps ``MIXTURE_WEIGHTS[source]``% of its documents via
    the same engine-portable hash bucket as the other samplers —
    membership is a pure function of (doc_id, source weight), so the
    mixture is reproducible anywhere and stable under corpus growth:
    raising one domain's weight only ADDS documents, it never swaps
    out previously selected ones (monotone bucket threshold).

    One map-only pass + one tiny aggregate: nothing here scales worse
    than the scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = (hash_bucket(F.col("doc_id")) < mixture_rate(MIXTURE_WEIGHTS)).cast(
        "bigint"
    )
    return (
        docs.withColumn("_kept", kept)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_total"),
            F.sum("_kept").alias("n_kept"),
            # ×1e4 integer quantization — per-source doc counts are
            # arbitrary, so float round(.,4) half-boundaries are
            # reachable (e.g. 477 of 800 kept = exactly 0.59625)
            (F.expr("(sum(_kept) * 10000) div count(*)") / 10000.0).alias(
                "keep_frac"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# class-balanced resampling (labeled data)
# ---------------------------------------------------------------------------

_CLASS_BALANCED_ORACLE = """
WITH e AS (SELECT vec_id, label FROM embeddings WHERE label IS NOT NULL),
target AS (
  SELECT min(c) AS t FROM (SELECT count(*) AS c FROM e GROUP BY label)),
ranked AS (
  SELECT vec_id, label,
         row_number() OVER (
           PARTITION BY label
           ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rn
  FROM e)
SELECT vec_id, label
FROM ranked CROSS JOIN target
WHERE rn <= target.t
ORDER BY vec_id
"""


@query("sample_class_balanced", oracle=_CLASS_BALANCED_ORACLE)
def sample_class_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced downsampling of labeled vectors: every label keeps
    exactly ``min(class size)`` rows, chosen deterministically by
    content-hash order (the first-N rows of each class under the
    md5(vec_id) ordering — RNG-free, so reruns and engines agree
    byte-for-byte, and the kept set only shrinks/grows at the hash-order
    boundary when the corpus changes).

    Shuffle budget: one tiny per-label count aggregation (|labels|
    rows, broadcast back as a 1-row scalar), one window partitioned by
    label for the rank — the same per-key top-N shape as every other
    deterministic sampler here. Heavily skewed classes cost one
    window partition each; at 100 TB-scale label cardinality the
    window key has far more partitions than executors and balances
    itself.
    """
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("label").isNotNull()
    ).select("vec_id", "label")
    target = (
        emb.groupBy("label")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.min("c").alias("t"))
    )
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        emb.withColumn("rn", F.row_number().over(w))
        .crossJoin(F.broadcast(target))
        .filter(F.col("rn") <= F.col("t"))
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# per-language quality quota (top-N by score, no global sort)
# ---------------------------------------------------------------------------

QUOTA_PER_LANG = 40  #: docs kept per language stratum


def _quota_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.textops import (
        _TIER_SCORED_CTE,
    )

    return f"""
WITH {_TIER_SCORED_CTE},
ranked AS (
  SELECT d.lang, s.doc_id, s.q,
         row_number() OVER (PARTITION BY d.lang ORDER BY s.q DESC, s.doc_id) AS rn
  FROM scored s JOIN documents d USING (doc_id))
SELECT lang, doc_id, CAST(q AS BIGINT) AS score_e4, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= {QUOTA_PER_LANG} ORDER BY lang, rn
"""


@query("sample_quality_quota", oracle=_quota_oracle())
def sample_quality_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quota selection: the top ``QUOTA_PER_LANG`` documents per
    language by quality score (deterministic ``doc_id`` tiebreak) —
    how a mixture designer caps a dominant stratum while keeping only
    its best documents (complements ``sample_class_balanced``, which
    caps by hash order, quality-blind).

    Scale shape: the naive formulation is a corpus-wide per-stratum
    sort (row_number over every doc). Here NO corpus-wide sort runs:
    the bounded integer score domain (0..10000) is aggregated into a
    per-lang histogram (map-side combinable; <= 10001 rows per lang),
    a cumulative window over that tiny relation finds each stratum's
    cutoff score (the score of the QUOTA-th best doc), the cutoffs
    broadcast back as a filter, and the exact rank window runs only
    over the ~QUOTA survivors per lang. Equivalent to the direct
    window — excluded docs all rank strictly below every survivor —
    which is exactly what the oracle states in its naive form.
    """
    from pyspark.sql.window import Window

    from flink_realtime_data_warehouse_spark.operators.textops import (
        quality_score_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "lang", "doc_id", F.expr(quality_score_sql()).alias("q")
    )
    return (
        quality_quota_select(scored, QUOTA_PER_LANG)
        .select(
            "lang",
            "doc_id",
            F.col("q").cast("bigint").alias("score_e4"),
            F.col("rn").cast("bigint").alias("rn"),
        )
        .orderBy("lang", "rn")
    )


def quality_quota_select(scored: DataFrame, quota: int) -> DataFrame:
    """Histogram-pre-cut top-``quota`` per lang over an arbitrary
    (lang, doc_id, q) frame — the SINGLE implementation the registered
    query AND the adversarial equivalence tests run, so the two cannot
    drift. Returns (lang, doc_id, q, rn), rn <= quota."""
    from pyspark.sql.window import Window

    survivors = quota_survivors(scored, quota)
    rank_w = Window.partitionBy("lang").orderBy(F.col("q").desc(), "doc_id")
    return survivors.withColumn("rn", F.row_number().over(rank_w)).filter(
        F.col("rn") <= quota
    )


def quota_survivors(scored: DataFrame, quota: int) -> DataFrame:
    """The histogram pre-cut alone: rows that survive the per-stratum
    score cutoff, BEFORE the exact rank window. Exposed separately so
    the equivalence suite can assert the cut actually prunes (survivor
    count per stratum < quota + largest tie group) — the r4 advisor
    found the cutoff aggregated with ``min`` instead of ``max``, which
    kept every row and silently degraded the rank window back to a
    full-corpus sort while remaining value-correct."""
    from pyspark.sql.window import Window

    hist = scored.groupBy("lang", "q").agg(F.count(F.lit(1)).alias("c"))
    cum = hist.withColumn(
        "cc",
        F.sum("c").over(
            Window.partitionBy("lang")
            .orderBy(F.col("q").desc())
            .rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    # cut = the HIGHEST score whose cumulative (descending) count reaches
    # the quota, i.e. the score of the quota-th-best doc. cc is monotone
    # non-decreasing as q descends, so every score <= the true cut also
    # satisfies cc >= quota — max picks the boundary, min would pick the
    # stratum floor and turn the pre-cut into a no-op. A stratum with
    # fewer than `quota` docs never reaches cc >= quota: cut stays NULL
    # and the filter keeps the whole (already tiny) stratum.
    cuts = cum.groupBy("lang").agg(
        F.max(F.when(F.col("cc") >= quota, F.col("q"))).alias("cut")
    )
    # NULL-SAFE stratum join: a NULL lang is a legitimate stratum (the
    # oracle's window partition keeps it); a plain equi-join would drop
    # it silently (caught by the null-injected parity tier)
    survivors = (
        scored.join(
            F.broadcast(cuts.withColumnRenamed("lang", "_cl")),
            scored["lang"].eqNullSafe(F.col("_cl")),
        )
        .drop("_cl")
        .filter(F.col("cut").isNull() | (F.col("q") >= F.col("cut")))
        .drop("cut")
    )
    return survivors


# ---------------------------------------------------------------------------
# token-budget corpus selection (greedy by quality, no corpus sort)
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 20_000  #: total training-token budget for the selection
#: budget for the BPE-priced face (operators/bpe.py): BPE tokens run
#: ~3x the word count on this corpus, so 60k admits a comparably-sized
#: — but measurably DIFFERENT — document set than the 20k word budget
BPE_TOKEN_BUDGET = 60_000


def _token_budget_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.textops import (
        _TIER_SCORED_CTE,
    )

    return f"""
WITH {_TIER_SCORED_CTE},
sized AS (
  SELECT s.doc_id, s.q, len(string_split(d.text, ' ')) AS nw
  FROM scored s JOIN documents d USING (doc_id)),
ordered AS (
  SELECT doc_id, q, nw,
         sum(nw) OVER (ORDER BY q DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - nw AS cum_before
  FROM sized)
SELECT doc_id, CAST(q AS BIGINT) AS score_e4, CAST(nw AS BIGINT) AS n_tokens
FROM ordered WHERE cum_before < {TOKEN_BUDGET}
ORDER BY q DESC, doc_id
"""


@query("sample_token_budget", oracle=_token_budget_oracle())
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select the best documents (quality-score order, ``doc_id``
    tiebreak) until a global TOKEN budget is spent — the greedy
    selection a team runs when the training budget is "N tokens", not
    "N documents". A document is admitted iff the token mass of every
    strictly-better document leaves room for at least one of its
    tokens (``cum_before < budget`` — the crossing doc is included, so
    the budget is always reached when the corpus can fill it).

    Scale shape: the oracle's formulation is a corpus-wide sort +
    running sum. Here NO corpus sort runs: per-score token mass
    aggregates into a bounded histogram (≤ 10001 rows), a cumulative
    window over the histogram classifies every score as full-keep
    (strictly-better mass + own mass fits), full-drop (strictly-better
    mass already ≥ budget), or THE single boundary score; only the
    boundary score's documents (one score group) pay an exact
    prefix-sum window. Provably identical to the naive order because
    admission depends only on (strictly-better mass, within-score
    prefix) — exactly what the two phases compute.
    """
    from flink_realtime_data_warehouse_spark.operators.textops import (
        quality_score_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        F.expr(quality_score_sql()).alias("q"),
        F.size(F.split("text", " ")).cast("bigint").alias("nw"),
    )
    return (
        token_budget_select(sized, TOKEN_BUDGET)
        .select(
            "doc_id",
            F.col("q").cast("bigint").alias("score_e4"),
            F.col("nw").alias("n_tokens"),
        )
        .orderBy(F.col("score_e4").desc(), "doc_id")
    )


def token_budget_select(sized: DataFrame, budget: int) -> DataFrame:
    """Histogram-classified greedy selection over an arbitrary
    (doc_id, q, nw) frame — the SINGLE implementation the registered
    query AND the adversarial equivalence tests run, so the two cannot
    drift. Returns the selected (doc_id, q, nw, ...) rows."""
    from pyspark.sql.window import Window

    hist = sized.groupBy("q").agg(F.sum("nw").alias("mass"))
    cum = hist.withColumn(
        "pre",
        F.coalesce(
            F.sum("mass").over(
                Window.orderBy(F.col("q").desc()).rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    )
    verdict = cum.select(
        "q",
        F.when(F.col("pre") + F.col("mass") <= budget, F.lit("keep"))
        .when(F.col("pre") >= budget, F.lit("drop"))
        .otherwise(F.lit("boundary"))
        .alias("v"),
        "pre",
    )
    tagged = sized.join(F.broadcast(verdict), "q")
    kept_full = tagged.filter(F.col("v") == "keep")
    w_in = (
        Window.partitionBy("q")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    kept_boundary = (
        tagged.filter(F.col("v") == "boundary")
        .withColumn("within_before", F.coalesce(F.sum("nw").over(w_in), F.lit(0)))
        .filter(F.col("pre") + F.col("within_before") < budget)
        .drop("within_before")
    )
    return kept_full.unionByName(kept_boundary).drop("v", "pre")


# ---------------------------------------------------------------------------
# exact-k per-class hash reservoir
# ---------------------------------------------------------------------------

RESERVOIR_K = 200  #: docs kept per language
_HASH_RANK_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


def _hash_rank(key: Column) -> Column:
    """60-bit engine-portable rank: uniform in [0, 2^60), identical in
    Spark / DuckDB / Trino / Python — the distributed equivalent of
    reservoir sampling (the k smallest hash ranks ARE a uniform
    k-subset, but deterministic and merge-friendly where a classic
    reservoir is RNG- and order-dependent)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


@query(
    "sample_hash_reservoir",
    oracle=f"""
    SELECT doc_id, lang
    FROM (
      SELECT doc_id, lang,
             row_number() OVER (
               PARTITION BY lang ORDER BY {_HASH_RANK_SQL}, doc_id
             ) AS rk
      FROM documents
    ) WHERE rk <= {RESERVOIR_K}
    ORDER BY lang, doc_id
    """,
)
def sample_hash_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY min(k, n_class) docs per language, uniform by hash rank
    — the distributed reservoir sample (rate-based sampling cannot hit
    exact counts; RNG reservoirs are partition-order dependent).

    Scale shape: the naive plan sorts every class partition in full
    (a 40%-of-corpus language = a 40%-of-corpus sort) for a k-row
    answer. Instead: one column-pruned counting pass sets a per-class
    rank cutoff at 4× the expected k-th rank, a map-only broadcast
    filter keeps ~4k rows per class, and the window sorts only those.
    The cutoff is a concentration bet, not a correctness bet: a guard
    pass counts survivors per class and falls back to the full window
    for any corpus where some k-th rank landed past the cutoff (driver
    fetch bounded at |classes| rows both times — same audited class as
    the config-rule collects).
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    ranked = docs.withColumn("u", _hash_rank(F.col("doc_id")))
    w = Window.partitionBy("lang").orderBy("u", "doc_id")
    full = (
        ranked.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )

    counts = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    if not counts:
        return full
    two60 = float(1 << 60)
    cutoffs = [
        (
            lang,
            int(min(two60, two60 * 4.0 * RESERVOIR_K / n)) if n else 0,
        )
        for lang, n in counts.items()
    ]
    cut = F.broadcast(
        # explicit schema: an all-NULL-lang corpus gives inference
        # nothing to type the lang column from
        docs.sparkSession.createDataFrame(cutoffs, "lang string, cutoff long")
    )
    survivors = ranked.join(
        cut, ranked["lang"].eqNullSafe(cut["lang"]), "inner"
    ).select(ranked["lang"], "doc_id", "u", "cutoff").filter(
        F.col("u") < F.col("cutoff")
    )
    got = {
        r["lang"]: r["n"]
        for r in survivors.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, n in counts.items():
        if got.get(lang, 0) < min(RESERVOIR_K, n):
            return full  # a k-th rank fell past the 4x cutoff
    ws = Window.partitionBy("lang").orderBy("u", "doc_id")
    return (
        survivors.withColumn("rk", F.row_number().over(ws))
        .filter(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "lang")
        .orderBy("lang", "doc_id")
    )
