"""Composed training-data curation pipeline.

The individual operators (quality score, exact dedup, MinHash-LSH,
language profile) each have their own oracle; this module chains them
the way a pretraining-data pipeline actually runs:

    quality gate → exact dedup → near-dup (LSH) removal → corpus stats

Everything stays one declarative plan (no intermediate
materialization), so Catalyst pipelines the stages and the only
shuffles are the dedup group-bys / the LSH bucket join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.dedup import (
    dedup_minhash_lsh_pairs,
)
from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

MIN_WORDS = 5
MAX_WORDS = 1000


def curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surviving documents after the full curation chain."""
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    gated = docs.filter(n_words.between(MIN_WORDS, MAX_WORDS))

    # exact dedup: keep the smallest doc_id per content digest
    keeper = (
        gated.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    exact_kept = gated.join(
        keeper, gated["doc_id"] == keeper["keep_id"], "left_semi"
    )

    # near-dup removal: LSH candidate pairs — drop the larger doc_id of
    # each pair (union-find-free approximation: at 100 TB you iterate
    # or use connected components; one pass removes first-order dups)
    pairs = dedup_minhash_lsh_pairs(spark, sf_dir).select(F.col("doc_b").alias("drop_id"))
    return exact_kept.join(
        pairs, exact_kept["doc_id"] == pairs["drop_id"], "left_anti"
    )


_CURATION_ORACLE = f"""
WITH gated AS (
  SELECT * FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN {MIN_WORDS} AND {MAX_WORDS}),
keeper AS (
  SELECT min(doc_id) AS keep_id FROM gated GROUP BY md5(text)),
exact_kept AS (
  SELECT g.* FROM gated g WHERE g.doc_id IN (SELECT keep_id FROM keeper)),
w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))::BIGINT AS s
  FROM w, UNNEST(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1) ELSE [] END) AS t(i)),
sig AS (SELECT doc_id, {{SIG}} FROM sh GROUP BY doc_id),
bands AS (
{{BANDS}}
),
drops AS (
  SELECT DISTINCT b.doc_id AS drop_id
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM exact_kept
WHERE doc_id NOT IN (SELECT drop_id FROM drops)
GROUP BY lang ORDER BY lang
"""


def _curation_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _BAND_ORACLE_KEYS,
        _SIG_ORACLE_COLS,
    )

    return _CURATION_ORACLE.replace("{SIG}", _SIG_ORACLE_COLS).replace(
        "{BANDS}", _BAND_ORACLE_KEYS
    )


@query("pipeline_curation_stats", oracle=_curation_oracle())
def pipeline_curation_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of the corpus surviving the curation chain."""
    survivors = curate(spark, sf_dir)
    return (
        survivors.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("lang")
    )


_CURATION_CC_ORACLE_TEMPLATE = f"""
WITH RECURSIVE {{BANDS_CTE}},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand_pairs),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
groups AS (SELECT id AS doc_id, min(label) AS group_id FROM reach GROUP BY id),
gated AS (
  SELECT * FROM documents
  WHERE len(string_split(text, ' ')) BETWEEN {MIN_WORDS} AND {MAX_WORDS}),
keeper AS (
  SELECT min(doc_id) AS keep_id FROM gated GROUP BY md5(text)),
exact_kept AS (
  SELECT g.* FROM gated g WHERE g.doc_id IN (SELECT keep_id FROM keeper))
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM exact_kept e JOIN groups USING (doc_id)
WHERE doc_id = group_id
GROUP BY lang ORDER BY lang
"""


def _curation_cc_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.dedup import MINHASH_BANDS_CTE

    return _CURATION_CC_ORACLE_TEMPLATE.replace("{BANDS_CTE}", MINHASH_BANDS_CTE)


@query("pipeline_curation_cc_stats", oracle=_curation_cc_oracle())
def pipeline_curation_cc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation with TRANSITIVE near-dup removal: keep one
    representative (the min doc_id) per connected component of the LSH
    candidate graph — the closure the first-order drop-list
    approximates (A~B, B~C collapses to one survivor here even though
    A and C never share a band)."""
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        dedup_connected_groups,
    )

    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    gated = docs.filter(n_words.between(MIN_WORDS, MAX_WORDS))
    keeper = (
        gated.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("keep_id"))
        .select("keep_id")
    )
    exact_kept = gated.join(keeper, gated["doc_id"] == keeper["keep_id"], "left_semi")
    reps = dedup_connected_groups(spark, sf_dir).filter(
        F.col("doc_id") == F.col("group_id")
    ).select(F.col("doc_id").alias("rep_id"))
    survivors = exact_kept.join(
        reps, exact_kept["doc_id"] == reps["rep_id"], "left_semi"
    )
    return (
        survivors.groupBy("lang")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").cast("bigint").alias("total_chars"))
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# leakage-safe splits
# ---------------------------------------------------------------------------

_LEAKAGE_SAFE_ORACLE = """
WITH RECURSIVE {bands_cte},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM cand_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM cand_pairs),
reach(id, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
grp AS (SELECT id AS doc_id, min(label) AS group_id FROM reach GROUP BY id)
SELECT doc_id, group_id,
       CASE WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 8))::BIGINT % 100
                 < {test_pct} THEN 'test'
            WHEN ('0x' || substr(md5(CAST(group_id AS VARCHAR)), 1, 8))::BIGINT % 100
                 < {test_val_pct} THEN 'val'
            ELSE 'train' END AS split
FROM grp ORDER BY doc_id
"""


def _leakage_safe_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.dedup import MINHASH_BANDS_CTE
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        SPLIT_TEST_PCT,
        SPLIT_VAL_PCT,
    )

    return _LEAKAGE_SAFE_ORACLE.format(
        bands_cte=MINHASH_BANDS_CTE,
        test_pct=SPLIT_TEST_PCT,
        test_val_pct=SPLIT_TEST_PCT + SPLIT_VAL_PCT,
    )


@query("split_leakage_safe", oracle=_leakage_safe_oracle())
def split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates.

    ``split_train_val_test`` hashes each doc independently — two
    near-duplicate documents can land in train AND test, silently
    inflating eval numbers. Here the hash-bucket split is applied to
    the **near-dup group representative** (min doc_id of the LSH
    connected component), so an entire dup group moves to one split
    atomically. Singleton docs degrade to exactly the per-doc split.

    Scale shape: the expensive part is the LSH + connected components
    already required for dedup — the split itself adds one md5 over the
    group label, no extra shuffle beyond the CC join.
    """
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        minhash_lsh_candidate_pairs,
    )
    from flink_realtime_data_warehouse_spark.operators.graph import (
        connected_components,
    )
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        SPLIT_TEST_PCT,
        SPLIT_VAL_PCT,
        hash_bucket,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidate_pairs(docs)
    labels = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
        docs.select(F.col("doc_id").alias("id")),
    )
    b = hash_bucket(F.col("label"))
    split = (
        F.when(b < SPLIT_TEST_PCT, "test")
        .when(b < SPLIT_TEST_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("train")
    )
    return (
        labels.select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("group_id"),
            split.alias("split"),
        )
        .orderBy("doc_id")
    )
