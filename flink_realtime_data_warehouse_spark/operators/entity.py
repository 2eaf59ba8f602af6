"""Entity resolution: blocked fuzzy matching by edit distance.

The classic ER shape (Fellegi–Sunter blocking + pairwise comparison),
the missing piece between exact dedup (``dedup_exact``) and
token-set near-dup (``dedup_ngram_jaccard``): catch records that are
*small character edits* of each other — typos, OCR noise, truncation —
which share neither a content hash nor necessarily enough intact
n-grams.

Scale shape:

* all-pairs comparison is O(n²) and never acceptable — candidate
  generation is an equi-join on a **blocking key** (first word ×
  length bucket), so the shuffle is keyed and the quadratic cost is
  bounded per block, not per corpus;
* the length bucket splits high-frequency first words (a stopword
  block at 100 TB would otherwise be a skew hot spot; the same salting
  from ``operators/scale.py::salted_join`` applies if a block is still
  hot);
* the comparator is ``levenshtein(prefix_a, prefix_b, threshold)``
  with Spark's bounded-distance early exit — the JVM DP bails out as
  soon as the distance exceeds the threshold, so the common (distant)
  pair costs O(threshold · prefix) instead of O(prefix²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

#: characters of document prefix compared (ER attribute analogue)
ER_PREFIX_LEN = 60
#: maximum edit distance considered a match
ER_MAX_DIST = 15
#: documents per length bucket inside a first-word block
ER_LEN_BUCKET = 10


def blocked_fuzzy_pairs(
    docs: DataFrame,
    prefix_len: int = ER_PREFIX_LEN,
    max_dist: int = ER_MAX_DIST,
) -> DataFrame:
    """(doc_a, doc_b, dist) pairs with edit distance ≤ max_dist.

    Candidates come from an equi-join on (first word, word-count
    bucket); only within-block pairs ever reach the comparator.
    """
    k = docs.filter(F.col("text").isNotNull()).select(
        "doc_id",
        F.substring("text", 1, prefix_len).alias("pfx"),
        F.split("text", " ").getItem(0).alias("w1"),
        F.floor(F.size(F.split("text", " ")) / ER_LEN_BUCKET).alias("lb"),
    )
    # a small corpus arrives as one parquet split and AQE will happily
    # run the comparator stage as a single task; spreading the probe
    # side across the block keys parallelizes the DP work and is the
    # partitioning the sort-merge join wants at lake scale anyway.
    # fanout (r11 opt): the bare repartition(col) is REPARTITION_BY_COL,
    # which AQE's byte-based coalescing may fold back onto one task —
    # the numbered form is exempt and sized from the core count.
    from flink_realtime_data_warehouse_spark.fanout import fanout

    a = fanout(k, "w1", "lb").alias("a")
    b = k.alias("b")
    # bounded-distance levenshtein returns -1 past the threshold: one
    # expression both filters and yields the distance
    dist = F.levenshtein(F.col("a.pfx"), F.col("b.pfx"), max_dist)
    return (
        a.join(
            b,
            # cheap ordering predicate FIRST: the conjunction
            # short-circuits left-to-right, so the DP comparator runs
            # on each unordered pair once, not twice
            (F.col("a.w1") == F.col("b.w1"))
            & (F.col("a.lb") == F.col("b.lb"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (dist >= 0),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            dist.alias("dist"),
        )
    )


_ER_ORACLE = f"""
WITH k AS (
  SELECT doc_id, substr(text, 1, {ER_PREFIX_LEN}) AS pfx,
         string_split(text, ' ')[1] AS w1,
         len(string_split(text, ' ')) // {ER_LEN_BUCKET} AS lb
  FROM documents WHERE text IS NOT NULL)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       levenshtein(a.pfx, b.pfx) AS dist
FROM k a JOIN k b
  ON a.w1 = b.w1 AND a.lb = b.lb AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {ER_MAX_DIST}
ORDER BY doc_a, doc_b
"""


@query("er_fuzzy_matches", oracle=_ER_ORACLE)
def er_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy-match pairs over the documents table."""
    docs = load_table(spark, sf_dir, "documents")
    return blocked_fuzzy_pairs(docs).orderBy("doc_a", "doc_b")
