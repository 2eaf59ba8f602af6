"""Text-analysis operators for training-data pipelines.

All hot-path logic is built-in column expressions (JVM, whole-stage
codegen) — no Python in the loop. Language-ID, the one genuinely
profile-driven function, is an Arrow-batched pandas UDF in
``functions/text.py`` with a deterministic built-in profile table.

The ``documents`` table is single-space-separated word text, so
word = split(text, ' ') is exact on both Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

#: tiny function-word list used by the quality score (deterministic,
#: matches the vocabulary of the synthetic corpus)
STOPWORDS = ("the", "a")


@query(
    "text_stats",
    oracle="""
    SELECT doc_id,
           length(text)                                  AS n_chars_text,
           len(string_split(text, ' '))                  AS n_words,
           len(list_distinct(string_split(text, ' ')))   AS n_distinct_words,
           round((length(text) - len(string_split(text, ' ')) + 1.0)
                 / len(string_split(text, ' ')), 4)      AS avg_word_len
    FROM documents ORDER BY doc_id
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document length / token statistics (token counting surface)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_words = F.size(words).cast("bigint")
    return docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_text"),
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).cast("bigint").alias("n_distinct_words"),
        # single-space separated text: total word chars = chars - (n-1)
        F.round((F.length("text") - n_words + 1.0) / n_words, 4).alias("avg_word_len"),
    ).orderBy("doc_id")


@query(
    "text_quality_score",
    oracle=f"""
    SELECT doc_id,
           round(len(list_filter(string_split(text, ' '),
                                 w -> w IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}'))) * 1.0
                 / len(string_split(text, ' ')), 4) AS stopword_ratio,
           CASE WHEN len(string_split(text, ' ')) BETWEEN 5 AND 1000 THEN 1 ELSE 0 END AS length_ok
    FROM documents ORDER BY doc_id
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: stop-word ratio + length gate (pretraining-filter style)."""
    docs = load_table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    stop_cnt = F.size(
        F.filter(words, lambda w: w.isin(*STOPWORDS))
    )
    n_words = F.size(words)
    return docs.select(
        "doc_id",
        F.round(stop_cnt * 1.0 / n_words, 4).alias("stopword_ratio"),
        F.when(n_words.between(5, 1000), F.lit(1)).otherwise(F.lit(0)).alias("length_ok"),
    ).orderBy("doc_id")


#: fixed linear-model weights (×100) for the quality classifier
#: (fasttext/DCLM style scoring distilled to a transparent linear
#: scorer). The whole score is computed in INTEGER arithmetic quantized
#: to 1e-4 — float formulations flip round(.,4) half-boundaries between
#: engines (a doc at exactly 0.59625 rounded differently in Spark vs
#: DuckDB at sf0.1), integer div on positive operands cannot.
QC_W_LENGTH, QC_W_UNIQUE, QC_W_WORDLEN, QC_W_STOPWORD = 35, 25, 25, 15

_QC_ORACLE = f"""
WITH f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS nw,
         len(list_distinct(string_split(text, ' '))) AS nd,
         length(text) AS nc,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}'))) AS ns
  FROM documents),
q AS (
  SELECT doc_id,
         ({QC_W_LENGTH} * least(nw * 100, 10000)
        + {QC_W_UNIQUE} * ((nd * 10000) // nw)
        + {QC_W_WORDLEN} * greatest(10000 - (abs(2 * (nc - nw + 1) - 9 * nw) * 10000) // (9 * nw), 0)
        + {QC_W_STOPWORD} * least((ns * 50000) // nw, 10000)) // 100 AS score_e4
  FROM f)
SELECT doc_id, score_e4 / 10000.0 AS quality_score,
       CASE WHEN score_e4 >= 5000 THEN 1 ELSE 0 END AS keep
FROM q ORDER BY doc_id
"""


def quality_score_sql(text_col: str = "text") -> str:
    """The classifier's score_e4 as a Spark-SQL snippet — the single
    source of truth for both the oracle-checked batch query and the
    streaming ingest pipeline's quality gate."""
    nw = f"size(split({text_col}, ' '))"
    nd = f"size(array_distinct(split({text_col}, ' ')))"
    nc = f"length({text_col})"
    ns = (
        f"size(filter(split({text_col}, ' '), w -> w IN ("
        + ", ".join(f"'{s}'" for s in STOPWORDS)
        + ")))"
    )
    return (
        f"({QC_W_LENGTH} * least({nw} * 100, 10000)"
        f" + {QC_W_UNIQUE} * (({nd} * 10000) div {nw})"
        f" + {QC_W_WORDLEN} * greatest(10000 -"
        f" (abs(2 * ({nc} - {nw} + 1) - 9 * {nw}) * 10000) div (9 * {nw}), 0)"
        f" + {QC_W_STOPWORD} * least(({ns} * 50000) div {nw}, 10000)) div 100"
    )


@query("text_quality_classifier", oracle=_QC_ORACLE)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filter: fixed-weight linear scorer per doc.

    The production pattern (fasttext / DCLM quality classifiers) is a
    linear model over cheap document features, applied corpus-wide as a
    map-only pass — no shuffle, no Python: every feature and the dot
    product are built-in column expressions inside one codegen stage,
    so the filter runs at scan speed at 100 TB.

    Features (each quantized to 1e-4 by exact integer arithmetic):
    length saturation ``min(n_words/100, 1)``, unique-word ratio,
    closeness of avg word length to 4.5, stopword saturation
    ``min(5·stop_ratio, 1)``. Final score = weighted mean ∈ [0, 1];
    ``quality_score = score_e4/1e4`` is an exact dyadic-free division
    of an integer ≤ 10000 — no float rounding anywhere, so any engine
    reproduces the bits.
    """
    docs = load_table(spark, sf_dir, "documents")
    score_e4 = F.expr(quality_score_sql())
    return docs.select(
        "doc_id",
        (score_e4 / 10000.0).alias("quality_score"),
        F.when(score_e4 >= 5000, F.lit(1)).otherwise(F.lit(0)).alias("keep"),
    ).orderBy("doc_id")


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical document fingerprint: md5 over the sorted distinct-word set.

    Order-insensitive content hash — the batch analogue of a rolling
    fingerprint for bucket-level dedup keys.
    """
    docs = load_table(spark, sf_dir, "documents")
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(F.split("text", " "))))
    return docs.select("doc_id", F.md5(canon).alias("fp")).orderBy("doc_id")


@query(
    "text_token_count_regex",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+'))    AS n_alpha_tokens,
           len(regexp_extract_all(text, '[0-9]+'))    AS n_num_tokens
    FROM documents ORDER BY doc_id
    """,
)
def text_token_count_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex tokenizer counts (BPE-ish pre-tokenization split)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0))).cast("bigint").alias("n_alpha_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).cast("bigint").alias("n_num_tokens"),
    ).orderBy("doc_id")


@query(
    "text_lang_profile",
    oracle="""
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents GROUP BY lang, source ORDER BY lang, source
    """,
)
def text_lang_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition profile by language × source."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


CHUNK_WORDS = 50
CHUNK_STRIDE = 40  #: 10-word overlap between consecutive chunks


@query(
    "text_chunking",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    starts AS (
      SELECT doc_id, ws, UNNEST(range(0, greatest(len(ws), 1), {CHUNK_STRIDE})) AS start
      FROM w)
    SELECT doc_id,
           CAST(start / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           array_to_string(list_slice(ws, start + 1, start + {CHUNK_WORDS}), ' ') AS chunk_text,
           CAST(len(list_slice(ws, start + 1, start + {CHUNK_WORDS})) AS BIGINT) AS n_words
    FROM starts
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: {CHUNK_WORDS}-word chunks at a
    {CHUNK_STRIDE}-word stride (10-word overlap) — the split step that
    feeds context-length-bounded training.

    Pure JVM plan: materialize the word array once, posexplode the
    chunk-start sequence, slice per chunk. The 1→N blow-up happens
    AFTER projection to (doc_id, words), so only word arrays — never
    other payload columns — are duplicated across chunk rows.
    """
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", F.split("text", " ").alias("ws"))
    starts = arr.select(
        "doc_id",
        "ws",
        F.posexplode(
            F.sequence(
                F.lit(0),
                F.greatest(F.size("ws") - 1, F.lit(0)),
                F.lit(CHUNK_STRIDE),
            )
        ).alias("chunk_idx", "start"),
    )
    chunk = F.slice("ws", F.col("start") + 1, CHUNK_WORDS)
    return starts.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.concat_ws(" ", chunk).alias("chunk_text"),
        F.size(chunk).cast("bigint").alias("n_words"),
    ).orderBy("doc_id", "chunk_idx")


NGRAM_TOPK = 25


@query(
    "text_ngram_counts",
    oracle=f"""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    bi AS (
      SELECT ws[i] || ' ' || ws[i+1] AS bigram
      FROM w, UNNEST(CASE WHEN len(ws) >= 2 THEN range(1, len(ws)) ELSE [] END) AS t(i))
    SELECT bigram, count(*) AS n
    FROM bi GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT {NGRAM_TOPK}
    """,
)
def text_ngram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram frequency (vocabulary-building feed): materialized
    word array → adjacent-pair transform → explode → count. One shuffle
    on the bigram key with map-side partial aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select(F.split("text", " ").alias("ws"))
    bigrams = arr.select(
        F.explode(
            F.when(
                F.size("ws") >= 2,
                F.expr("transform(sequence(0, size(ws) - 2), i -> concat(ws[i], ' ', ws[i+1]))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "bigram")
        .limit(NGRAM_TOPK)
    )


TFIDF_TOPK = 3


@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM w WHERE term <> '' GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (
      SELECT t.doc_id, t.term, t.tf,
             round(t.tf * (ln((n.n + 1.0) / (dfreq.df + 1.0)) + 1.0), 6)
               AS score
      FROM tf t JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (
      SELECT doc_id, term, tf, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, term) AS rnk
      FROM scored)
    SELECT doc_id, term, tf, score, rnk
    FROM ranked WHERE rnk <= {TFIDF_TOPK}
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k keywords by smoothed TF-IDF
    (``tf * (ln((N+1)/(df+1)) + 1)``).

    Shuffle budget: one explode + (doc_id, term) aggregation for TF,
    one term-keyed aggregation for DF (derived from the TF table — the
    corpus is scanned once), one term-keyed join back (vocab-sized
    right side; Zipf keeps it far smaller than the corpus, AQE picks
    broadcast when it fits), and the per-document top-k window
    partitioned by doc_id. Corpus size N is a 1-row broadcast scalar,
    the same decorrelation shape as the TPC-H scalar subqueries.
    Ranking happens on the *rounded* score with a term tie-break so
    every engine produces the identical top-k.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = words.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                6,
            ).alias("score"),
        )
    )
    from pyspark.sql.window import Window

    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    )
    return (
        scored.withColumn("rnk", rnk)
        .filter(F.col("rnk") <= TFIDF_TOPK)
        .orderBy("doc_id", "rnk")
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH wc AS (
      SELECT doc_id, w, count(*) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
      GROUP BY 1, 2)
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_words,
           count(*) AS n_distinct,
           round(count(*) * 1.0 / sum(c), 4) AS unique_ratio,
           round(max(c) * 1.0 / sum(c), 4) AS top_word_share,
           round(list_sum(list_slice(list_sort(list(c), 'DESC'), 1, 3)) * 1.0
                 / sum(c), 4) AS top3_share
    FROM wc GROUP BY doc_id ORDER BY doc_id
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition / diversity signals per document — the Gopher-style
    pretraining quality filters (duplicate-token and top-n-gram-share
    rules): unique-word ratio, most-frequent-word share, and the share
    held by the three most frequent words.

    Shape: explode → (doc, word) count → per-doc fold. Two keyed
    aggregations with map-side partial combine, no windows and no
    per-doc quadratic higher-order scans (an `aggregate`-over-distinct
    formulation would be O(words x distinct) per row — fine here,
    pathological on 10k-word documents). doc_id keys are near-unique,
    so neither shuffle can skew; the top-3 fold collects only the
    per-doc distinct-word COUNT list (bounded by vocabulary per doc).
    """
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    wc = words.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    top3 = F.aggregate(
        F.slice(F.sort_array(F.collect_list("c"), asc=False), 1, 3),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return (
        wc.groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_words"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
            top3.alias("top3"),
        )
        .select(
            "doc_id",
            "n_words",
            "n_distinct",
            F.round(F.col("n_distinct") / F.col("n_words"), 4).alias("unique_ratio"),
            F.round(F.col("top_c") / F.col("n_words"), 4).alias("top_word_share"),
            F.round(F.col("top3") / F.col("n_words"), 4).alias("top3_share"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# corpus data-card report (per-source profiling)
# ---------------------------------------------------------------------------

_CORPUS_REPORT_ORACLE = """
WITH per AS (
  SELECT source, doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_words,
         md5(text) AS h
  FROM documents),
dups AS (
  SELECT md5(text) AS h, 1 AS dup_flag
  FROM documents GROUP BY 1 HAVING count(*) > 1)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(per.n_words) AS BIGINT) AS total_words,
       CAST((sum(per.n_chars) * 100) // count(*) AS BIGINT) AS avg_chars_e2,
       count(DISTINCT per.lang) AS n_langs,
       count(dups.dup_flag) AS dup_docs,
       CAST((count(dups.dup_flag) * 10000) // count(*) AS BIGINT) AS dup_bp
FROM per LEFT JOIN dups USING (h)
GROUP BY source ORDER BY source
"""


@query("corpus_summary_report", oracle=_CORPUS_REPORT_ORACLE)
def corpus_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus data card: volume, token mass, mean length,
    language spread, and exact-duplicate burden in one report — the
    table a dataset release documents ("data card") and a mixture
    designer reads before setting sampling weights.

    One corpus scan: per-doc features are map-only projections; the
    corpus-wide duplicate digests come from one digest-keyed
    aggregation (16-byte shuffle keys) joined back by digest; the
    per-source rollup is a tiny final aggregation. Averages and rates
    are integer-quantized (1e-2 chars, basis points) so the report is
    bit-identical on any engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_words"),
        F.md5("text").alias("h"),
    )
    dups = (
        docs.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("h", F.lit(1).alias("dup_flag"))
    )
    return (
        per.join(dups, "h", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("total_words"),
            F.expr("(sum(n_chars) * 100) div count(1)").alias("avg_chars_e2"),
            F.countDistinct("lang").alias("n_langs"),
            F.count("dup_flag").alias("dup_docs"),
            F.expr("(count(dup_flag) * 10000) div count(1)").alias("dup_bp"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# quality-tier curriculum report (quantile cuts without a global sort)
# ---------------------------------------------------------------------------

#: DuckDB twin of quality_score_sql() — same integer arithmetic as the
#: classifier oracle above, as a standalone CTE pair
_TIER_SCORED_CTE = f"""f AS (
  SELECT doc_id,
         len(string_split(text, ' ')) AS nw,
         len(list_distinct(string_split(text, ' '))) AS nd,
         length(text) AS nc,
         len(list_filter(string_split(text, ' '),
                         w -> w IN ('{STOPWORDS[0]}', '{STOPWORDS[1]}'))) AS ns
  FROM documents),
scored AS (
  SELECT doc_id,
         ({QC_W_LENGTH} * least(nw * 100, 10000)
        + {QC_W_UNIQUE} * ((nd * 10000) // nw)
        + {QC_W_WORDLEN} * greatest(10000 - (abs(2 * (nc - nw + 1) - 9 * nw) * 10000) // (9 * nw), 0)
        + {QC_W_STOPWORD} * least((ns * 50000) // nw, 10000)) // 100 AS q
  FROM f)"""

_TIER_ORACLE = f"""
WITH {_TIER_SCORED_CTE},
hist AS (SELECT q, count(*) AS c FROM scored GROUP BY q),
cum AS (
  SELECT q, CAST(sum(c) OVER (ORDER BY q) AS BIGINT) AS cc FROM hist),
n AS (SELECT count(*) AS n FROM scored),
cuts AS (
  SELECT min(CASE WHEN cc >= (1 * n.n + 3) // 4 THEN q END) AS q1,
         min(CASE WHEN cc >= (2 * n.n + 3) // 4 THEN q END) AS q2,
         min(CASE WHEN cc >= (3 * n.n + 3) // 4 THEN q END) AS q3
  FROM cum CROSS JOIN n),
tiered AS (
  SELECT s.doc_id, s.q,
         1 + CASE WHEN s.q > c.q1 THEN 1 ELSE 0 END
           + CASE WHEN s.q > c.q2 THEN 1 ELSE 0 END
           + CASE WHEN s.q > c.q3 THEN 1 ELSE 0 END AS tier
  FROM scored s CROSS JOIN cuts c)
SELECT CAST(tier AS BIGINT) AS tier, count(*) AS n_docs,
       min(q) AS min_score_e4, max(q) AS max_score_e4,
       CAST(sum(q) // count(*) AS BIGINT) AS avg_score_e4
FROM tiered GROUP BY tier ORDER BY tier
"""


@query("curation_quality_tiers", oracle=_TIER_ORACLE)
def curation_quality_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile quality tiers for curriculum/mixture design: every doc
    is assigned tier 1-4 by exact score quartiles, reported as per-tier
    count + score range.

    Scale shape: NO global sort ever touches the corpus. The integer
    score domain (0..10000) is aggregated into a bounded histogram
    (<= 10001 rows), the cumulative window runs over that tiny
    relation, and the three cut scores broadcast back for a map-only
    tier assignment — the classic "exact quantiles of a bounded integer
    domain" trick. Deterministic: cut_k = min score whose cumulative
    count reaches ceil(k*n/4); ties share a tier, so tier populations
    wobble around n/4 only at tie boundaries, identically on every
    engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select("doc_id", F.expr(quality_score_sql()).alias("q"))
    hist = scored.groupBy("q").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql.window import Window

    # window over the HISTOGRAM (bounded score domain), not the corpus
    cum = hist.withColumn(
        "cc",
        F.sum("c").over(
            Window.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    n = scored.agg(F.count(F.lit(1)).alias("n"))
    cuts = cum.crossJoin(F.broadcast(n)).agg(
        F.min(F.when(F.expr("cc >= (1 * n + 3) div 4"), F.col("q"))).alias("q1"),
        F.min(F.when(F.expr("cc >= (2 * n + 3) div 4"), F.col("q"))).alias("q2"),
        F.min(F.when(F.expr("cc >= (3 * n + 3) div 4"), F.col("q"))).alias("q3"),
    )
    tiered = scored.crossJoin(F.broadcast(cuts)).select(
        "doc_id",
        "q",
        (
            F.lit(1)
            + F.when(F.col("q") > F.col("q1"), 1).otherwise(0)
            + F.when(F.col("q") > F.col("q2"), 1).otherwise(0)
            + F.when(F.col("q") > F.col("q3"), 1).otherwise(0)
        ).alias("tier"),
    )
    return (
        tiered.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("q").alias("min_score_e4"),
            F.max("q").alias("max_score_e4"),
            F.expr("sum(q) div count(1)").alias("avg_score_e4"),
        )
        .withColumn("tier", F.col("tier").cast("bigint"))
        .orderBy("tier")
    )


# ---------------------------------------------------------------------------
# collocation mining (PMI-style bigram lift)
# ---------------------------------------------------------------------------

COLLOC_MIN_COUNT = 5  #: minimum bigram occurrences to report
COLLOC_TOP_K = 50

#: staged integer lift — BOTH engines evaluate the divisions in this
#: exact order, so the result is bit-identical (and each intermediate
#: stays far below int64: c_ab*N_uni*100 <= ~1e12 at sf0.1; at true
#: corpus scale promote the chain to DECIMAL(38,0) on both sides)
_COLLOC_LIFT = (
    "(( (c_ab * n_uni * 100) {div} c_a ) * n_uni) {div} (c_b * n_bi)"
)

_COLLOC_ORACLE = f"""
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
bi AS (
  SELECT ws[i] AS w1, ws[i+1] AS w2, count(*) AS c_ab
  FROM w, UNNEST(CASE WHEN len(ws) >= 2 THEN range(1, len(ws)) ELSE [] END) AS t(i)
  GROUP BY 1, 2),
uni AS (
  SELECT u.w, count(*) AS c
  FROM w, UNNEST(ws) AS u(w) GROUP BY 1),
n AS (
  SELECT (SELECT sum(c) FROM uni) AS n_uni,
         (SELECT sum(c_ab) FROM bi) AS n_bi)
SELECT w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
       CAST({_COLLOC_LIFT.format(div='//')} AS BIGINT) AS lift_e2
FROM (
  SELECT bi.w1, bi.w2, bi.c_ab, ua.c AS c_a, ub.c AS c_b, n.n_uni, n.n_bi
  FROM bi JOIN uni ua ON ua.w = bi.w1
          JOIN uni ub ON ub.w = bi.w2
          CROSS JOIN n
  WHERE bi.c_ab >= {COLLOC_MIN_COUNT})
ORDER BY lift_e2 DESC, w1, w2 LIMIT {COLLOC_TOP_K}
"""


@query("text_collocation_lift", oracle=_COLLOC_ORACLE)
def text_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: the corpus's top adjacent-bigram
    collocations ranked by lift (PMI without the log — the observed
    bigram rate over the rate independence predicts), the classic
    phrase-discovery pass a tokenizer/vocab builder runs before
    merging multi-word units.

    Design for 100 TB: bigram and unigram counts are two map-side-
    combinable aggregations over exploded tokens (the heavy shuffles,
    both keyed by token text — at scale reduce to 8-byte token hashes
    exactly like the shingle ops); the unigram relation is vocabulary-
    sized, so its two joins back onto bigram counts broadcast; corpus
    totals are one-row broadcast scalars. The lift arithmetic is a
    staged integer chain evaluated in the identical order by the
    DuckDB oracle, so the ranking is engine-exact (no float PMI
    round-trip).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(F.split("text", " ").alias("ws"))
    bi = (
        w.select(
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN transform(sequence(0, size(ws) - 2), "
                    "i -> struct(ws[i] AS w1, ws[i+1] AS w2)) "
                    "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END"
                )
            ).alias("b")
        )
        .groupBy(F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = (
        w.select(F.explode("ws").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n = uni.agg(F.sum("c").alias("n_uni")).crossJoin(
        bi.agg(F.sum("c_ab").alias("n_bi"))
    )
    ua = uni.select(F.col("tok").alias("w1"), F.col("c").alias("c_a"))
    ub = uni.select(F.col("tok").alias("w2"), F.col("c").alias("c_b"))
    return (
        bi.filter(F.col("c_ab") >= COLLOC_MIN_COUNT)
        .join(F.broadcast(ua), "w1")
        .join(F.broadcast(ub), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            F.expr(_COLLOC_LIFT.format(div="div"))
            .cast("bigint")
            .alias("lift_e2"),
        )
        .orderBy(F.col("lift_e2").desc(), "w1", "w2")
        .limit(COLLOC_TOP_K)
    )


COLLOC_GROUP_K = 20  #: per-language top-k for the grouped form

_COLLOC_BY_LANG_ORACLE = f"""
WITH w AS (SELECT lang, string_split(text, ' ') AS ws FROM documents),
bi AS (
  SELECT lang, ws[i] AS w1, ws[i+1] AS w2, count(*) AS c_ab
  FROM w, UNNEST(CASE WHEN len(ws) >= 2 THEN range(1, len(ws)) ELSE [] END) AS t(i)
  GROUP BY 1, 2, 3),
uni AS (
  SELECT lang, u.w, count(*) AS c
  FROM w, UNNEST(ws) AS u(w) GROUP BY 1, 2),
tot AS (SELECT lang, sum(c) AS n_uni FROM uni GROUP BY lang),
totb AS (SELECT lang, sum(c_ab) AS n_bi FROM bi GROUP BY lang),
joined AS (
  SELECT bi.lang, bi.w1, bi.w2, bi.c_ab, ua.c AS c_a, ub.c AS c_b,
         t.n_uni, tb.n_bi
  FROM bi JOIN uni ua ON ua.lang IS NOT DISTINCT FROM bi.lang AND ua.w = bi.w1
          JOIN uni ub ON ub.lang IS NOT DISTINCT FROM bi.lang AND ub.w = bi.w2
          JOIN tot t ON t.lang IS NOT DISTINCT FROM bi.lang
          JOIN totb tb ON tb.lang IS NOT DISTINCT FROM bi.lang
  WHERE bi.c_ab >= {COLLOC_MIN_COUNT}),
ranked AS (
  SELECT lang, w1, w2, CAST(c_ab AS BIGINT) AS c_ab,
         CAST({_COLLOC_LIFT.format(div='//')} AS BIGINT) AS lift_e2,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY {_COLLOC_LIFT.format(div='//')} DESC, w1, w2
         ) AS rk
  FROM joined)
SELECT lang, w1, w2, c_ab, lift_e2
FROM ranked WHERE rk <= {COLLOC_GROUP_K}
ORDER BY lang, lift_e2 DESC, w1, w2
"""


@query("text_collocation_lift_by_lang", oracle=_COLLOC_BY_LANG_ORACLE)
def text_collocation_lift_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``text_collocation_lift`` PER LANGUAGE — the form a multilingual
    vocab builder actually needs (a collocation is a property of one
    language's phrase distribution; corpus-wide lift lets the dominant
    language drown the others; VERDICT r6 item 4).

    Grouped-guard discipline (the heavy-hitters lesson):

    - NULL lang is a REAL group: every join that carries the lang key
      (bigram→unigram, bigram→totals) uses a NULL-SAFE equality
      (``<=>`` / ``IS NOT DISTINCT FROM``) — a plain equi-join would
      silently drop undetected-language docs from the report;
    - per-group fallback: a language with no bigram reaching
      ``COLLOC_MIN_COUNT`` yields no rows for that lang (an honest
      empty slice, not a division blowup — the lift chain divides by
      per-lang totals that are nonzero whenever a qualifying bigram
      exists);
    - per-lang top-k via a rank window PARTITIONED by lang (no global
      sort of the full lift relation).

    Scale shape: the two heavy aggregations now key on (lang, token) —
    same map-side-combinable explode shuffles; the unigram/total
    relations stay vocabulary-sized per language, so their joins back
    onto bigram counts broadcast exactly as the global form's do.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    w = docs.select("lang", F.split("text", " ").alias("ws"))
    bi = (
        w.select(
            "lang",
            F.explode(
                F.expr(
                    "CASE WHEN size(ws) >= 2 THEN transform(sequence(0, size(ws) - 2), "
                    "i -> struct(ws[i] AS w1, ws[i+1] AS w2)) "
                    "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END"
                )
            ).alias("b"),
        )
        .groupBy("lang", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("c_ab"))
    )
    uni = (
        w.select("lang", F.explode("ws").alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = uni.groupBy("lang").agg(F.sum("c").alias("n_uni"))
    totb = bi.groupBy("lang").agg(F.sum("c_ab").alias("n_bi"))
    ua = uni.select(
        F.col("lang").alias("la"), F.col("tok").alias("w1"), F.col("c").alias("c_a")
    )
    ub = uni.select(
        F.col("lang").alias("lb"), F.col("tok").alias("w2"), F.col("c").alias("c_b")
    )
    tt = tot.select(F.col("lang").alias("lt"), "n_uni")
    tb = totb.select(F.col("lang").alias("ltb"), "n_bi")
    joined = (
        bi.filter(F.col("c_ab") >= COLLOC_MIN_COUNT)
        .join(
            F.broadcast(ua),
            (F.col("lang").eqNullSafe(F.col("la"))) & (bi["w1"] == ua["w1"]),
        )
        .drop(ua["w1"])
        .drop("la")
        .join(
            F.broadcast(ub),
            (F.col("lang").eqNullSafe(F.col("lb"))) & (bi["w2"] == ub["w2"]),
        )
        .drop(ub["w2"])
        .drop("lb")
        .join(F.broadcast(tt), F.col("lang").eqNullSafe(F.col("lt")))
        .drop("lt")
        .join(F.broadcast(tb), F.col("lang").eqNullSafe(F.col("ltb")))
        .drop("ltb")
    )
    lift = F.expr(_COLLOC_LIFT.format(div="div"))
    rk = F.row_number().over(
        Window.partitionBy("lang").orderBy(lift.desc(), "w1", "w2")
    )
    return (
        joined.select(
            "lang",
            "w1",
            "w2",
            F.col("c_ab").cast("bigint").alias("c_ab"),
            lift.cast("bigint").alias("lift_e2"),
            rk.alias("rk"),
        )
        .filter(F.col("rk") <= COLLOC_GROUP_K)
        .drop("rk")
        .orderBy("lang", F.col("lift_e2").desc(), "w1", "w2")
    )


# ---------------------------------------------------------------------------
# bigram LM scoring (CCNet-style perplexity filtering, corpus-trained)
# ---------------------------------------------------------------------------
#
# CCNet-family pipelines rank documents by language-model perplexity
# and cut the worst tail. This is that signal with the LM trained ON
# the corpus itself: an add-one-smoothed word-bigram model — P(w2|w1)
# = (B(w1,w2)+1) / (U(w1)+V) — scored per document as total and
# per-bigram negative log-likelihood. Gibberish and boilerplate-free
# rare text score high (unfamiliar transitions); templated text scores
# low. Float discipline follows search_bm25_topk: each occurrence's
# ln() is quantized to an e6 BIGINT BEFORE summing, so the per-doc sum
# is integer arithmetic — order-independent, hash-stable across
# engines (a raw double sum would drift with partition order).
#
# Scale: two token-keyed aggregates (unigram/bigram counts — partial
# map-side combine), one small broadcastable model relation at real
# vocabulary sizes per language slice (or a plain shuffle join when
# not), and one doc-keyed integer sum. Nothing quadratic; the words
# array materializes once per doc exactly like word_shingles.

_BIGRAM_LP_ORACLE = """
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws
  FROM documents WHERE text IS NOT NULL),
uni AS (
  SELECT w1, count(*)::DOUBLE AS u
  FROM (SELECT unnest(ws) AS w1 FROM w) GROUP BY w1),
v AS (SELECT count(*)::DOUBLE AS v FROM uni),
bg AS (
  SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
  FROM w, UNNEST(CASE WHEN len(ws) >= 2 THEN range(1, len(ws))
                      ELSE [] END) AS t(i)),
bcnt AS (
  SELECT w1, w2, count(*)::DOUBLE AS b FROM bg GROUP BY w1, w2),
contrib AS (
  SELECT bg.doc_id,
         CAST(round(-ln((bcnt.b + 1.0) / (uni.u + v.v)) * 1000000.0)
              AS BIGINT) AS nll_e6
  FROM bg JOIN bcnt USING (w1, w2) JOIN uni USING (w1) CROSS JOIN v),
per AS (
  SELECT doc_id, count(*) AS n_bigrams, sum(nll_e6) AS nll
  FROM contrib GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(per.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(per.nll, 0) AS BIGINT) AS total_nll_e6,
       CAST(CASE WHEN coalesce(per.n_bigrams, 0) = 0 THEN 0
                 ELSE per.nll // per.n_bigrams END AS BIGINT) AS avg_nll_e6
FROM documents d LEFT JOIN per USING (doc_id)
WHERE d.text IS NOT NULL
ORDER BY d.doc_id
"""


@query("text_bigram_logprob", oracle=_BIGRAM_LP_ORACLE)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram-LM negative log-likelihood (total and mean,
    e6-quantized BIGINT) under the corpus-trained add-one model — the
    perplexity-filter signal, self-trained so it is a pure
    deterministic function of the data. Every in-corpus bigram has
    model mass by construction; cross-corpus scoring would add an OOV
    branch (score against (0+1)/(U+V)) — same plan shape."""
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull()
    )
    w = docs.select("doc_id", F.split("text", " ").alias("ws"))
    uni = (
        w.select(F.explode("ws").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("double").alias("u"))
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    bg = w.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(ws) >= 2 THEN "
                "transform(sequence(0, size(ws) - 2), "
                "i -> struct(ws[i] AS w1, ws[i+1] AS w2)) "
                "ELSE CAST(array() AS array<struct<w1:string,w2:string>>) END"
            )
        ).alias("p"),
    ).select("doc_id", "p.w1", "p.w2")
    bcnt = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("double").alias("b")
    )
    contrib = (
        bg.join(bcnt, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.round(
                -F.log((F.col("b") + F.lit(1.0)) / (F.col("u") + F.col("v")))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .alias("nll_e6"),
        )
    )
    per = contrib.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"), F.sum("nll_e6").alias("nll")
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce("nll", F.lit(0)).cast("bigint").alias("total_nll_e6"),
            F.expr(
                "CAST(CASE WHEN coalesce(n_bigrams, 0) = 0 THEN 0 "
                "ELSE nll DIV n_bigrams END AS BIGINT)"
            ).alias("avg_nll_e6"),
        )
        .orderBy("doc_id")
    )
