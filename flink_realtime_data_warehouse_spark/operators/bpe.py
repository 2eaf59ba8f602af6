"""Corpus-trained BPE-style token accounting (round-10 verdict item 3).

``sample_token_budget`` and ``pack_training_sequences`` price documents
in whitespace/regex tokens; real pipelines budget in BPE tokens, and
the mispricing is systematic (~1.3-1.5x on English). This module
trains a deterministic merges table ON THE CORPUS ITSELF — the
``text_bigram_logprob`` discipline: on-corpus model, integer-exact
scoring, so a DuckDB oracle can state the SAME merge sequence and the
driver's value-hash compare is meaningful.

The model (deliberately oracle-expressible):

- **Pre-tokenization**: ``[a-z0-9]+`` runs over ``lower(text)`` (the
  GPT-2-style regex split reduced to its alnum core — whitespace and
  punctuation carry no token mass here).
- **Training** (compositional, r11 — verdict item 3): standard
  practice trains on the collected word-frequency VOCABULARY, not the
  corpus. One map-combinable aggregation builds the vocab, the top
  ``BPE_VOCAB_CAP`` words by (count DESC, word ASC — total
  deterministic order) are collected (bounded driver memory, the
  centroid pattern), and ``BPE_MERGES`` TRUE sequential Sennrich
  rounds run driver-side over that dict: count adjacent symbol pairs
  weighted by word frequency, merge the top pair (count DESC, pair
  ASC), re-count. Every merged unit is a SINGLE private-use char
  (U+E000+rank), so a pair is always a 2-char string and later
  merges compose over earlier merges' output symbols naturally —
  "th"+"e" CAN form "the", which the r10 one-shot variant
  (``train_bpe_merges_oneshot``, kept as the measured baseline)
  structurally could not. The oracle states the SAME procedure with
  the K rounds unrolled as plain CTEs over the same capped vocab —
  both engines share replace() semantics (left-to-right,
  non-overlapping) and binary string collation, so the merge tables
  are equal by construction and the driver's value-hash compare
  stays meaningful.
- **Application** (map-only): each document's words are joined with a
  single space (never part of any merge pair), then each ranked merge
  is applied as a plain ``replace(s, pair, chr(0xE000 + rank))`` —
  all non-overlapping occurrences, left to right. Spark's ``replace``
  and DuckDB's ``replace`` share these semantics exactly, and the
  private-use substitution characters (U+E000..) can never occur in
  the corpus or collide with each other, so application order is the
  only order that matters — and both engines apply rank 1..K
  identically. Token count = ``length(merged) - (n_words - 1)``
  (subtracting the separators); every merged pair occurrence saves
  exactly one token.

Scale shape: training is ONE shuffle keyed by word (partial
aggregation applies) and a capped-vocab collect (4096 rows — the
centroid pattern, not a corpus collect; the driver loop is
O(V·len·K) ≈ 1.6M char ops, microseconds of wall). Application is one
chained-expression projection: zero joins, zero shuffles, whole-stage
codegen, identical at 100 TB. K is a constant (48), so the expression
depth is fixed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

#: trained merge-table size (fixed expression depth of the apply step)
BPE_MERGES = 48
#: pre-tokenization: the alnum core of a GPT-2-style regex split
BPE_WORD_RE = "[a-z0-9]+"
#: substitution alphabet base — Unicode private-use area, guaranteed
#: absent from the corpus (ASCII by construction) and from every pair
BPE_SUB_BASE = 0xE000
#: training-vocabulary cap: the top-V words by frequency are the
#: Sennrich training dict (bounded driver memory at ANY corpus size;
#: tail words contribute negligible pair mass, the standard trade)
BPE_VOCAB_CAP = 4096


def _words(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(BPE_WORD_RE), F.lit(0))


def _collect_vocab(
    docs: DataFrame, text_col: str, vocab_cap: int
) -> list[tuple[str, int]]:
    """Top-``vocab_cap`` (word, count) by count DESC, word ASC — ONE
    map-combinable aggregation + a bounded TakeOrdered collect. The
    fan-out runs the explode wide (single-split fixture scan,
    fanout.py; pre-split inputs at lake scale delete it first)."""
    from flink_realtime_data_warehouse_spark.fanout import fanout

    vocab = (
        fanout(docs, docs.columns[0]).filter(F.col(text_col).isNotNull())
        .select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("w") >= 2)
    )
    rows = vocab.orderBy(F.col("c").desc(), "w").limit(vocab_cap).collect()
    return [(r["w"], int(r["c"])) for r in rows]


#: session-level trained-merge cache (r11 opt): three registry rows
#: (token_count / token_budget / packing) each retrain the IDENTICAL
#: merge table from the same corpus — the _SHINGLE_CACHE discipline
#: (operators/dedup.py, r4 verdict) applied to the BPE train. Key =
#: (application, docs-plan semantic hash, FILE-CONTENT stamp, params),
#: so a rewritten corpus re-stamps to a fresh entry and semantics can
#: never depend on the cache; the value is the tiny ranked merge list.
import threading as _threading

_MERGES_CACHE: dict = {}
_MERGES_CACHE_CAP = 16
_MERGES_LOCK = _threading.Lock()


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    k: int = BPE_MERGES,
    vocab_cap: int = BPE_VOCAB_CAP,
) -> list[str]:
    """Compositional (true sequential Sennrich) training over the
    capped word-frequency vocabulary: ``k`` rounds of count-merge-
    recount driver-side. Each round counts every adjacent symbol pair
    (overlaps included — the standard statistic), merges the top pair
    (count DESC, pair ASC) into the round's private-use symbol via
    non-overlapping left-to-right replace, and re-counts. Because
    merged symbols are single chars, pairs stay 2-char strings and
    the ranked merge table drives the SAME chained-``replace`` apply
    as before — rounds compose (``th``+``e`` → ``the``). Stops early
    if the vocabulary runs out of pairs (every word fully merged).

    The result is a pure function of (corpus content, params) and is
    memoized per session under a content-addressed key (see
    ``_MERGES_CACHE``) — the train-once/apply-many production shape."""
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _file_content_stamp,
    )

    key = (
        docs.sparkSession.sparkContext.applicationId,
        docs.semanticHash(),
        _file_content_stamp(docs),
        text_col,
        k,
        vocab_cap,
    )
    with _MERGES_LOCK:
        hit = _MERGES_CACHE.get(key)
    if hit is not None:
        return list(hit)
    words = _collect_vocab(docs, text_col, vocab_cap)
    states = [w for w, _c in words]
    counts = [c for _w, c in words]
    merges: list[str] = []
    for rank in range(1, k + 1):
        pair_counts: dict[str, int] = {}
        for s, c in zip(states, counts):
            for i in range(len(s) - 1):
                p = s[i : i + 2]
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        sub = chr(BPE_SUB_BASE + rank)
        merges.append(best)
        states = [s.replace(best, sub) for s in states]
    with _MERGES_LOCK:
        while len(_MERGES_CACHE) >= _MERGES_CACHE_CAP:
            _MERGES_CACHE.pop(next(iter(_MERGES_CACHE)))
        _MERGES_CACHE[key] = tuple(merges)
    return merges


def train_bpe_merges_oneshot(
    docs: DataFrame, text_col: str = "text", k: int = BPE_MERGES
) -> list[str]:
    """The r10 one-shot variant, kept as the measured baseline for the
    compositional-vs-oneshot compression pin (tests/test_bpe.py): top
    ``k`` adjacent CHARACTER pairs counted once over the full word
    vocabulary — merges cannot reference earlier merges' output
    symbols, so multi-round units ("the" via "th"+"e") never form."""
    vocab = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.explode(_words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.length("w") >= 2)
    )
    pairs = (
        vocab.select(
            "w", "c",
            F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        )
        .select(F.col("w").substr(F.col("i"), F.lit(2)).alias("p"), "c")
        .groupBy("p")
        .agg(F.sum("c").alias("cnt"))
    )
    rows = pairs.orderBy(F.col("cnt").desc(), F.col("p")).limit(k).collect()
    return [r["p"] for r in rows]


def bpe_token_count(text_col: Column, merges: list[str]) -> Column:
    """Map-only BPE token count under a trained merge table: join the
    words on a single space, apply each ranked merge as a global
    left-to-right ``replace`` onto its private-use symbol, and count
    ``length - separators``. NULL text counts NULL (a missing payload
    has no token mass, and 0 would silently admit it into a token
    budget)."""
    words = _words(text_col)
    s = F.array_join(words, " ")
    for rank, p in enumerate(merges, start=1):
        s = F.replace(s, F.lit(p), F.lit(chr(BPE_SUB_BASE + rank)))
    nw = F.size(words)
    cnt = (F.length(s) - F.greatest(nw - F.lit(1), F.lit(0))).cast("bigint")
    return F.when(text_col.isNull(), F.lit(None).cast("bigint")).otherwise(cnt)


def ws_token_count(text_col: Column) -> Column:
    """The whitespace-ish pre-token count under the SAME pre-tokenizer
    (word count) — the divergence baseline the registry row exposes
    beside the BPE count."""
    return F.when(
        text_col.isNull(), F.lit(None).cast("bigint")
    ).otherwise(F.size(_words(text_col)).cast("bigint"))


def bpe_oracle_cte(k: int = BPE_MERGES, table: str = "documents") -> str:
    """The DuckDB statement of the SAME model, as named CTEs ending in
    ``bpe_counts(doc_id, n_bpe_tokens, n_ws_tokens)``. Callers embed it
    under ``WITH RECURSIVE``.

    Training (compositional, r11) is the K Sennrich rounds UNROLLED as
    plain CTE blocks over the capped vocabulary — each round counts
    adjacent symbol pairs (sum over vocab states, overlaps included),
    takes the top pair (cnt DESC, p ASC — DuckDB's binary collation ==
    Python's codepoint order), and rewrites the states with
    ``replace`` onto the round's private-use char, exactly the driver
    loop in ``train_bpe_merges``. An exhausted round (no pairs left)
    yields an empty ``mg_k``; ``coalesce(.., chr(1)||chr(1))`` makes
    its replace a no-op — the impossible pair never occurs, matching
    the Python loop's early ``break``. O(K · |vocab|) intermediate
    rows, trivial at oracle scale.

    Application is unchanged: the recursive CTE applies merge rank
    r+1 to every document row at rank r — O(rows x K) intermediate
    rows; ``coalesce(array_to_string(..), '')`` papers over DuckDB
    returning NULL (not '') for an empty list join."""
    noop = "chr(1)||chr(1)"  # never occurs in any state
    # MATERIALIZED is load-bearing: each round references the previous
    # state CTE twice (pair count + rewrite); inlined, the chain would
    # expand 2^K plan copies of the base scan
    rounds = []
    for r in range(1, k + 1):
        prev = f"bpe_st{r - 1}"
        rounds.append(f"""
bpe_pr{r} AS MATERIALIZED (
  SELECT substr(s, CAST(i AS INT), 2) AS p, sum(c) AS cnt
  FROM (SELECT s, c, unnest(range(1, length(s))) AS i FROM {prev})
  GROUP BY 1),
bpe_mg{r} AS MATERIALIZED (
  SELECT p FROM bpe_pr{r} ORDER BY cnt DESC, p LIMIT 1),
bpe_st{r} AS MATERIALIZED (
  SELECT replace(s, coalesce((SELECT p FROM bpe_mg{r}), {noop}),
                 chr({BPE_SUB_BASE + r})) AS s, c
  FROM {prev}),""")
    merge_union = "\n  UNION ALL ".join(
        f"SELECT {r} AS r, p FROM bpe_mg{r}" for r in range(1, k + 1)
    )
    return f"""
bpe_words AS (
  SELECT unnest(regexp_extract_all(lower(text), '{BPE_WORD_RE}')) AS w
  FROM {table} WHERE text IS NOT NULL),
bpe_vocab AS MATERIALIZED (
  SELECT w, count(*) AS c FROM bpe_words GROUP BY w HAVING length(w) >= 2
  ORDER BY c DESC, w LIMIT {BPE_VOCAB_CAP}),
bpe_st0 AS MATERIALIZED (SELECT w AS s, c FROM bpe_vocab),{"".join(rounds)}
bpe_merges AS (
  SELECT CAST(r AS INT) AS r, p FROM ({merge_union})),
bpe_nm AS (SELECT count(*) AS n FROM bpe_merges),
bpe_base AS (
  SELECT doc_id,
         CASE WHEN text IS NULL THEN NULL
              ELSE coalesce(array_to_string(
                     regexp_extract_all(lower(text), '{BPE_WORD_RE}'), ' '), '')
         END AS s,
         CASE WHEN text IS NULL THEN NULL
              ELSE len(regexp_extract_all(lower(text), '{BPE_WORD_RE}'))
         END AS nw
  FROM {table}),
bpe_appl AS (
  SELECT doc_id, s, nw, 0 AS r FROM bpe_base
  UNION ALL
  SELECT a.doc_id, replace(a.s, m.p, chr({BPE_SUB_BASE} + m.r)) AS s,
         a.nw, a.r + 1 AS r
  FROM bpe_appl a JOIN bpe_merges m ON m.r = a.r + 1),
bpe_counts AS (
  SELECT doc_id,
         CAST(length(s) - greatest(nw - 1, 0) AS BIGINT) AS n_bpe_tokens,
         CAST(nw AS BIGINT) AS n_ws_tokens
  FROM bpe_appl WHERE r = (SELECT n FROM bpe_nm))"""


# ---------------------------------------------------------------------------
# registry rows
# ---------------------------------------------------------------------------

def _bpe_count_oracle() -> str:
    return f"""
WITH RECURSIVE {bpe_oracle_cte()}
SELECT doc_id, n_bpe_tokens, n_ws_tokens
FROM bpe_counts ORDER BY doc_id
"""


@query("text_bpe_token_count", oracle=_bpe_count_oracle())
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-faithful token accounting: per-document BPE token
    count under the corpus-trained merge table, beside the
    whitespace-ish pre-token count it corrects (module docstring has
    the model + scale shape; tests pin that the two diverge on this
    corpus — the ~1.3-1.5x systematic mispricing the row exists to
    fix)."""
    from flink_realtime_data_warehouse_spark.fanout import fanout

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs)
    # the apply chain (regex split + K replaces) is map-only but NOT
    # cheap per row, and the single-row-group fixture scan would run it
    # on one task (~0.9 s in-task at sf0.1) — fan it out (fanout.py)
    return fanout(docs, "doc_id").select(
        "doc_id",
        bpe_token_count(F.col("text"), merges).alias("n_bpe_tokens"),
        ws_token_count(F.col("text")).alias("n_ws_tokens"),
    ).orderBy("doc_id")


def _bpe_budget_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        BPE_TOKEN_BUDGET,
    )
    from flink_realtime_data_warehouse_spark.operators.textops import (
        _TIER_SCORED_CTE,
    )

    return f"""
WITH RECURSIVE {_TIER_SCORED_CTE},
{bpe_oracle_cte()},
sized AS (
  SELECT s.doc_id, s.q, b.n_bpe_tokens AS nt
  FROM scored s JOIN bpe_counts b USING (doc_id)
  WHERE b.n_bpe_tokens IS NOT NULL),
ordered AS (
  SELECT doc_id, q, nt,
         sum(nt) OVER (ORDER BY q DESC, doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - nt AS cum_before
  FROM sized)
SELECT doc_id, CAST(q AS BIGINT) AS score_e4, nt AS n_bpe_tokens
FROM ordered WHERE cum_before < {BPE_TOKEN_BUDGET}
ORDER BY q DESC, doc_id
"""


@query("sample_token_budget_bpe", oracle=_bpe_budget_oracle())
def sample_token_budget_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sample_token_budget`` priced in trained-BPE tokens instead of
    whitespace tokens — the budget a real pretraining run actually
    spends. Same greedy quality-order admission (``cum_before <
    budget``), same histogram-cut selection machinery
    (``token_budget_select`` — no corpus sort); only the pricing
    column changes, so a selection driven by the wrong token unit is
    directly comparable row-for-row (the parity test pins that the
    two budgets admit DIFFERENT document sets on this corpus).
    NULL-text documents carry NULL token mass and are excluded — a
    budget must never admit unpriceable rows for free."""
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        BPE_TOKEN_BUDGET,
        token_budget_select,
    )
    from flink_realtime_data_warehouse_spark.operators.textops import (
        quality_score_sql,
    )

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs)
    # fan out BEFORE the pricing projection: token_budget_select's plan
    # traverses ``sized`` from three branches (histogram subquery + the
    # keep/boundary union), so the K-replace chain is evaluated ~3x per
    # execution — single-task that was 3 x ~1.4 s at sf0.1 (measured);
    # fanned out each evaluation is ~0.1 s of full-width map work
    from flink_realtime_data_warehouse_spark.fanout import fanout

    sized = fanout(docs, "doc_id").select(
        "doc_id",
        F.expr(quality_score_sql()).alias("q"),
        bpe_token_count(F.col("text"), merges).alias("nw"),
    ).filter(F.col("nw").isNotNull())
    return (
        token_budget_select(sized, BPE_TOKEN_BUDGET)
        .select(
            "doc_id",
            F.col("q").cast("bigint").alias("score_e4"),
            F.col("nw").alias("n_bpe_tokens"),
        )
        .orderBy(F.col("score_e4").desc(), "doc_id")
    )


PACK_SEQ_LEN_BPE = 2048  #: BPE tokens per packed sequence (~3x the
#: whitespace count on this corpus, so packs stay comparable in real
#: content to the 512-word face while the units are training-faithful)


def _bpe_pack_oracle() -> str:
    from flink_realtime_data_warehouse_spark.operators.sampling import (
        _BUCKET_SQL,
        PACK_N_BUCKETS,
    )

    bucket = _BUCKET_SQL.replace("% 100", f"% {PACK_N_BUCKETS}")
    return f"""
WITH RECURSIVE {bpe_oracle_cte()},
toks AS (
  SELECT doc_id, {bucket} AS bucket, n_bpe_tokens AS n_tokens
  FROM bpe_counts WHERE n_bpe_tokens IS NOT NULL),
pos AS (
  SELECT doc_id, bucket, n_tokens,
         sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS tok_start
  FROM toks)
SELECT doc_id, bucket, n_tokens,
       CAST(tok_start AS BIGINT) AS tok_start,
       CAST(tok_start // {PACK_SEQ_LEN_BPE} AS BIGINT) AS pack_first,
       CAST((tok_start + n_tokens - 1) // {PACK_SEQ_LEN_BPE} AS BIGINT) AS pack_last
FROM pos ORDER BY bucket, doc_id
"""


@query("pack_training_sequences_bpe", oracle=_bpe_pack_oracle())
def pack_training_sequences_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pack_training_sequences`` priced in trained-BPE tokens — the
    concat-then-cut packing a real pretraining run performs, with
    sequence boundaries falling at BPE-token offsets instead of
    whitespace-token offsets (the other half of the unit mispricing
    the BPE family fixes; ``sample_token_budget_bpe`` is the selection
    half). Same shape as the whitespace face: one window prefix-sum
    per content-derived hash bucket (the unit of parallelism AND of
    determinism), no collect, no Python in the plan. NULL-text docs
    carry NULL token mass and are excluded — a pack must never admit
    unpriceable rows at offset arithmetic."""
    from pyspark.sql.window import Window

    from flink_realtime_data_warehouse_spark.operators.sampling import (
        PACK_N_BUCKETS,
        hash_bucket,
    )

    from flink_realtime_data_warehouse_spark.fanout import fanout

    docs = load_table(spark, sf_dir, "documents")
    merges = train_bpe_merges(docs)
    # fan the K-replace pricing chain out of the single fixture scan
    # task (fanout.py) — the window below re-shuffles by bucket anyway
    toks = fanout(docs, "doc_id").select(
        "doc_id",
        hash_bucket(F.col("doc_id"), PACK_N_BUCKETS).alias("bucket"),
        bpe_token_count(F.col("text"), merges).alias("n_tokens"),
    ).filter(F.col("n_tokens").isNotNull())
    w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = toks.withColumn(
        "tok_start", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return pos.select(
        "doc_id",
        "bucket",
        "n_tokens",
        "tok_start",
        F.floor(F.col("tok_start") / PACK_SEQ_LEN_BPE).alias("pack_first"),
        F.floor(
            (F.col("tok_start") + F.col("n_tokens") - 1) / PACK_SEQ_LEN_BPE
        ).alias("pack_last"),
    ).orderBy("bucket", "doc_id")
