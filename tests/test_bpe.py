"""Corpus-trained BPE token accounting (operators/bpe.py): merge
training determinism, replace-chain application semantics, NULL/empty
corners, and the non-vacuous divergence pin between whitespace and
BPE token budgets (the mispricing the rows exist to fix)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.bpe import (
    BPE_MERGES,
    BPE_SUB_BASE,
    bpe_token_count,
    train_bpe_merges,
    ws_token_count,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_training_counts_and_tiebreak(spark):
    # Compositional rounds: round 1 counts ab(4) > ba(2) = zz(2) and
    # merges "ab" -> U+E001, so "ba" NEVER forms again (its chars were
    # consumed — the defining difference from the one-shot variant,
    # whose table here is ["ab","ba","zz"]). Round 2 ties zz(2) with
    # the merged pair U+E001,U+E001 (2) and lexicographic order picks
    # "zz" (codepoints below private-use); round 3 merges the merged
    # symbols — composition over an earlier round's OUTPUT.
    docs = _docs(spark, [(1, "abab zz"), (2, "abab zz")])
    sub1 = chr(BPE_SUB_BASE + 1)
    assert train_bpe_merges(docs, k=3) == ["ab", "zz", sub1 + sub1]
    from flink_realtime_data_warehouse_spark.operators.bpe import (
        train_bpe_merges_oneshot,
    )

    assert train_bpe_merges_oneshot(docs, k=3) == ["ab", "ba", "zz"]


def test_training_is_frequency_weighted_over_occurrences(spark):
    # the same WORD repeated weighs its pairs once per occurrence, not
    # once per vocab entry
    docs = _docs(spark, [(1, "xy xy xy qq")])
    assert train_bpe_merges(docs, k=2) == ["xy", "qq"]


def test_apply_counts_nonoverlapping_left_to_right(spark):
    # merge "aa" over "aaa": one merge (left to right, no overlap)
    # => tokens = 3 chars - 1 merge = 2; "aaaa" => 2 merges => 2 tokens
    df = _docs(spark, [(1, "aaa"), (2, "aaaa"), (3, "aba")])
    got = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", bpe_token_count(F.col("text"), ["aa"]).alias("n")
        ).collect()
    }
    assert got == {1: 2, 2: 2, 3: 3}


def test_apply_rank_order_changes_the_count(spark):
    # "abab": rank-1 "ab" fires twice (2 tokens); but "ba" ranked first
    # consumes the middle chars and leaves 3 — application order is
    # part of the model, and both engines must state the same one
    df = _docs(spark, [(1, "abab")])
    n_ab = df.select(bpe_token_count(F.col("text"), ["ab", "ba"]).alias("n")).first()["n"]
    n_ba = df.select(bpe_token_count(F.col("text"), ["ba", "ab"]).alias("n")).first()["n"]
    assert n_ab == 2
    assert n_ba == 3
    # substitution chars live outside the corpus alphabet
    assert 0xE000 == BPE_SUB_BASE


def test_space_separator_never_merges_across_words(spark):
    # pair "ab" must not fire across the boundary of "...a b..."
    df = _docs(spark, [(1, "xa bx")])
    n = df.select(bpe_token_count(F.col("text"), ["ab"]).alias("n")).first()["n"]
    assert n == 4  # x a b x, no merge


def test_null_and_empty_semantics(spark):
    df = _docs(spark, [(1, None), (2, ""), (3, "   "), (4, "ok")])
    got = {
        r.doc_id: (r.nb, r.nw)
        for r in df.select(
            "doc_id",
            bpe_token_count(F.col("text"), ["ok"]).alias("nb"),
            ws_token_count(F.col("text")).alias("nw"),
        ).collect()
    }
    assert got[1] == (None, None)  # NULL text prices NULL, never 0
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    assert got[4] == (1, 1)  # merged to one symbol


def test_merge_table_is_deterministic_and_bounded(spark):
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    m1 = train_bpe_merges(docs)
    m2 = train_bpe_merges(docs)
    assert m1 == m2
    assert len(m1) <= BPE_MERGES
    assert all(len(p) == 2 for p in m1)


def test_budget_units_diverge_on_the_corpus(spark):
    """The reason the BPE face exists: the whitespace-priced and
    BPE-priced budget selections admit DIFFERENT document sets on the
    fixture corpus (if they coincided the new row would be vacuous),
    while both stay within one document of their budgets."""
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    Q, _ = load_all()
    ws = {r.doc_id for r in Q["sample_token_budget"](spark, SF).collect()}
    bp = {r.doc_id for r in Q["sample_token_budget_bpe"](spark, SF).collect()}
    assert ws != bp
    assert len(ws ^ bp) >= 5  # a real unit change, not a boundary doc


def test_bpe_counts_exceed_word_counts(spark):
    """BPE tokens (sub-word) exceed word counts on multi-word prose —
    the direction of the systematic mispricing. >= is the invariant
    (every word is at least one token; a word fully merged by chained
    compositional rounds prices exactly 1); strictly-greater must hold
    for the bulk of the corpus or the unit fix would be vacuous."""
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    Q, _ = load_all()
    rows = Q["text_bpe_token_count"](spark, SF).collect()
    multi = [r for r in rows if (r.n_ws_tokens or 0) > 1]
    assert multi
    assert all(r.n_bpe_tokens >= r.n_ws_tokens for r in multi)
    strict = sum(1 for r in multi if r.n_bpe_tokens > r.n_ws_tokens)
    assert strict >= len(multi) // 2
    # and the merges actually compress: fewer BPE tokens than raw chars
    from flink_realtime_data_warehouse_spark.operators.bpe import _words
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    chars = {
        r.doc_id: r.nc
        for r in docs.select(
            "doc_id",
            F.length(F.array_join(_words(F.col("text")), "")).alias("nc"),
        ).collect()
    }
    assert any(r.n_bpe_tokens < chars[r.doc_id] for r in rows)


def test_compositional_beats_oneshot_strictly(spark):
    """The r10 verdict's acceptance pin: under the SAME K and corpus,
    compositional training prices the corpus in STRICTLY fewer tokens
    than the one-shot table (multi-round units exist — at least one
    merge pair contains an earlier round's substitution symbol), and
    the gap is large (64,248 vs 88,146 on the fixture when pinned —
    ~27% fewer; assert a conservative 10% so corpus regen can move
    the numbers without breaking the point)."""
    from flink_realtime_data_warehouse_spark.operators.bpe import (
        train_bpe_merges_oneshot,
    )
    from flink_realtime_data_warehouse_spark.sources.tables import load_table

    docs = load_table(spark, SF, "documents")
    m_comp = train_bpe_merges(docs)
    m_one = train_bpe_merges_oneshot(docs)
    assert any(
        any(ord(ch) >= BPE_SUB_BASE for ch in p) for p in m_comp
    ), "no merge references an earlier round's symbol — not compositional"
    tot = docs.select(
        F.sum(bpe_token_count(F.col("text"), m_comp)).alias("comp"),
        F.sum(bpe_token_count(F.col("text"), m_one)).alias("one"),
    ).first()
    assert tot["comp"] < tot["one"] * 0.9


def test_pack_units_diverge_on_the_corpus(spark):
    """The packing face of the unit fix: BPE-priced pack spans differ
    from whitespace-priced spans for a large share of documents (348
    of 500 on the fixture when this pin was written) — boundaries fall
    where the training tokenizer puts them, not where spaces do."""
    from flink_realtime_data_warehouse_spark.plans.loader import load_all

    Q, _ = load_all()
    ws = {
        r.doc_id: (r.pack_first, r.pack_last)
        for r in Q["pack_training_sequences"](spark, SF).collect()
    }
    bp = {
        r.doc_id: (r.pack_first, r.pack_last)
        for r in Q["pack_training_sequences_bpe"](spark, SF).collect()
    }
    diff = sum(1 for k in ws if k in bp and ws[k] != bp[k])
    assert diff >= len(ws) // 4
    # and the packing invariants hold in the BPE unit: offsets are
    # dense per bucket (next tok_start = prev tok_start + n_tokens)
    rows = sorted(
        Q["pack_training_sequences_bpe"](spark, SF).collect(),
        key=lambda r: (r.bucket, r.doc_id),
    )
    by_bucket = {}
    for r in rows:
        prev = by_bucket.get(r.bucket)
        if prev is not None:
            assert r.tok_start == prev
        by_bucket[r.bucket] = r.tok_start + r.n_tokens
