"""Benchmark-decontamination operator: planted overlap + scale-shape pins."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.decontam import (
    DECONTAM_N,
    decontaminate,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id bigint, text string"
    )


def test_planted_contamination_verdicts(spark):
    eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon zeta")])
    train = _docs(
        spark,
        [
            # shares the 5-gram "beta gamma delta epsilon zeta" with eval
            (1, "intro beta gamma delta epsilon zeta outro words here"),
            # same vocabulary, no shared 5-gram
            (2, "alpha beta gamma wrong delta epsilon zeta beta alpha"),
            # too short to carry any 5-gram: trivially clean, still emitted
            (3, "tiny doc"),
            # NULL text: trivially clean, still emitted
            (4, None),
        ],
    )
    out = {
        r["doc_id"]: r for r in decontaminate(train, eval_docs).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] == 1 and out[1]["n_hits"] >= 1
    assert out[2]["contaminated"] == 0 and out[2]["n_grams"] > 0
    for short in (3, 4):
        assert out[short]["contaminated"] == 0
        assert out[short]["n_grams"] == 0 and out[short]["overlap_frac"] == 0.0


def test_fully_duplicated_doc_has_full_overlap(spark):
    text = " ".join(f"w{i}" for i in range(DECONTAM_N + 3))
    eval_docs = _docs(spark, [(100, text)])
    train = _docs(spark, [(1, text)])
    row = decontaminate(train, eval_docs).collect()[0]
    assert row["n_hits"] == row["n_grams"] == 4
    assert row["overlap_frac"] == 1.0 and row["contaminated"] == 1


def test_eval_side_is_broadcast(spark):
    """The corpus must never shuffle against the benchmark set."""
    eval_docs = _docs(spark, [(100, "alpha beta gamma delta epsilon")])
    train = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
    plan = decontaminate(train, eval_docs)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_decontam_matches_bruteforce_on_random_docs(spark):
    """Randomized cross-check: verdicts equal a pure-Python 5-gram
    overlap computation on arbitrary corpora."""
    import random

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]

    def rand_doc():
        return " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 25)))

    eval_rows = [(100 + i, rand_doc()) for i in range(5)]
    train_rows = [(i, rand_doc()) for i in range(30)]

    def grams(t):
        ws = t.split(" ")
        return {" ".join(ws[i : i + 5]) for i in range(len(ws) - 4)}

    eval_grams = set().union(*(grams(t) for _, t in eval_rows))
    expect = {
        i: (len(grams(t)), len(grams(t) & eval_grams)) for i, t in train_rows
    }

    out = {
        r["doc_id"]: r
        for r in decontaminate(
            _docs(spark, train_rows), _docs(spark, eval_rows)
        ).collect()
    }
    assert set(out) == set(expect)
    for i, (n_grams, n_hits) in expect.items():
        assert (out[i]["n_grams"], out[i]["n_hits"]) == (n_grams, n_hits), i
        assert out[i]["contaminated"] == (1 if n_hits else 0)


def test_semantic_decontam_dirty_rows_parity(spark, tmp_path, sf_dir):
    """Wrong-dim and zero-norm embedding rows are definitionally not
    similarity candidates (round-5 review): a ragged row crashed the
    Arrow/NumPy stack, and an all-zero EVAL vector produced a NaN block
    row whose 'NaN is the largest double' comparison semantics flagged
    the ENTIRE corpus as contaminated. Both engines must now exclude
    them identically."""
    import duckdb

    import __spark_entry__ as entrymod
    from tests.oracle_utils import compare_query_to_oracle

    d = tmp_path / "dirty_sf"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        duckdb.sql(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    rows = [
        (i, [float((i * 7 + j) % 5 + 1) for j in range(64)], i % 3)
        for i in range(26)  # 0, 13 land on the eval side (vec_id % 13)
    ]
    rows.append((26, None, 0))  # NULL embedding, eval side
    rows.append((27, [1.0, 2.0, 3.0], 0))  # wrong-dim, train side
    rows.append((39, [0.0] * 64, 0))  # zero-norm, eval side (NaN poison)
    # zero-norm TRAIN side too (40 % 13 == 1): without the guard this
    # row would appear in the output with a NaN max_cos — the eval-side
    # plant alone cannot catch a dropped guard, because eval rows are
    # never emitted in the first place
    rows.append((40, [0.0] * 64, 0))
    staging = str(tmp_path / "emb_staging")
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(staging)
    # repack to the single-file layout the oracle views expect
    duckdb.sql(
        f"COPY (SELECT * FROM '{staging}/*.parquet' ORDER BY vec_id) "
        f"TO '{d}/embeddings.parquet' (FORMAT PARQUET)"
    )

    name = "decontam_semantic_overlap"
    df = entrymod.queries()[name](spark, str(d))
    got = {r.vec_id for r in df.collect()}
    # train-side dirty rows excluded (39 is eval-side — never emitted
    # regardless; 27/40 would appear, crash, or NaN without the guard)
    assert 27 not in got and 40 not in got and 39 not in got
    assert 1 in got  # clean train rows still scored
    compare_query_to_oracle(df, entrymod.oracle_sql()[name], str(d))
