"""text_bigram_logprob: the oracle row pins the arithmetic; this pins
the SIGNAL — templated/repeated text must score familiar (low mean
NLL) and unique gibberish unfamiliar (high mean NLL), which is the
property a perplexity filter actually cuts on."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def lm_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("lm_sf")
    rows = []
    for i in range(20):
        rows.append((i, "the quick brown fox jumps over the lazy dog"))
    rows.append((100, "zxq wvut plonk fizzle gribble snark"))
    rows.append((101, "martek ovilu quasp rendle bifom chast"))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
        "source VARCHAR, n_chars BIGINT)"
    )
    for doc_id, text in rows:
        con.execute(
            "INSERT INTO t VALUES (?, ?, 'en', 'src0', ?)",
            [doc_id, text, len(text)],
        )
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    return str(d)


def test_templated_text_scores_familiar(spark, lm_sf_dir):
    rows = {
        r["doc_id"]: r["avg_nll_e6"]
        for r in entrymod.queries()["text_bigram_logprob"](
            spark, lm_sf_dir
        ).collect()
    }
    template_avg = max(rows[i] for i in range(20))
    gibberish_avg = min(rows[100], rows[101])
    assert gibberish_avg > template_avg * 2, (template_avg, gibberish_avg)


def test_short_docs_have_zero_bigrams(spark, lm_sf_dir):
    # single-word and empty docs must emit 0/0/0, not crash or NULL
    import duckdb as ddb

    con = ddb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM '{lm_sf_dir}/documents.parquet'"
    )
    con.execute("INSERT INTO t VALUES (200, 'single', 'en', 'src0', 6)")
    con.execute(f"COPY t TO '{lm_sf_dir}/documents.parquet' (FORMAT PARQUET)")
    rows = {
        r["doc_id"]: (r["n_bigrams"], r["total_nll_e6"], r["avg_nll_e6"])
        for r in entrymod.queries()["text_bigram_logprob"](
            spark, lm_sf_dir
        ).collect()
    }
    assert rows[200] == (0, 0, 0)
