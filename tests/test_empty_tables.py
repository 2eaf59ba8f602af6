"""Every registered query must run (not crash) on zero-row tables —
at warehouse scale, empty slices (a day with no events, a tenant with
no documents, a cold-start corpus) are routine inputs, and an ANSI
divide-by-zero or a NumPy stack-of-nothing must not abort the job.

Found and fixed in round 3: ads_funnel_view_signup (DIVIDE_BY_ZERO on
zero viewers → try_divide) and the three ANN entry points (np.stack on
an empty query block → empty-result early exit).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod

#: every-query empty/null-injection sweep — deselected from the default (driver-window) profile;
#: runs in the recorded slow-tier pass (see pytest.ini)
pytestmark = pytest.mark.slowtier


_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory, sf_dir):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in _TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_survives_empty_tables(spark, empty_sf_dir):
    failures = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, empty_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
    assert not failures, failures


@pytest.fixture(scope="module")
def nully_sf_dir(tmp_path_factory, sf_dir):
    """10%-null nullable columns on the dirty-data-prone tables
    (documents/embeddings/events); keys and the constrained TPC-H
    tables stay solid — dirty rows there are the DQ suite's job."""
    d = tmp_path_factory.mktemp("nully_sf")
    duckdb.sql(
        f"""COPY (SELECT doc_id,
        CASE WHEN doc_id % 10 = 3 THEN NULL ELSE text END AS text,
        CASE WHEN doc_id % 10 = 4 THEN NULL ELSE lang END AS lang,
        CASE WHEN doc_id % 10 = 5 THEN NULL ELSE source END AS source,
        CASE WHEN doc_id % 10 = 3 THEN NULL ELSE n_chars END AS n_chars
        FROM '{sf_dir}/documents.parquet')
        TO '{d}/documents.parquet' (FORMAT PARQUET)"""
    )
    duckdb.sql(
        f"""COPY (SELECT vec_id,
        CASE WHEN vec_id % 10 = 3 THEN NULL ELSE embedding END AS embedding,
        CASE WHEN vec_id % 10 = 4 THEN NULL ELSE label END AS label
        FROM '{sf_dir}/embeddings.parquet')
        TO '{d}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    duckdb.sql(
        f"""COPY (SELECT event_id, ts,
        CASE WHEN event_id % 10 = 3 THEN NULL ELSE user_id END AS user_id,
        CASE WHEN event_id % 10 = 4 THEN NULL ELSE event_type END AS event_type,
        CASE WHEN event_id % 10 = 5 THEN NULL ELSE value END AS value,
        CASE WHEN event_id % 10 = 6 THEN NULL ELSE props END AS props
        FROM '{sf_dir}/events.parquet')
        TO '{d}/events.parquet' (FORMAT PARQUET)"""
    )
    for t in _TABLES[:7]:
        duckdb.sql(
            f"COPY (SELECT * FROM '{sf_dir}/{t}.parquet') "
            f"TO '{d}/{t}.parquet' (FORMAT PARQUET)"
        )
    return str(d)


def test_every_query_survives_null_injection(spark, nully_sf_dir):
    """NULL text/embedding/value rows must never crash a kernel (found
    the NumPy stack-of-None crash in all embedding kernels, r3)."""
    failures = {}
    for name, fn in sorted(entrymod.queries().items()):
        try:
            fn(spark, nully_sf_dir).collect()
        except Exception as exc:  # noqa: BLE001 — collecting the sweep
            failures[name] = f"{type(exc).__name__}: {str(exc).splitlines()[0][:120]}"
    assert not failures, failures


#: the round-4 review found NULL-semantics parity divergences the
#: crash-only sweep cannot see (NULL digests read as row absence,
#: NULL-ordering flips in cumulative windows, least/greatest NULL
#: collapse, string_agg-vs-concat_ws on all-NULL groups). This tier
#: hash-checks the affected queries AGAINST THEIR ORACLES on the
#: null-injected tables, so the class stays closed.
_NULL_PARITY_QUERIES = [
    "dq_snapshot_diff",
    "events_winsorized_stats",
    "ts_similarity_pairs",
    "export_user_event_sequences",
    "export_streaming_parity",
    "sample_quality_quota",
    "sample_token_budget",
    "search_hybrid_rrf",
    "dq_drift_report",
    "dq_lang_confusion",
    "text_collocation_lift",
    "split_temporal_embargo",
    "dedup_span_rewrite",
    "dq_source_overlap",
    # round 5: NULL text must vanish identically from blocking AND
    # signature on both engines (filter + encode/hex agreement)
    "multimodal_perceptual_dups",
    "multimodal_perceptual_dups_capped",
    # round 5: NULL text must produce no frames on either engine, and
    # the surviving docs' frame arithmetic must agree byte-for-byte
    "multimodal_frame_digests",
    # round 5: NULL embeddings filtered; NULL vec_id % 13 excludes the
    # row from BOTH sides on both engines (NULL comparison semantics)
    "decontam_semantic_overlap",
    # round 6: NULL lang is a window partition of its own on BOTH
    # engines — the broadcast cutoff join is null-safe so the NULL
    # class takes the same shortlist path as every other class
    "sample_hash_reservoir",
    # round 6: NULL text filtered identically ahead of the MG kernel /
    # the shingle explode on both engines
    "text_heavy_hitters",
    "dedup_ngram_jaccard_dfcap",
    "dedup_minhash_lsh_pairs_dfcap",
    # round 6: NULL lang is a real group — per-group MG guard must
    # enumerate it from the error relation (null-safe full outer)
    "text_heavy_hitters_by_lang",
    # round 7: grouped variants — NULL source/lang are REAL groups:
    # window-partition totals (drift) and eqNullSafe joins (colloc)
    # must keep them where plain equi-joins would drop them
    "dq_drift_report_by_source",
    "text_collocation_lift_by_lang",
    # round 7: the capped incremental gate under injected NULLs
    "dedup_incremental_lsh_dfcap",
    # round 7: the real-BMP codec row — NULL text filtered identically
    # ahead of the encode→decode kernel on both engines
    "multimodal_bmp_channel_stats",
    # round 7: the streaming gate composition — NULL-text docs group
    # under the NULL digest in the per-batch election (one 'new' copy)
    # and produce no shingles/bands, identically on both engines
    "histdedup_gate_streaming_parity",
    "lake_takedown_audit",
    "dedup_incremental_lsh_dfcap_compacted",
    "ann_ivf_streaming_ingest_checked",
    # round 8 (late): NULL doc_id rows are excluded from numbering /
    # sharding on BOTH engines; NULL text reads definitively-new
    # through the Bloom probe and is excluded from the verdict counts
    "ids_stable_assign",
    "export_shuffled_shards",
    "dedup_bloom_gate_checked",
    # round 8 (late): NULL-text docs route through the Bloom-prefiltered
    # streaming ingest exactly like the plain path — NULL digests read
    # definitively-new at the probe and elect per batch downstream
    "histdedup_bloom_streaming_parity",
    # round 8 (late): NULL text/lang/source must survive the CSV/ORC
    # landing round trip distinct from '' (quoteAll + sentinel)
    "source_csv_roundtrip",
    "source_orc_roundtrip",
    # round 8 (late): NULL text filtered identically ahead of the
    # bigram explode / LM joins on both engines
    "text_bigram_logprob",
    # round 8 (late): NULL-text train docs carry no bands/shingles on
    # either engine and surface as matched_eval = -1; NULL doc_id rows
    # are excluded from incremental numbering on both engines
    "decontam_neardup_overlap",
    "ids_incremental_assign",
    # round 9: NULL text must propagate NULL through the deterministic
    # PII planting (concat null-propagation), match no pattern, and
    # yield NULL redacted text + NULL char counters on both engines
    "dq_pii_scan",
    "text_pii_redact",
    # round 9: NULL-text docs elect per batch through the scrubbed
    # ingest (NULL digest) and stay NULL through the redaction
    "lake_pii_scrubbed_ingest",
    # round 9: NULL-ts events are filtered ahead of the rollup store on
    # both engines; the retention cutoff derives from surviving days
    "rollup_retention_audit",
    # round 10: NULL text prices NULL BPE tokens (never 0) and is
    # excluded from both training pair counts and the budget selection
    # identically on both engines
    "text_bpe_token_count",
    "sample_token_budget_bpe",
    "pack_training_sequences_bpe",
    # round 10: NULL text filtered identically ahead of the PNG
    # encode->decode kernel on both engines (the BMP row's discipline)
    "multimodal_png_channel_stats",
    # round 11: same discipline ahead of the JPEG round-trip kernel
    "multimodal_jpeg_roundtrip_dims",
]


@pytest.mark.parametrize("name", _NULL_PARITY_QUERIES)
def test_null_injected_parity(spark, nully_sf_dir, name):
    from tests.oracle_utils import compare_query_to_oracle

    df = entrymod.queries()[name](spark, nully_sf_dir)
    compare_query_to_oracle(df, entrymod.oracle_sql()[name], nully_sf_dir)
