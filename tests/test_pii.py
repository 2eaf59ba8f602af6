"""PII detection/redaction (round 9): the scrub really removes every
span, is idempotent, and the scan's counters agree with the redaction's
audit trail."""

import re

import pytest

from flink_realtime_data_warehouse_spark.operators.pii import (
    EMAIL_RE,
    IPV4_RE,
    PHONE_RE,
    dq_pii_scan,
    text_pii_redact,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def redacted(spark):
    return text_pii_redact(spark, SF).collect()


def test_no_pii_survives_redaction(redacted):
    pats = [re.compile(p) for p in (EMAIL_RE, IPV4_RE, PHONE_RE)]
    for r in redacted:
        if r.redacted is None:
            continue
        for p in pats:
            assert not p.search(r.redacted), (r.doc_id, p.pattern)


def test_planted_spans_redacted_with_audit_counts(redacted):
    hit = 0
    for r in redacted:
        if r.redacted is None:
            continue
        if r.doc_id % 7 == 0:
            assert "<EMAIL>" in r.redacted and r.email_chars > 0
            hit += 1
        if r.doc_id % 11 == 0:
            assert "<IP>" in r.redacted and r.ip_chars > 0
        if r.doc_id % 13 == 0:
            assert "<PHONE>" in r.redacted and r.phone_chars > 0
        if r.doc_id % 7 and r.doc_id % 11 and r.doc_id % 13:
            # nothing planted, nothing organic in the synthetic corpus
            assert r.email_chars == 0 and r.ip_chars == 0 and r.phone_chars == 0
    assert hit > 0  # the fixture is non-vacuous


def test_redaction_idempotent(redacted):
    """Placeholders contain no '@' and no digits, so a second pass is
    a no-op — re-running the scrub job must never mangle clean text."""
    pats = [(re.compile(EMAIL_RE), "<EMAIL>"), (re.compile(IPV4_RE), "<IP>"),
            (re.compile(PHONE_RE), "<PHONE>")]
    for r in redacted:
        if r.redacted is None:
            continue
        again = r.redacted
        for p, repl in pats:
            again = p.sub(repl, again)
        assert again == r.redacted


def test_scan_counts_match_redaction_audit(spark, redacted):
    scan = dq_pii_scan(spark, SF).collect()
    assert sum(r["n_email_docs"] for r in scan) == sum(
        1 for r in redacted if r.email_chars and r.email_chars > 0
    )
    assert sum(r["n_ip_docs"] for r in scan) == sum(
        1 for r in redacted if r.ip_chars and r.ip_chars > 0
    )
    assert sum(r["n_phone_docs"] for r in scan) == sum(
        1 for r in redacted if r.phone_chars and r.phone_chars > 0
    )
    assert sum(r["n_docs"] for r in scan) == len(redacted)


def test_streaming_scrub_blocks_raw_recrawl(spark, tmp_path):
    """redact_pii=True scrubs the STORED payload but classifies on the
    ORIGINAL bytes: the lake never holds the raw document, yet a
    re-crawl of exactly those raw bytes still classifies dup_history —
    the digest was computed pre-redaction."""
    import json as _json
    import os

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )

    root = str(tmp_path)
    raw = "please reach admin@corp.example.com or 555-123-4567 at 10.1.0.2"

    def _run(src_name, ckpt, rows):
        src = os.path.join(root, src_name)
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, "b.jsonl"), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows) + "\n")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        start_history_dedup_ingest(
            spark,
            stream,
            os.path.join(root, "out"),
            os.path.join(root, ckpt),
            redact_pii=True,
        ).awaitTermination(300)

    _run("s0", "ckpt0", [{"doc_id": 1, "text": raw},
                         {"doc_id": 2, "text": "no pii here at all"}])
    clean = {
        r.doc_id: r.text
        for r in spark.read.parquet(os.path.join(root, "out", "clean")).collect()
    }
    assert clean[1] == "please reach <EMAIL> or <PHONE> at <IP>"
    assert clean[2] == "no pii here at all"
    # the raw bytes never landed anywhere in the lake
    for rel in ("clean",):
        blob = ""
        store = os.path.join(root, "out", rel)
        for dirpath, _d, files in os.walk(store):
            for fn in files:
                if fn.endswith(".parquet"):
                    with open(os.path.join(dirpath, fn), "rb") as f:
                        blob += f.read().decode("latin-1")
        assert "admin@corp.example.com" not in blob

    # re-crawl of the RAW document under a fresh checkpoint: blocked
    _run("s1", "ckpt1", [{"doc_id": 100, "text": raw}])
    dups = {
        r.doc_id: r.status
        for r in spark.read.parquet(os.path.join(root, "out", "dups")).collect()
    }
    assert dups[100] == "dup_history"
    assert 100 not in {
        r.doc_id
        for r in spark.read.parquet(os.path.join(root, "out", "clean")).collect()
    }


def test_scrubbed_lake_unblock_policy(spark, tmp_path):
    """redact_pii=True composed with takedown(block_reingest=False)
    (ADVICE r9): the clean store holds REDACTED payloads, so the
    unblock pass must derive purged-content hashes from the persisted
    pre-redaction ``content_hash`` column, not md5(text) — without it
    the digest anti-join can never match and ``removed['digests']`` is
    silently always 0. Pins: (a) purging the only copy of scrubbed
    content with block_reingest=False removes its digest and a
    re-crawl of the RAW bytes re-ingests as new; (b) content with a
    surviving duplicate keeps its digest blocked."""
    import json as _json
    import os

    from flink_realtime_data_warehouse_spark.streaming.jobs import (
        start_history_dedup_ingest,
    )
    from flink_realtime_data_warehouse_spark.streaming.retention import (
        takedown_documents,
    )

    root = str(tmp_path)
    out = os.path.join(root, "out")
    raw_a = "mail admin@corp.example.com from 10.1.0.2 please"
    raw_b = "call 555-123-4567 twice"

    def _run(src_name, ckpt, rows):
        src = os.path.join(root, src_name)
        os.makedirs(src, exist_ok=True)
        with open(os.path.join(src, "b.jsonl"), "w") as f:
            f.write("\n".join(_json.dumps(r) for r in rows) + "\n")
        stream = (
            spark.readStream.schema("doc_id bigint, text string")
            .option("maxFilesPerTrigger", 1)
            .json(src)
        )
        start_history_dedup_ingest(
            spark, stream, out, os.path.join(root, ckpt), redact_pii=True
        ).awaitTermination(300)

    # doc 1: sole copy of raw_a; docs 2+3: two copies of raw_b (the
    # election lands doc 2 in clean, doc 3 in dups as evidence)
    _run("s0", "ckpt0", [{"doc_id": 1, "text": raw_a},
                         {"doc_id": 2, "text": raw_b},
                         {"doc_id": 3, "text": raw_b}])

    # purge doc 1 (clean, only copy of raw_a → its digest unblocks) and
    # doc 3 (dups-only evidence; raw_b's CLEAN copy doc 2 survives, so
    # raw_b's digest must stay blocked)
    removed = takedown_documents(spark, out, [1, 3], block_reingest=False)
    # the regression this pins: with md5(redacted text) the match is
    # empty and this reads 0
    assert removed["digests"] == 1

    # re-crawl the RAW bytes under a fresh checkpoint: raw_a content is
    # unblocked (digest removed) → lands in clean, redacted; raw_b is
    # still held by doc 3 → stays blocked as dup_history
    _run("s1", "ckpt1", [{"doc_id": 100, "text": raw_a},
                         {"doc_id": 101, "text": raw_b}])
    clean_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(out, "clean")).collect()
    }
    dup_status = {
        r.doc_id: r.status
        for r in spark.read.parquet(os.path.join(out, "dups")).collect()
    }
    assert 100 in clean_ids
    assert dup_status[101] == "dup_history"
    assert 101 not in clean_ids
