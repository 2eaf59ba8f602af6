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
