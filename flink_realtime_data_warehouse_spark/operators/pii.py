"""PII detection and redaction over the document corpus.

A training-data pipeline must scrub personal data (emails, IP
addresses, phone numbers) before the corpus feeds a model — both as a
compliance control (the static sibling of streaming/retention.py's
right-to-erasure) and because memorized PII is a model-quality defect.
The reference warehouse has no document surface at all; this family is
part of the LLM-pipeline layer built on the same engine.

Design — map-only regex, engine-exact:

- Detection (``dq_pii_scan``) is one ``rlike`` per pattern inside a
  conditional aggregate: a single corpus scan, whole-stage codegen, no
  Python. Redaction (``text_pii_redact``) is chained
  ``regexp_replace`` — also map-only codegen. At 100 TB both are
  embarrassingly parallel scans; the scan's (source, counters) output
  is map-side combinable.
- The patterns use only the regex subset with IDENTICAL semantics in
  Java (Spark) and RE2 (DuckDB): ASCII ``\\d``/``\\b``, literal
  classes, bounded quantifiers — no lookaround, no backreferences —
  so the DuckDB oracle states the exact same automaton.
- The synthetic corpus contains no organic PII, so both sides plant it
  DETERMINISTICALLY first (an email for doc_id % 7 == 0, an IPv4 for
  % 11 == 0, a phone for % 13 == 0, composed from doc_id arithmetic).
  The fixture construction is stated verbatim in the oracle SQL: the
  comparison is non-vacuous at every SF (~31% of docs carry a planted
  span; 157 at sf0.01), exercises docs carrying multiple PII kinds (% 77
  etc.), and NULL text propagates NULL through the augmentation on
  both engines — the null-injected tier drives that corner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

#: Java-&-RE2-identical patterns (ASCII \d, ASCII \b, no lookaround)
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b(\\d{1,3}\\.){3}\\d{1,3}\\b"
PHONE_RE = "\\b\\d{3}-\\d{3}-\\d{4}\\b"

def redact_text(col: F.Column) -> F.Column:
    """The redaction expression — email, then IPv4, then phone spans
    replaced by typed placeholders (fixed order: an email local part
    may contain digits a later pattern would half-match). Shared by
    the ``text_pii_redact`` query and the streaming ingest's
    ``redact_pii`` flag (streaming/jobs.py) so batch and stream scrub
    byte-identically. NULL propagates to NULL. Placeholders contain no
    ``@`` and no digits, so the expression is idempotent."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )


#: the identical redaction as SQL (DuckDB) over a text expression
def redact_sql(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace(regexp_replace({expr}, "
        f"'{EMAIL_RE}', '<EMAIL>', 'g'), "
        f"'{IPV4_RE}', '<IP>', 'g'), "
        f"'{PHONE_RE}', '<PHONE>', 'g')"
    )


#: deterministic PII planting — the Spark side
def _planted(docs: DataFrame) -> DataFrame:
    did = F.col("doc_id")
    text = F.col("text")
    text = F.when(
        did % 7 == 0,
        F.concat(
            text,
            F.lit(" contact user"),
            did.cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(text)
    text = F.when(
        did % 11 == 0,
        F.concat(
            text,
            F.lit(" from 10."),
            (did % 256).cast("string"),
            F.lit(".0."),
            (did % 250).cast("string"),
            F.lit(" logged"),
        ),
    ).otherwise(text)
    text = F.when(
        did % 13 == 0,
        F.concat(
            text,
            F.lit(" call 555-"),
            (did % 900 + 100).cast("string"),
            F.lit("-"),
            (did % 9000 + 1000).cast("string"),
            F.lit(" today"),
        ),
    ).otherwise(text)
    return docs.withColumn("text", text)


#: the identical planting as SQL (DuckDB), shared by both oracles
_PLANT_SQL = """
SELECT doc_id, source,
       CASE WHEN doc_id % 13 = 0 THEN t2 ||
            ' call 555-' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-' ||
            CAST(doc_id % 9000 + 1000 AS VARCHAR) || ' today'
            ELSE t2 END AS text
FROM (
  SELECT doc_id, source,
         CASE WHEN doc_id % 11 = 0 THEN t1 ||
              ' from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' ||
              CAST(doc_id % 250 AS VARCHAR) || ' logged'
              ELSE t1 END AS t2
  FROM (
    SELECT doc_id, source,
           CASE WHEN doc_id % 7 = 0 THEN text ||
                ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                ELSE text END AS t1
    FROM documents))
"""

_SCAN_ORACLE = f"""
WITH planted AS ({_PLANT_SQL})
SELECT source,
       CAST(count(*) AS BIGINT)                                   AS n_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '{EMAIL_RE}')
                THEN 1 ELSE 0 END) AS BIGINT)                     AS n_email_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '{IPV4_RE}')
                THEN 1 ELSE 0 END) AS BIGINT)                     AS n_ip_docs,
       CAST(sum(CASE WHEN regexp_matches(text, '{PHONE_RE}')
                THEN 1 ELSE 0 END) AS BIGINT)                     AS n_phone_docs
FROM planted
GROUP BY source
ORDER BY source
"""


@query("dq_pii_scan", oracle=_SCAN_ORACLE)
def dq_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII exposure report: how many documents carry an
    email / IPv4 / phone span — the audit a compliance team runs
    before a corpus ships. One conditional-aggregate scan (the dq.py
    validation-suite shape); NULL source stays a real group; NULL text
    matches nothing on either engine."""
    docs = _planted(load_table(spark, sf_dir, "documents"))

    def _flag(pat: str) -> F.Column:
        return F.when(F.col("text").rlike(pat), 1).otherwise(0)

    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(_flag(EMAIL_RE)).cast("bigint").alias("n_email_docs"),
            F.sum(_flag(IPV4_RE)).cast("bigint").alias("n_ip_docs"),
            F.sum(_flag(PHONE_RE)).cast("bigint").alias("n_phone_docs"),
        )
        .orderBy("source")
    )


_REDACT_ORACLE = f"""
WITH planted AS ({_PLANT_SQL})
SELECT doc_id,
       {redact_sql('text')}                                       AS redacted,
       CAST((length(text) - length(regexp_replace(text,
            '{EMAIL_RE}', '', 'g'))) AS BIGINT)                   AS email_chars,
       CAST((length(text) - length(regexp_replace(text,
            '{IPV4_RE}', '', 'g'))) AS BIGINT)                    AS ip_chars,
       CAST((length(text) - length(regexp_replace(text,
            '{PHONE_RE}', '', 'g'))) AS BIGINT)                   AS phone_chars
FROM planted
ORDER BY doc_id
"""


@query("text_pii_redact", oracle=_REDACT_ORACLE)
def text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redacted corpus rewrite: every email / IPv4 / phone span is
    replaced by a typed placeholder, in a fixed pattern order (email
    first — its local part may contain digits a later pattern would
    half-match). The per-kind redacted-character counters are the
    audit trail a scrub job logs; computing them as length deltas
    keeps the whole row map-only. NULL text stays NULL."""
    docs = _planted(load_table(spark, sf_dir, "documents"))
    text = F.col("text")

    def _chars(pat: str) -> F.Column:
        return (
            F.length(text) - F.length(F.regexp_replace(text, pat, ""))
        ).cast("bigint")

    return docs.select(
        "doc_id",
        redact_text(text).alias("redacted"),
        _chars(EMAIL_RE).alias("email_chars"),
        _chars(IPV4_RE).alias("ip_chars"),
        _chars(PHONE_RE).alias("phone_chars"),
    ).orderBy("doc_id")
