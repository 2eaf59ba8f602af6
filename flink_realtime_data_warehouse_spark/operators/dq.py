"""Data-quality constraint validation — the batch generalization of the
reference's dirty-data side-output (BaseLogApp.java:46-58 tags rows that
fail JSON parsing into a "Dirty" OutputTag; BaseDbApp applies the same
guard to the CDC stream). Where the reference validates one record at a
time in-stream, a warehouse also needs *table-level* contracts checked
in bulk: primary-key uniqueness, null rates, value ranges, cross-column
ordering, referential integrity.

Scale design (100 TB):

- All single-table checks for one table fold into ONE conditional
  aggregation — a map-side partial agg per partition and a single
  1-row reduce; no shuffle of data rows, only of per-partition
  counters. Adding a check adds a column, not a pass.
- PK uniqueness piggybacks on the same pass via
  ``count(*) - count(distinct pk)`` (the distinct is the only
  key-shuffled term, and it shuffles 8-byte keys, never rows).
- Referential integrity is a LEFT ANTI join counted — keyed shuffle
  on the FK (or broadcast when the parent fits), never a cartesian.
- Output is a tiny verdict table (one row per check), so the driver
  materializes O(checks), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table

_DQ_ORACLE = """
    WITH o AS (
      SELECT
        count(*) AS n_rows,
        count(*) - count(DISTINCT o_orderkey) AS pk_dup,
        count(*) FILTER (WHERE o_custkey IS NULL) AS null_cust,
        count(*) FILTER (WHERE o_totalprice <= 0) AS bad_price
      FROM orders
    ), l AS (
      SELECT
        count(*) AS n_rows,
        count(*) FILTER (WHERE l_quantity < 1 OR l_quantity > 50) AS bad_qty,
        count(*) FILTER (WHERE l_extendedprice <= 0) AS bad_price,
        count(*) FILTER (WHERE l_discount < 0 OR l_discount > 1) AS bad_disc,
        count(*) FILTER (WHERE l_discount > 0.05) AS warn_disc
      FROM lineitem
    ), ri_o AS (
      SELECT count(*) AS orphans FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer)
    ), ri_l AS (
      SELECT count(*) AS orphans FROM lineitem
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
    )
    SELECT check_name, table_name, violations, checked_rows,
           violations = 0 AS passed
    FROM (
      SELECT 'pk_unique' AS check_name, 'orders' AS table_name,
             pk_dup AS violations, n_rows AS checked_rows FROM o
      UNION ALL
      SELECT 'fk_not_null', 'orders', null_cust, n_rows FROM o
      UNION ALL
      SELECT 'totalprice_positive', 'orders', bad_price, n_rows FROM o
      UNION ALL
      SELECT 'quantity_in_range', 'lineitem', bad_qty, n_rows FROM l
      UNION ALL
      SELECT 'extendedprice_positive', 'lineitem', bad_price, n_rows FROM l
      UNION ALL
      SELECT 'discount_in_range', 'lineitem', bad_disc, n_rows FROM l
      UNION ALL
      SELECT 'discount_above_5pct_warn', 'lineitem', warn_disc, n_rows FROM l
      UNION ALL
      SELECT 'ri_orders_customer', 'orders', ri_o.orphans,
             (SELECT n_rows FROM o) FROM ri_o
      UNION ALL
      SELECT 'ri_lineitem_orders', 'lineitem', ri_l.orphans,
             (SELECT n_rows FROM l) FROM ri_l
    )
    ORDER BY check_name
"""


def _cnt(cond) -> F.Column:
    return F.sum(F.when(cond, F.lit(1)).otherwise(F.lit(0))).cast("bigint")


def _verdicts(agg_row: DataFrame, checks: list[tuple[str, str, str]]) -> DataFrame:
    """Unpivot a 1-row aggregate into (check_name, table_name, violations,
    checked_rows) verdict rows — stack() keeps it a single projection."""
    stack_args: list[F.Column] = []
    for check_name, table_name, col in checks:
        stack_args += [F.lit(check_name), F.lit(table_name), F.col(col)]
    return agg_row.select(
        F.stack(F.lit(len(checks)), *stack_args).alias(
            "check_name", "table_name", "violations"
        ),
        F.col("n_rows").alias("checked_rows"),
    )


@query("dq_validation_suite", oracle=_DQ_ORACLE)
def dq_validation_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style contract suite over orders + lineitem: PK uniqueness,
    null/range/cross-column checks (one conditional-agg pass per table)
    plus two referential-integrity checks (counted LEFT ANTI joins).

    Output: one verdict row per check — (check_name, table_name,
    violations, checked_rows, passed).
    """
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    customer = load_table(spark, sf_dir, "customer")

    o_agg = orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("o_orderkey")))
        .cast("bigint")
        .alias("pk_dup"),
        _cnt(F.col("o_custkey").isNull()).alias("null_cust"),
        _cnt(F.col("o_totalprice") <= 0).alias("bad_price"),
    )
    l_agg = lineitem.agg(
        F.count(F.lit(1)).alias("n_rows"),
        _cnt((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).alias(
            "bad_qty"
        ),
        _cnt(F.col("l_extendedprice") <= 0).alias("bad_price"),
        _cnt((F.col("l_discount") < 0) | (F.col("l_discount") > 1)).alias(
            "bad_disc"
        ),
        _cnt(F.col("l_discount") > 0.05).alias("warn_disc"),
    )

    o_checks = _verdicts(
        o_agg,
        [
            ("pk_unique", "orders", "pk_dup"),
            ("fk_not_null", "orders", "null_cust"),
            ("totalprice_positive", "orders", "bad_price"),
        ],
    )
    l_checks = _verdicts(
        l_agg,
        [
            ("quantity_in_range", "lineitem", "bad_qty"),
            ("extendedprice_positive", "lineitem", "bad_price"),
            ("discount_in_range", "lineitem", "bad_disc"),
            ("discount_above_5pct_warn", "lineitem", "warn_disc"),
        ],
    )

    # Referential integrity: anti-join on the key, count survivors.
    # Shuffles only the key columns; Catalyst/AQE picks broadcast when
    # the parent side is small enough.
    ri_orders = (
        orders.filter(F.col("o_custkey").isNotNull())
        .select("o_custkey")
        .join(
            customer.select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("ri_orders_customer").alias("check_name"),
            F.lit("orders").alias("table_name"),
            F.col("violations"),
        )
        .crossJoin(F.broadcast(o_agg.select(F.col("n_rows").alias("checked_rows"))))
    )
    ri_lineitem = (
        lineitem.select("l_orderkey")
        .join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(
            F.lit("ri_lineitem_orders").alias("check_name"),
            F.lit("lineitem").alias("table_name"),
            F.col("violations"),
        )
        .crossJoin(F.broadcast(l_agg.select(F.col("n_rows").alias("checked_rows"))))
    )

    return (
        o_checks.unionByName(l_checks)
        .unionByName(ri_orders)
        .unionByName(ri_lineitem)
        .withColumn("passed", F.col("violations") == 0)
        .orderBy("check_name")
    )


# ---------------------------------------------------------------------------
# distribution-drift monitor (new crawl vs ingested history)
# ---------------------------------------------------------------------------

DRIFT_MOD = 5  #: doc_id % 5 == 4 plays the incoming crawl (as in dedup)
DRIFT_WORD_BIN = 10  #: doc-length histogram bin width (words)
DRIFT_CHAR_BIN = 20  #: char-count histogram bin width
DRIFT_MAX_BIN = 20  #: bins clamp at this index (open-ended tail bin)
DRIFT_GATE_BP = 3000  #: total-variation distance (basis points) alarm; small-slice sampling noise on the fixture measures <=1500

_DRIFT_ORACLE = f"""
WITH feat AS (
  SELECT (doc_id % {DRIFT_MOD}) = {DRIFT_MOD - 1} AS incoming,
         least(len(string_split(text, ' ')) // {DRIFT_WORD_BIN}, {DRIFT_MAX_BIN})
           AS words_bin,
         least(n_chars // {DRIFT_CHAR_BIN}, {DRIFT_MAX_BIN}) AS chars_bin
  FROM documents),
long AS (
  SELECT incoming, 'n_words' AS feature, words_bin AS bin FROM feat
  UNION ALL
  SELECT incoming, 'n_chars' AS feature, chars_bin AS bin FROM feat),
counts AS (
  SELECT feature, bin,
         count(CASE WHEN NOT incoming THEN 1 END) AS h_cnt,
         count(CASE WHEN incoming THEN 1 END) AS i_cnt
  FROM long GROUP BY feature, bin),
totals AS (
  SELECT feature,
         CAST(sum(h_cnt) AS BIGINT) AS n_hist,
         CAST(sum(i_cnt) AS BIGINT) AS n_inc
  FROM counts GROUP BY feature),
tvd AS (
  SELECT c.feature,
         CAST(sum(abs((c.h_cnt * 10000) // greatest(t.n_hist, 1)
                      - (c.i_cnt * 10000) // greatest(t.n_inc, 1))) // 2 AS BIGINT) AS tvd_bp
  FROM counts c JOIN totals t USING (feature)
  GROUP BY c.feature)
SELECT t.feature, tt.n_hist, tt.n_inc, t.tvd_bp,
       t.tvd_bp >= {DRIFT_GATE_BP} AS drifted
FROM tvd t JOIN totals tt USING (feature)
ORDER BY feature
"""


@query("dq_drift_report", oracle=_DRIFT_ORACLE)
def dq_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: total-variation distance between the
    incoming crawl's and the ingested history's feature histograms
    (doc length in words; char counts), with a basis-point alarm gate.

    The check a continuous ingest runs before accepting a new crawl
    drop: a spiked TVD on cheap features means the source changed
    (new boilerplate, truncation bug, language shift) before any
    expensive curation spends compute on it.

    Scale shape: features and bins are map-only projections; both
    slices aggregate in ONE conditional-count pass over (feature, bin)
    — the corpus is scanned once, shuffles only the tiny histogram.
    All ratios are integer basis points (exact on every engine).

    Degenerate slices FAIL CLOSED: an empty incoming (or history)
    slice divides by ``greatest(n, 1)``, so its fractions read as all
    zero and the TVD lands near 5000 bp — well above the gate — and
    ``drifted`` fires instead of silently reporting NULL (a monitoring
    query must alarm on a day with no data, not go quiet).
    """
    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        (F.pmod("doc_id", F.lit(DRIFT_MOD)) == DRIFT_MOD - 1).alias("incoming"),
        F.least(
            F.floor(F.size(F.split("text", " ")) / DRIFT_WORD_BIN),
            F.lit(DRIFT_MAX_BIN),
        ).alias("words_bin"),
        F.least(
            F.floor(F.col("n_chars") / DRIFT_CHAR_BIN), F.lit(DRIFT_MAX_BIN)
        ).alias("chars_bin"),
    )
    long = feat.selectExpr(
        "incoming",
        "stack(2, 'n_words', words_bin, 'n_chars', chars_bin) AS (feature, bin)",
    )
    counts = long.groupBy("feature", "bin").agg(
        F.count(F.when(~F.col("incoming"), 1)).alias("h_cnt"),
        F.count(F.when(F.col("incoming"), 1)).alias("i_cnt"),
    )
    totals = counts.groupBy("feature").agg(
        F.sum("h_cnt").alias("n_hist"), F.sum("i_cnt").alias("n_inc")
    )
    tvd = (
        counts.join(F.broadcast(totals), "feature")
        .groupBy("feature")
        .agg(
            F.expr(
                "sum(abs((h_cnt * 10000) div greatest(n_hist, 1)"
                " - (i_cnt * 10000) div greatest(n_inc, 1))) div 2"
            ).alias("tvd_bp")
        )
    )
    return (
        tvd.join(F.broadcast(totals), "feature")
        .select(
            "feature",
            "n_hist",
            "n_inc",
            "tvd_bp",
            (F.col("tvd_bp") >= DRIFT_GATE_BP).alias("drifted"),
        )
        .orderBy("feature")
    )


_DRIFT_BY_SOURCE_ORACLE = f"""
WITH feat AS (
  SELECT source,
         (doc_id % {DRIFT_MOD}) = {DRIFT_MOD - 1} AS incoming,
         least(len(string_split(text, ' ')) // {DRIFT_WORD_BIN}, {DRIFT_MAX_BIN})
           AS words_bin,
         least(n_chars // {DRIFT_CHAR_BIN}, {DRIFT_MAX_BIN}) AS chars_bin
  FROM documents),
long AS (
  SELECT source, incoming, 'n_words' AS feature, words_bin AS bin FROM feat
  UNION ALL
  SELECT source, incoming, 'n_chars' AS feature, chars_bin AS bin FROM feat),
counts AS (
  SELECT source, feature, bin,
         count(CASE WHEN NOT incoming THEN 1 END) AS h_cnt,
         count(CASE WHEN incoming THEN 1 END) AS i_cnt
  FROM long GROUP BY source, feature, bin),
winged AS (
  SELECT source, feature, bin, h_cnt, i_cnt,
         sum(h_cnt) OVER (PARTITION BY source, feature) AS n_hist,
         sum(i_cnt) OVER (PARTITION BY source, feature) AS n_inc
  FROM counts)
SELECT source, feature,
       CAST(max(n_hist) AS BIGINT) AS n_hist,
       CAST(max(n_inc) AS BIGINT) AS n_inc,
       CAST(sum(abs((h_cnt * 10000) // greatest(n_hist, 1)
                    - (i_cnt * 10000) // greatest(n_inc, 1))) // 2 AS BIGINT)
         AS tvd_bp,
       (sum(abs((h_cnt * 10000) // greatest(n_hist, 1)
                - (i_cnt * 10000) // greatest(n_inc, 1))) // 2)
         >= {DRIFT_GATE_BP} AS drifted
FROM winged GROUP BY source, feature
ORDER BY source, feature
"""


@query("dq_drift_report_by_source", oracle=_DRIFT_BY_SOURCE_ORACLE)
def dq_drift_report_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dq_drift_report`` PER SOURCE — the data-card form (a crawl's
    drift is a property of the source that drifted, not of the blended
    corpus: one source's truncation bug dilutes to nothing corpus-wide
    but screams in its own histogram; VERDICT r6 item 4).

    Grouped-guard discipline learned from the heavy-hitters audit:

    - NULL source is a REAL group (rows with no source metadata drift
      too). The global form's broadcast joins on ``feature`` are
      replaced by window totals over (source, feature) — a window
      PARTITION groups NULLs together on both engines, where an
      equi-join on the source key would silently drop the NULL group;
    - per-group fail-closed fallback: a source whose incoming (or
      history) slice is empty divides by ``greatest(n, 1)``, lands
      near 5000 bp, and alarms — per source, exactly as the global
      form does corpus-wide.

    Scale shape unchanged: one corpus scan into a (source, feature,
    bin) conditional-count aggregation — the shuffled relation is
    |sources| x 2 x 21 histogram rows, and the window runs over that
    histogram, never the corpus.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    feat = docs.select(
        "source",
        (F.pmod("doc_id", F.lit(DRIFT_MOD)) == DRIFT_MOD - 1).alias("incoming"),
        F.least(
            F.floor(F.size(F.split("text", " ")) / DRIFT_WORD_BIN),
            F.lit(DRIFT_MAX_BIN),
        ).alias("words_bin"),
        F.least(
            F.floor(F.col("n_chars") / DRIFT_CHAR_BIN), F.lit(DRIFT_MAX_BIN)
        ).alias("chars_bin"),
    )
    long = feat.selectExpr(
        "source",
        "incoming",
        "stack(2, 'n_words', words_bin, 'n_chars', chars_bin) AS (feature, bin)",
    )
    counts = long.groupBy("source", "feature", "bin").agg(
        F.count(F.when(~F.col("incoming"), 1)).alias("h_cnt"),
        F.count(F.when(F.col("incoming"), 1)).alias("i_cnt"),
    )
    w = Window.partitionBy("source", "feature")
    winged = counts.select(
        "source",
        "feature",
        "h_cnt",
        "i_cnt",
        F.sum("h_cnt").over(w).alias("n_hist"),
        F.sum("i_cnt").over(w).alias("n_inc"),
    )
    tvd_expr = (
        "sum(abs((h_cnt * 10000) div greatest(n_hist, 1)"
        " - (i_cnt * 10000) div greatest(n_inc, 1))) div 2"
    )
    return (
        winged.groupBy("source", "feature")
        .agg(
            F.max("n_hist").alias("n_hist"),
            F.max("n_inc").alias("n_inc"),
            F.expr(tvd_expr).alias("tvd_bp"),
            (F.expr(tvd_expr) >= DRIFT_GATE_BP).alias("drifted"),
        )
        .orderBy("source", "feature")
    )


# ---------------------------------------------------------------------------
# cross-source overlap matrix (data-card metric)
# ---------------------------------------------------------------------------

_SOURCE_OVERLAP_ORACLE = """
WITH w AS (SELECT source, string_split(text, ' ') AS ws FROM documents),
pos AS (
  SELECT DISTINCT source,
         ('0x' || substr(md5(ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]), 1, 15))::BIGINT AS s
  FROM w, UNNEST(CASE WHEN len(ws) >= 3 THEN range(1, len(ws) - 1) ELSE [] END) AS t(i)),
tot AS (SELECT source, count(*) AS n FROM pos GROUP BY source),
pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
  FROM pos a JOIN pos b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2)
SELECT src_a, src_b,
       CAST(n_shared AS BIGINT) AS n_shared,
       CAST((n_shared * 10000) // least(ta.n, tb.n) AS BIGINT) AS ov_bp
FROM pairs
JOIN tot ta ON ta.source = src_a
JOIN tot tb ON tb.source = src_b
ORDER BY src_a, src_b
"""


@query("dq_source_overlap", oracle=_SOURCE_OVERLAP_ORACLE)
def dq_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise content overlap between corpus sources: for every source
    pair, how many distinct 3-gram shingles they share, and that count
    as basis points of the smaller source's shingle vocabulary.

    A mixture designer reads this before assigning sampling weights —
    two "different" crawls with 40% shingle overlap are not independent
    evidence, and a high-overlap pair flags a mirrored/re-hosted source
    (the cross-source form of the per-document containment check).

    Design for 100 TB: shingles reduce to 8-byte hashes in the map
    stage; ONE hash-keyed aggregation per shingle collects the (small,
    <= |sources|) distinct source set, pairs explode from that bounded
    array map-side, and the pair counts aggregate into |sources|^2/2
    rows — never a row-level self-join, never |docs|^2. Per-source
    totals ride the same aggregated relation (explode of the source
    set), so the shingle relation shuffles exactly once.
    """
    from flink_realtime_data_warehouse_spark.operators.dedup import (
        _exploded_shingle_hashes,
    )

    docs = load_table(spark, sf_dir, "documents")
    # one shuffle: per-shingle distinct source set (bounded by |sources|);
    # the shingle construction + 60-bit hash reduction is dedup's shared
    # helper, so this matrix can never drift from the per-document
    # containment check it cross-source-izes
    from flink_realtime_data_warehouse_spark.fanout import fanout

    # fanout ×2 (r11 opt): the fixture's single-row-group scan pinned
    # the explode+md5 map work to ONE task, and AQE's byte-based
    # coalescing folded the collect_set reduce side to 1-2 tasks (the
    # (source, s) rows are few bytes but the agg is CPU-heavy). The
    # numbered repartitions are AQE-exempt and sized from the core
    # count; groupBy("s") reuses the second exchange's clustering, so
    # no extra shuffle appears.
    srcsets = (
        fanout(_exploded_shingle_hashes(fanout(docs, "doc_id"), key="source"), "s")
        .groupBy("s")
        .agg(F.array_sort(F.collect_set("source")).alias("srcs"))
    )
    # r11 opt: totals and pairs used to be two separate consumers of
    # `srcsets`, so the explode + shingle aggregation subtree executed
    # TWICE (Spark does not share unmaterialized subtrees). One explode
    # now emits singleton structs (src_b NULL → per-source totals) and
    # unordered-pair structs from the same tiny sorted array, one
    # aggregation folds both, and the |sources|²-bounded result is
    # localCheckpoint'd so the three downstream consumers (pairs + the
    # two broadcast total sides) read the materialized rows instead of
    # re-running the shingle pass.
    combined_expr = (
        "concat("
        "transform(srcs, x -> struct(x AS src_a, CAST(NULL AS STRING) AS src_b)), "
        "CASE WHEN size(srcs) >= 2 THEN "
        "flatten(transform(sequence(0, size(srcs) - 2), i -> "
        "transform(sequence(i + 1, size(srcs) - 1), j -> struct(srcs[i] AS src_a, srcs[j] AS src_b)))) "
        "ELSE CAST(array() AS array<struct<src_a:string,src_b:string>>) END)"
    )
    counts = (
        srcsets.select(F.explode(F.expr(combined_expr)).alias("p"))
        .select(F.col("p.src_a").alias("src_a"), F.col("p.src_b").alias("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    tot = counts.filter(F.col("src_b").isNull()).select(
        F.col("src_a").alias("source"), F.col("n")
    )
    pairs = counts.filter(F.col("src_b").isNotNull()).select(
        "src_a", "src_b", F.col("n").alias("n_shared")
    )
    ta = tot.withColumnRenamed("source", "src_a").withColumnRenamed("n", "na")
    tb = tot.withColumnRenamed("source", "src_b").withColumnRenamed("n", "nb")
    return (
        pairs.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.expr("(n_shared * 10000) div least(na, nb)")
            .cast("bigint")
            .alias("ov_bp"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# declared-vs-predicted language confusion matrix
# ---------------------------------------------------------------------------

#: the same marker profiles as functions.text.PROFILES, but evaluated
#: as pure SQL (shared verbatim between Spark and the DuckDB oracle) so
#: the classifier is oracle-checkable in-plan — the Arrow UDF in
#: functions/text.py remains the streaming-side form of the same model
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": (" the ", " and ", " of ", " to ", " is ", " in ", "ing ", " that "),
    "fr": (" le ", " la ", " les ", " et ", " de ", " est ", " une ", " que "),
    "de": (" der ", " die ", " das ", " und ", " ist ", " nicht ", "sch", " ein "),
    "es": (" el ", " la ", " los ", " y ", " de ", " es ", " una ", " que "),
    "zh": ("的", "是", "了", "在", "我", "不", "人", "有"),
}


def _lang_pred_sql(div: str) -> tuple[str, str]:
    """(score-columns SQL, predicted-language CASE SQL) over a padded
    column ``p``.

    Marker occurrences = chars-removed-by-replace // marker-length;
    the CASE walks profiles in the fixed registration order, so ties
    resolve to the earlier language exactly like the Python UDF's
    first-strictly-greater loop."""

    def count(m: str) -> str:
        esc = m.replace("'", "''")
        return f"((length(p) - length(replace(p, '{esc}', ''))) {div} {len(m)})"

    scores = {
        lang: " + ".join(count(m) for m in markers)
        for lang, markers in _LANG_PROFILES.items()
    }
    score_cols = ", ".join(f"({v}) AS s_{k}" for k, v in scores.items())
    langs = list(_LANG_PROFILES)
    whens = []
    for lang in langs:
        others = ", ".join(f"s_{o}" for o in langs if o != lang)
        whens.append(
            f"WHEN s_{lang} > 0 AND s_{lang} >= greatest({others}) THEN '{lang}'"
        )
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return score_cols, case


_LP_SCORES, _LP_CASE = _lang_pred_sql("//")
_LP_SCORES_SPARK, _LP_CASE_SPARK = _lang_pred_sql("div")

_LANG_CONFUSION_ORACLE = f"""
WITH p AS (SELECT doc_id, lang, ' ' || lower(text) || ' ' AS p FROM documents),
s AS (SELECT doc_id, lang, {_LP_SCORES} FROM p),
pred AS (SELECT lang AS declared, {_LP_CASE} AS predicted FROM s)
SELECT declared, predicted, count(*) AS n_docs,
       (declared IS NOT DISTINCT FROM predicted) AS agree
FROM pred GROUP BY declared, predicted ORDER BY declared, predicted
"""


@query("dq_lang_confusion", oracle=_LANG_CONFUSION_ORACLE)
def dq_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-label audit: declared ``lang`` column vs the n-gram
    marker classifier's prediction, as a confusion matrix — the check
    a curation pipeline runs to find mislabeled-language partitions
    before per-language mixture weights are trusted.

    The classifier here is the SAME marker model as the streaming-side
    Arrow UDF (``functions/text.py::lang_id``) but expressed as pure
    SQL string expressions — 40 replace/length terms, all map-only
    whole-stage codegen, zero Python in the plan — so the whole audit
    is one scan plus a tiny (|langs|², ≤ 36-row) aggregation and is
    bit-identical on any engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    p = docs.select(
        "lang", F.expr("' ' || lower(text) || ' '").alias("p")
    )
    s = p.select("lang", F.expr(f"struct({_LP_SCORES_SPARK})").alias("sc")).select(
        "lang", F.col("sc.*")
    )
    pred = s.select(
        F.col("lang").alias("declared"), F.expr(_LP_CASE_SPARK).alias("predicted")
    )
    return (
        pred.groupBy("declared", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(
            "declared",
            "predicted",
            "n_docs",
            # null-safe: an unlabeled (NULL-declared) doc never "agrees"
            F.col("declared").eqNullSafe(F.col("predicted")).alias("agree"),
        )
        .orderBy("declared", "predicted")
    )


# ---------------------------------------------------------------------------
# corpus snapshot diff (incremental-export bookkeeping)
# ---------------------------------------------------------------------------

SNAP_MOD = 7  #: doc_id % 7 carves the two overlapping snapshot slices

_SNAPSHOT_DIFF_ORACLE = f"""
WITH old AS (
  SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % {SNAP_MOD} <> {SNAP_MOD - 1}),
new AS (
  SELECT doc_id, md5(upper(substr(text, 1, 1)) || substr(text, 2)) AS h
  FROM documents WHERE doc_id % {SNAP_MOD} <> 0),
diff AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN o.h <> n.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
SELECT status, count(*) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS first_doc, CAST(max(doc_id) AS BIGINT) AS last_doc
FROM diff GROUP BY status ORDER BY status
"""


@query("dq_snapshot_diff", oracle=_SNAPSHOT_DIFF_ORACLE)
def dq_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff: added / removed / changed / unchanged
    document counts between two snapshots, keyed by doc_id with a
    content digest detecting in-place edits — the bookkeeping report an
    incremental training-export runs to size the delta before deciding
    between a delta push and a full re-export. (Fixture: two
    overlapping doc_id slices; "today's" copy also re-cases the first
    character so a deterministic subset reads as changed.)

    Scale shape: each snapshot reduces to (doc_id, 16-byte digest)
    map-side; ONE doc_id-keyed full-outer join; the verdict is a
    map-only CASE and the output a 4-row aggregation. With both
    snapshots bucketed by doc_id on disk (operators/scale.py) the join
    plans shuffle-free.
    """
    docs = load_table(spark, sf_dir, "documents")
    # presence is carried by EXPLICIT flags, never inferred from digest
    # NULL-ness: a present row with NULL text has a NULL digest, and
    # conflating that with row absence misclassifies it (and diverges
    # from the oracle, whose CASE tests doc_id NULL-ness)
    old = docs.filter(F.col("doc_id") % SNAP_MOD != SNAP_MOD - 1).select(
        "doc_id", F.md5("text").alias("h_old"), F.lit(True).alias("in_old")
    )
    new = docs.filter(F.col("doc_id") % SNAP_MOD != 0).select(
        "doc_id",
        F.md5(
            F.concat(F.upper(F.substring("text", 1, 1)), F.expr("substr(text, 2)"))
        ).alias("h_new"),
        F.lit(True).alias("in_new"),
    )
    diff = old.join(new, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("in_old").isNull(), "added")
        .when(F.col("in_new").isNull(), "removed")
        .when(F.col("h_old") != F.col("h_new"), "changed")
        .otherwise("unchanged")
        .alias("status"),
    )
    return (
        diff.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("status")
    )
