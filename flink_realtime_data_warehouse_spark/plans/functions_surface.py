"""Scalar-function and aggregate surface beyond the reference's F1-F6.

The reference's function usage is thin (dates, JSON, string split —
SURVEY.md §2.6); a replacement engine needs the full warehouse
function surface. Each family gets an oracle-checked query exercising
it end-to-end on real tables; approximate sketches (HLL, t-digest)
are rows-only entries since no exact SQL equivalent exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.plans.registry import query
from flink_realtime_data_warehouse_spark.sources.tables import load_table


@query(
    "fn_string_suite",
    oracle="""
    SELECT c_custkey,
           upper(c_name)                       AS name_upper,
           lower(c_mktsegment)                 AS seg_lower,
           substr(c_name, 1, 8)                AS name_prefix,
           length(c_name)                      AS name_len,
           replace(c_name, '#', '-')           AS name_dashed,
           concat(c_mktsegment, ':', c_name)   AS seg_name,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           CASE WHEN contains(c_name, '1') THEN 1 ELSE 0 END AS has_one
    FROM customer ORDER BY c_custkey LIMIT 500
    """,
)
def fn_string_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function family (F5 and beyond): case, substring, pad, replace."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").cast("bigint").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
            F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("seg_name"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
            F.when(F.col("c_name").contains("1"), 1).otherwise(0).alias("has_one"),
        )
        .orderBy("c_custkey")
        .limit(500)
    )


@query(
    "fn_math_suite",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(abs(l_extendedprice - 50000), 2)      AS abs_dev,
           CAST(ceil(l_quantity / 7.0) AS BIGINT)      AS qty_ceil,
           CAST(floor(l_quantity / 7.0) AS BIGINT)     AS qty_floor,
           round(sqrt(l_extendedprice), 4)             AS price_sqrt,
           round(ln(l_extendedprice + 1), 4)           AS price_ln,
           round(power(1 + l_discount, 2), 6)          AS disc_sq,
           CAST(l_quantity AS BIGINT) % 5              AS qty_mod
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 2000
    """,
)
def fn_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math-function family: abs/ceil/floor/sqrt/ln/power/mod."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.abs(F.col("l_extendedprice") - 50000), 2).alias("abs_dev"),
            F.ceil(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_ceil"),
            F.floor(F.col("l_quantity") / 7.0).cast("bigint").alias("qty_floor"),
            F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
            F.round(F.pow(1 + F.col("l_discount"), 2), 6).alias("disc_sq"),
            (F.col("l_quantity").cast("bigint") % 5).alias("qty_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(2000)
    )


@query(
    "fn_conditional_suite",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING')      AS status_mapped,
           greatest(o_totalprice, 100000.0)                     AS price_floor100k,
           least(o_totalprice, 100000.0)                        AS price_cap100k,
           CASE o_orderpriority WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2 ELSE 9 END AS prio_rank
    FROM orders ORDER BY o_orderkey LIMIT 2000
    """,
)
def fn_conditional_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional family: nullif/coalesce/greatest/least/case (F6 and beyond)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
                "status_mapped"
            ),
            F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor100k"),
            F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_cap100k"),
            F.when(F.col("o_orderpriority") == "1-URGENT", 1)
            .when(F.col("o_orderpriority") == "2-HIGH", 2)
            .otherwise(9)
            .alias("prio_rank"),
        )
        .orderBy("o_orderkey")
        .limit(2000)
    )


@query(
    "fn_regex_suite",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '[0-9]+')                  AS first_number,
           regexp_replace(p_name, '[aeiou]', '_', 'g')       AS devoweled,
           CASE WHEN regexp_matches(p_name, '^[a-z]') THEN 1 ELSE 0 END AS starts_lower
    FROM part ORDER BY p_partkey LIMIT 1000
    """,
)
def fn_regex_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: extract/replace/match."""
    p = load_table(spark, sf_dir, "part")
    return (
        p.select(
            "p_partkey",
            F.regexp_extract("p_name", "[0-9]+", 0).alias("first_number"),
            F.regexp_replace("p_name", "[aeiou]", "_").alias("devoweled"),
            F.when(F.col("p_name").rlike("^[a-z]"), 1).otherwise(0).alias("starts_lower"),
        )
        .orderBy("p_partkey")
        .limit(1000)
    )


@query(
    "agg_stats_suite",
    oracle="""
    SELECT l_returnflag,
           round(stddev_samp(l_extendedprice), 4) AS price_stddev,
           round(var_samp(l_quantity), 4)         AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
           round(covar_samp(l_discount, l_tax), 8)     AS disc_tax_covar,
           round(min(l_extendedprice), 2)         AS min_price,
           round(max(l_extendedprice), 2)         AS max_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: stddev/variance/corr/covar."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 4).alias("price_stddev"),
            F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
            F.round(F.covar_samp("l_discount", "l_tax"), 8).alias("disc_tax_covar"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT o_orderpriority,
           round(quantile_cont(o_totalprice, 0.5), 4)  AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4)  AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark percentile ≡ DuckDB quantile_cont)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
            F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_pivot_event_types",
    oracle="""
    SELECT user_id,
           count(*) FILTER (event_type = 'view')     AS n_view,
           count(*) FILTER (event_type = 'click')    AS n_click,
           count(*) FILTER (event_type = 'purchase') AS n_purchase,
           count(*) FILTER (event_type = 'signup')   AS n_signup,
           count(*) FILTER (event_type = 'error')    AS n_error
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_pivot_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: long→wide event counts per user (Spark .pivot())."""
    ev = load_table(spark, sf_dir, "events")
    types = ["view", "click", "purchase", "signup", "error"]
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves null for absent combinations; oracle FILTER yields 0
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
    ).orderBy("user_id")


@query(
    "agg_array_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types_csv,
           CAST(min(event_id) AS BIGINT) AS first_event_id,
           count(*) AS n
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def agg_array_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array aggregation: collect_set → sorted CSV (hash-stable encoding)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("event_type"))).alias("types_csv"),
            F.min("event_id").cast("bigint").alias("first_event_id"),
            F.count("*").alias("n"),
        )
        .orderBy("user_id")
    )


@query(
    "sketch_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey)::BIGINT AS exact_parts,
           count(DISTINCT l_suppkey)::BIGINT AS exact_supps,
           true AS parts_ok, true AS supps_ok, true AS p50_ok
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def sketch_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate sketches (HLL++ distinct, quantile-summary p50) made
    driver-hashable (VERDICT r2 item 3): the estimates run alongside
    their exact counterparts in the SAME aggregation and the output is
    the exact counts plus deterministic bounded-error verdicts —
    |approx − exact| ≤ 8% for HLL (rsd 0.05) and ≤ 10% of the exact
    median for the quantile sketch. Both sketches are deterministic
    merges, so the all-true oracle hash-matches iff the bounds hold.
    Raw estimates remain pinned in tests/test_sketches.py.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.approx_count_distinct("l_partkey").alias("ap"),
        F.approx_count_distinct("l_suppkey").alias("asu"),
        F.percentile_approx("l_extendedprice", 0.5, 1000)
        .cast("double")
        .alias("ap50"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("ep50"),
    )
    ok = lambda approx, exact, tol: (  # noqa: E731
        F.abs(F.col(approx) - F.col(exact)) <= F.lit(tol) * F.col(exact)
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        "exact_supps",
        ok("ap", "exact_parts", 0.08).alias("parts_ok"),
        ok("asu", "exact_supps", 0.08).alias("supps_ok"),
        ok("ap50", "ep50", 0.10).alias("p50_ok"),
    ).orderBy("l_returnflag")


@query(
    "fn_array_suite",
    oracle="""
    SELECT doc_id,
           len(ws) AS n_words,
           array_to_string(list_sort(list_slice(ws, 1, 3)), '|') AS first3_sorted,
           list_contains(ws, 'the') AS has_the,
           ws[1] AS first_word,
           array_to_string(list_transform(list_slice(ws, 1, 2), x -> upper(x)), '|') AS first2_upper,
           len(list_filter(ws, x -> len(x) > 4)) AS n_long_words,
           list_sum(list_transform(ws, x -> len(x)))::BIGINT AS total_chars,
           len(list_distinct(ws)) AS n_unique
    FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
    ORDER BY doc_id
    """,
)
def fn_array_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order function surface: size/slice/sort/contains/
    element_at/transform/filter/aggregate/distinct, all JVM-side.

    The word array is materialized in a projection FIRST — inlining
    split() into each higher-order lambda makes Catalyst re-evaluate it
    per element (the round-1 O(words²) shingle bug)."""
    docs = load_table(spark, sf_dir, "documents")
    arr = docs.select("doc_id", F.split("text", " ").alias("ws"))
    return arr.select(
        "doc_id",
        F.size("ws").cast("bigint").alias("n_words"),
        F.concat_ws("|", F.sort_array(F.slice("ws", 1, 3))).alias("first3_sorted"),
        F.array_contains("ws", "the").alias("has_the"),
        F.element_at("ws", 1).alias("first_word"),
        F.concat_ws(
            "|", F.transform(F.slice("ws", 1, 2), lambda x: F.upper(x))
        ).alias("first2_upper"),
        F.size(F.filter("ws", lambda x: F.length(x) > 4)).cast("bigint").alias("n_long_words"),
        F.aggregate(
            "ws", F.lit(0).cast("bigint"), lambda acc, x: acc + F.length(x)
        ).alias("total_chars"),
        F.size(F.array_distinct("ws")).cast("bigint").alias("n_unique"),
    ).orderBy("doc_id")


@query(
    "agg_unpivot_daily_metrics",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS dt, count(*) AS pv, count(DISTINCT user_id) AS uv
      FROM events GROUP BY 1)
    SELECT dt, metric, value
    FROM daily UNPIVOT (value FOR metric IN (pv, uv))
    ORDER BY dt, metric
    """,
)
def agg_unpivot_daily_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (wide → long): the inverse of agg_pivot_event_types —
    per-day metric columns melted to (dt, metric, value) rows."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("dt")).agg(
        F.count("*").alias("pv"), F.countDistinct("user_id").alias("uv")
    )
    return daily.unpivot("dt", ["pv", "uv"], "metric", "value").orderBy("dt", "metric")


@query(
    "agg_salted_event_counts",
    oracle="""
    SELECT event_type, count(*) AS count_event_id, round(sum(value), 2) AS r_sum
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_salted_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation (operators/scale.py) under the
    oracle: partial agg on (key, salt) then final merge on key must be
    byte-identical to a plain GROUP BY — the skew-defense path proven
    semantics-preserving. (sum over doubles stays exact here because
    addition reorders only across salt partials of the same key; the
    oracle rounds identically.)"""
    from flink_realtime_data_warehouse_spark.operators.scale import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev.select("event_type", "event_id", F.col("value").cast("decimal(18,6)").alias("value")),
        ["event_type"],
        {"event_id": "count", "value": "sum"},
        n_salts=8,
    )
    return out.select(
        "event_type",
        F.col("count_event_id"),
        F.round(F.col("sum_value"), 2).cast("double").alias("r_sum"),
    ).orderBy("event_type")


@query(
    "join_salted_skew",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted big-big equi-join (operators/scale.py::salted_join) under
    the oracle: the big side's rows spread across (key, salt) sub-keys,
    the other side replicated per salt — the manual hot-key defense for
    when AQE skew splitting doesn't apply — proven identical to the
    plain join. Salt values affect only row placement, never results,
    so the revenue-by-priority rollup hash-matches a plain join+GROUP
    BY. Decimal arithmetic both sides (float sums would drift with
    summation order)."""
    from flink_realtime_data_warehouse_spark.operators.scale import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    joined = salted_join(li, orders, "o_orderkey")
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "ids_stable_assign",
    oracle="""
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS stable_id
    FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id
    """,
)
def ids_stable_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global IDs (operators/scale.py::assign_stable_ids) under
    the oracle: the two-pass bucket/prefix-sum numbering must be
    byte-identical to ``row_number() OVER (ORDER BY doc_id)`` — the
    plan the ORACLE uses is exactly the plan a 100 TB job must NOT run
    (Exchange SinglePartition on the whole corpus), so the oracle row
    proves the distributed replacement exact. The plan-shape test pins
    that no SinglePartition exchange appears in this query's plan
    (tests/test_stable_ids.py)."""
    from flink_realtime_data_warehouse_spark.operators.scale import (
        assign_stable_ids,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    ids = assign_stable_ids(docs.select("doc_id"), "doc_id", n_buckets=64)
    return ids.select("doc_id", "stable_id").orderBy("doc_id")


@query(
    "ids_stable_assign_sampled",
    oracle="""
    SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS stable_id
    FROM documents WHERE doc_id IS NOT NULL ORDER BY doc_id
    """,
)
def ids_stable_assign_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The equi-depth variant of ``ids_stable_assign`` under the SAME
    oracle: boundaries come from a deterministic hash-sample instead of
    equal key-range widths, so a clustered/skewed key range still
    spreads evenly across window partitions (balance pinned in
    tests/test_stable_ids.py on a 99%-clustered range). Identical
    output by construction — both rows proving it against the same
    naive global row_number keeps boundary choice a pure performance
    knob, never a semantics fork."""
    from flink_realtime_data_warehouse_spark.operators.scale import (
        assign_stable_ids,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    ids = assign_stable_ids(
        docs.select("doc_id"), "doc_id", n_buckets=64, boundaries="sample"
    )
    return ids.select("doc_id", "stable_id").orderBy("doc_id")


@query(
    "ids_incremental_assign",
    oracle="""
    WITH hist AS (
      SELECT count(*) AS c FROM documents
      WHERE doc_id % 5 != 4 AND doc_id IS NOT NULL),
    inc AS (
      SELECT doc_id, row_number() OVER (ORDER BY doc_id) - 1 AS rn
      FROM documents WHERE doc_id % 5 = 4 AND doc_id IS NOT NULL)
    SELECT doc_id, CAST(rn + c AS BIGINT) AS stable_id
    FROM inc CROSS JOIN hist ORDER BY doc_id
    """,
)
def ids_incremental_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate-key continuation — the incremental face of
    ``ids_stable_assign``: a new batch (doc_id % 5 == 4) is numbered
    ``|history|, |history|+1, …`` after the already-ingested corpus,
    the warehouse auto-increment the reference delegates to MySQL
    (DimApp's dims carry DB-assigned ids) done engine-side: ONE count
    of the history (at scale, a metadata read of the id table's row
    count) plus the same bucket/prefix-sum numbering over only the
    batch. No global coordination, no single-reducer sort, and replays
    re-derive identical keys because the numbering is a pure function
    of (history count, batch keys)."""
    from flink_realtime_data_warehouse_spark.operators.scale import (
        assign_stable_ids,
    )

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
    )
    is_inc = F.pmod("doc_id", F.lit(5)) == 4
    offset = docs.filter(~is_inc).count()
    ids = assign_stable_ids(
        docs.filter(is_inc).select("doc_id"), "doc_id", n_buckets=64
    )
    return ids.select(
        "doc_id",
        (F.col("stable_id") + F.lit(offset)).cast("bigint").alias("stable_id"),
    ).orderBy("doc_id")


def _bucketed_table(spark: SparkSession, sf_dir: str, name: str, key: str,
                    cols: list[str], n_buckets: int = 16) -> str:
    """Session-catalog bucketed copy of a base table, stamped by
    (table, sf_dir, mtime) so different datasets never collide. Built
    at most once per session — the write-time shuffle is paid once and
    every subsequent equi-join/agg on the bucket key runs with no
    exchange (the lakehouse layout contract; at 100 TB this is the
    table's permanent layout, not a per-query step)."""
    import hashlib
    import os

    from flink_realtime_data_warehouse_spark.operators.scale import write_bucketed

    src = os.path.join(os.path.abspath(sf_dir), f"{name}.parquet")
    stamp = hashlib.md5(
        f"{src}:{os.path.getmtime(src)}".encode()
    ).hexdigest()[:8]
    tbl = f"bkt_{name}_{stamp}"
    if not spark.catalog.tableExists(tbl):
        # bucket metadata lives in the session catalog (in-memory here;
        # a real deployment's metastore persists it) — a fresh session
        # must rebuild, and the previous session's managed-table files
        # would otherwise collide with LOCATION_ALREADY_EXISTS
        import shutil

        from flink_realtime_data_warehouse_spark.operators.similarity import (
            _warehouse_root,
        )

        root = _warehouse_root(spark)
        stale = os.path.join(root, tbl)
        if os.path.isdir(stale):
            shutil.rmtree(stale, ignore_errors=True)
        # GC stamps from PREVIOUS sessions (same fix class as the ANN
        # stale-index GC, r2 ADVICE): a dead stamp is one with no entry
        # in this session's catalog — live stamps for other datasets in
        # the same session (e.g. the two parity scale factors) survive
        for d in os.listdir(root) if os.path.isdir(root) else []:
            if (
                d.startswith(f"bkt_{name}_")
                and d != tbl
                and not spark.catalog.tableExists(d)
            ):
                shutil.rmtree(os.path.join(root, d), ignore_errors=True)
        write_bucketed(
            load_table(spark, sf_dir, name).select(*cols),
            tbl,
            [key],
            n_buckets=n_buckets,
            sort_cols=[key],
        )
    return tbl


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_items,
           round(sum(CAST(l_extendedprice AS DECIMAL(18,6))
                     * (1 - CAST(l_discount AS DECIMAL(18,6)))), 2)::DOUBLE
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join (operators/scale.py::write_bucketed):
    both sides pre-bucketed+sorted on the join key, so the SortMergeJoin
    runs with NO exchange and NO sort (pinned in
    tests/test_profiling_plans.py) — the bucketing answer to the same
    rollup `join_salted_skew` solves with salting and the broadcast
    joins solve for small dims. Same oracle semantics as the plain
    join: layout is a performance contract, never a results contract.
    """
    li_tbl = _bucketed_table(
        spark, sf_dir, "lineitem", "l_orderkey",
        ["l_orderkey", "l_extendedprice", "l_discount"],
    )
    o_tbl = _bucketed_table(
        spark, sf_dir, "orders", "o_orderkey",
        ["o_orderkey", "o_orderpriority"],
    )
    li = spark.table(li_tbl).select(
        "l_orderkey",
        (
            F.col("l_extendedprice").cast("decimal(18,6)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
        ).alias("rev"),
    )
    orders = spark.table(o_tbl)
    joined = li.hint("merge").join(
        orders, li["l_orderkey"] == orders["o_orderkey"]
    )
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("rev"), 2).cast("double").alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )
