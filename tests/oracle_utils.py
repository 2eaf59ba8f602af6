"""DuckDB-oracle comparison harness.

Mirrors the driver's correctness gate: run the Spark query and the
oracle SQL on the same parquet tables, sort columns by name, compare
row multisets order-insensitively with numeric tolerance.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from flink_realtime_data_warehouse_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> tuple[list[str], list[tuple]]:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    rows = cur.fetchall()
    con.close()
    return cols, rows


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes values; we emit pre-rounded floats, so tiny
        # tolerance here only guards against representation noise
        return round(v, 6)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return str(v)
    if isinstance(v, (list, tuple, dict, set)):
        # The driver canonicalizes with pandas sort_values on ALL columns,
        # which raises "unhashable type" on container cells. Surface that
        # locally instead of silently tolerating it (fn_array_suite, r2).
        raise TypeError(
            f"container-typed cell {type(v).__name__} is not driver-hashable; "
            "serialize array/struct columns to strings (concat_ws / to_json) "
            "in both the Spark query and the DuckDB oracle"
        )
    return v


def _sorted_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda r: tuple((x is None, str(x)) for x in r))


def compare_query_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    ora_cols, ora_rows = run_oracle(oracle_sql, sf_dir)

    assert sorted(spark_cols) == sorted(ora_cols), (
        f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(ora_cols)}"
    )
    assert len(spark_rows) == len(ora_rows), (
        f"row count mismatch: spark={len(spark_rows)} oracle={len(ora_rows)}"
    )
    s_sorted = _sorted_rows(spark_cols, spark_rows)
    o_sorted = _sorted_rows(ora_cols, ora_rows)
    for i, (a, b) in enumerate(zip(s_sorted, o_sorted)):
        assert a == b, f"row {i} mismatch:\n spark : {a}\n oracle: {b}"
