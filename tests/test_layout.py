"""Data-layout clustering: parquet-footer-verified min/max file skipping.

Asserts against the ACTUAL footers (pyarrow), not the plan — this is
exactly what any engine's file-skipping sees on these layouts. Layout
geometry is checked on a deterministic uniform grid (crisp bounds);
content preservation is checked on the real events table.
"""

import pytest
from pyspark.sql import functions as F

from flink_realtime_data_warehouse_spark.operators.scale import (
    file_minmax,
    files_hit,
    write_range_clustered,
    write_zordered,
)
from flink_realtime_data_warehouse_spark.sources.tables import load_table

N_FILES = 16
N_ROWS = 64 * 1024
DOM = 256  #: x and y live in [0, DOM)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layouts")
    # deterministic pseudo-uniform 2D points (Knuth multiplicative hash)
    df = spark.range(N_ROWS).select(
        F.col("id"),
        (F.col("id") % DOM).cast("int").alias("x"),
        ((F.col("id") * 2654435761) % 4294967296 % DOM).cast("int").alias("y"),
    )
    paths = {
        "shuffled": str(base / "shuffled"),
        "linear_x": str(base / "linear_x"),
        "zorder": str(base / "zorder"),
    }
    df.repartition(N_FILES).write.mode("overwrite").parquet(paths["shuffled"])
    write_range_clustered(df, paths["linear_x"], ["x"], N_FILES)
    write_zordered(df, paths["zorder"], "x", "y", N_FILES)
    return spark, df, paths


def _stats(paths, name):
    return file_minmax(paths[name], ["x", "y"])


def test_layouts_preserve_content(layouts):
    spark, df, paths = layouts
    expect = sorted(map(tuple, df.collect()))
    for p in paths.values():
        assert sorted(map(tuple, spark.read.parquet(p).collect())) == expect


def test_shuffled_layout_cannot_skip(layouts):
    _, _, paths = layouts
    st = _stats(paths, "shuffled")
    assert files_hit(st, "x", 0, DOM // 8) == N_FILES
    assert files_hit(st, "y", 0, DOM // 8) == N_FILES


def test_linear_clustering_prunes_leading_column_only(layouts):
    _, _, paths = layouts
    st = _stats(paths, "linear_x")
    # non-overlapping x ranges: a 1/8 slice lands in a handful of the 16
    # files (range-partition boundaries are sample-based, so the exact
    # count wobbles ±1 with session history)
    assert files_hit(st, "x", DOM // 2, DOM // 2 + DOM // 8) <= 5
    # y is uncorrelated: essentially no pruning
    assert files_hit(st, "y", 0, DOM // 8) >= N_FILES - 2


def test_zorder_prunes_both_dimensions(layouts):
    _, _, paths = layouts
    st = _stats(paths, "zorder")
    # 16 z-range files over a uniform grid ≈ a 4×4 rectangle tiling:
    # a 1/8-wide slice on EITHER dimension intersects ~one row/column
    # of rectangles — far below all 16, on both axes at once
    assert files_hit(st, "x", 0, DOM // 8) <= N_FILES // 2
    assert files_hit(st, "y", 0, DOM // 8) <= N_FILES // 2


def test_events_roundtrip_through_clustered_layouts(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    p = str(tmp_path / "ev_zorder")
    write_zordered(ev, p, "user_id", "value", n_files=8)
    got = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert got == sorted(map(tuple, ev.collect()))


def test_zorder_empty_input_roundtrips(spark, tmp_path):
    df = spark.range(0).selectExpr("id", "cast(id as int) x", "cast(id as int) y")
    p = str(tmp_path / "empty_z")
    write_zordered(df, p, "x", "y", n_files=4)
    assert spark.read.parquet(p).count() == 0
    # footer helper tolerates whatever files an empty write produced
    for entry in file_minmax(p, ["x", "y"]):
        assert "file" in entry
