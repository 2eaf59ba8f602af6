"""Property: banded_global_rank ≡ row_number over the global order on
ADVERSARIAL distributions — heavy ties (every row one band), all rows
in one band, values straddling band boundaries, negatives, huge
spreads. The equivalence proof in the docstring is only as good as the
band-boundary arithmetic; these pin it with data the fixtures never
produce."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_realtime_data_warehouse_spark.operators.timeseries import (
    banded_global_rank,
)

CASES = {
    "all_tied": [(i, 42) for i in range(300)],
    "two_values": [(i, i % 2) for i in range(200)],
    "dense_sequential": [(i, i) for i in range(500)],
    "negatives_and_positives": [(i, (i * 37) % 101 - 50) for i in range(400)],
    "huge_spread": [(i, (i % 7) * 10**14 - 3 * 10**14) for i in range(150)],
    "boundary_straddle": [(i, i // 3) for i in range(3 * 64)],
    "single_row": [(0, -9)],
    "duplicate_keys_distinct_tiebreak": [(i, 5) for i in range(100)]
    + [(100 + i, 6) for i in range(100)],
}


@pytest.mark.parametrize("case", sorted(CASES))
def test_banded_rank_equals_global_window(spark, case):
    df = spark.createDataFrame(CASES[case], "uid bigint, total bigint")
    w = Window.orderBy("total", "uid")
    naive = {
        (r.uid, r.rn)
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    # small n_bands forces multi-row bands; default exercises sparse ones
    for n_bands in (4, 1024):
        banded = {
            (r.uid, r.rn)
            for r in banded_global_rank(
                df, "total", "uid", n_bands=n_bands
            ).collect()
        }
        assert banded == naive, (case, n_bands)


def test_banded_rank_empty_frame(spark):
    df = spark.createDataFrame([], "uid bigint, total bigint")
    out = banded_global_rank(df, "total", "uid")
    assert out.count() == 0
    assert "rn" in out.columns
