"""Every registered query must hash-match its DuckDB oracle (driver contract)."""

import pytest

import flink_realtime_data_warehouse_spark.plans.cep_queries  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.functions_surface  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.ads  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.profiling  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.analytics  # noqa: F401 — registers queries
import flink_realtime_data_warehouse_spark.plans.streaming_parity  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.tpch_extra  # noqa: F401
import flink_realtime_data_warehouse_spark.plans.windows  # noqa: F401
from flink_realtime_data_warehouse_spark.plans.registry import ORACLES, QUERIES
from tests.oracle_utils import compare_query_to_oracle


def _oracle_names():
    # import all registering modules before reading the registry
    import flink_realtime_data_warehouse_spark.operators.curation  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.dedup  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.dq  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.similarity  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.textops  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.multimodal  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.sampling  # noqa: F401
    import flink_realtime_data_warehouse_spark.operators.visitors  # noqa: F401

    return sorted(ORACLES)


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_query_to_oracle(df, ORACLES[name], sf_dir)
