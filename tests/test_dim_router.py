"""DIM layer: config-driven routing (J1/T5/ST5), upsert store (K3/K4),
dynamic DDL, and the end-to-end DimApp streaming topology."""

import json
import os

from flink_realtime_data_warehouse_spark.operators.parse import parse_with_dirty
from flink_realtime_data_warehouse_spark.schemas import (
    TABLE_PROCESS_SCHEMA,
    TOPIC_DB_SCHEMA,
)
from flink_realtime_data_warehouse_spark.sources.streams import (
    read_jsonl_stream,
    static_jsonl,
)
from flink_realtime_data_warehouse_spark.streaming.router import (
    route_changelog_batch,
    start_dim_app,
)
from flink_realtime_data_warehouse_spark.streaming.sinks import DimStore


def _cdc(table, type_, data):
    return json.dumps({"database": "gmall", "table": table, "type": type_, "data": data})


CONFIG_ROWS = [
    # includes a substring pair (name / tm_name) to pin the exact-match
    # projection fix (reference bug TableProcessFunction.java:133-140)
    ("base_trademark", "dim_base_trademark", "id,tm_name", "id", None),
    ("user_info", "dim_user_info", "id,name,birthday", "id", None),
    ("base_category1", "dim_base_category1", "id,name", None, None),  # null pk → default "id"
]


def _config_df(spark):
    return spark.createDataFrame(CONFIG_ROWS, TABLE_PROCESS_SCHEMA)


def test_dim_store_upsert_merge(spark, tmp_path):
    store = DimStore(spark, str(tmp_path / "dim"))
    df1 = spark.createDataFrame([("1", "apple"), ("2", "banana")], ["id", "tm_name"])
    store.upsert("dim_base_trademark", df1)  # K4: creates table
    df2 = spark.createDataFrame([("2", "blueberry"), ("3", "cherry")], ["id", "tm_name"])
    store.upsert("dim_base_trademark", df2)  # K3: update + insert
    got = {r["id"]: r["tm_name"] for r in store.read("dim_base_trademark").collect()}
    assert got == {"1": "apple", "2": "blueberry", "3": "cherry"}


def test_route_changelog_batch(spark, tmp_path):
    rows = [
        _cdc("base_trademark", "insert", {"id": "1", "tm_name": "apple", "logo_url": "x.png"}),
        _cdc("base_trademark", "update", {"id": "1", "tm_name": "apricot", "logo_url": "y.png"}),
        _cdc("user_info", "bootstrap-insert", {"id": "7", "name": "u7", "birthday": "2000-01-01", "email": "e"}),
        _cdc("base_category1", "insert", {"id": "3", "name": "c3"}),
        _cdc("order_info", "insert", {"id": "9"}),       # no config row → dropped
        _cdc("base_trademark", "delete", {"id": "1"}),   # delete type → filtered
    ]
    clean, _ = parse_with_dirty(static_jsonl(spark, rows), TOPIC_DB_SCHEMA)
    store = DimStore(spark, str(tmp_path / "dim"))
    counts = route_changelog_batch(clean, _config_df(spark), store)
    assert counts == {"dim_base_trademark": 2, "dim_user_info": 1, "dim_base_category1": 1}

    tm = {r["id"]: r for r in store.read("dim_base_trademark").collect()}
    assert list(tm) == ["1"]
    assert tm["1"]["tm_name"] == "apricot"  # within-batch arrival order: update wins
    assert "logo_url" not in store.read("dim_base_trademark").columns  # T5 whitelist

    ui = store.read("dim_user_info").collect()[0]
    # exact-match projection: 'name' whitelisted, substring sibling
    # 'tm_name' absent; 'email' not whitelisted
    assert set(store.read("dim_user_info").columns) == {"id", "name", "birthday"}
    assert ui["name"] == "u7"
    assert store.read("dim_base_category1").collect()[0]["name"] == "c3"


def test_dim_app_stream_with_config_refresh(spark, tmp_path):
    """ST5 broadcast refresh: a config row added between micro-batches
    applies to the next batch without restarting the query."""
    src = str(tmp_path / "src")
    cfg_path = str(tmp_path / "config")
    store = DimStore(spark, str(tmp_path / "dim"))
    ckpt = str(tmp_path / "ckpt")

    _config_df(spark).write.mode("overwrite").parquet(cfg_path)
    os.makedirs(src, exist_ok=True)
    with open(os.path.join(src, "b1.jsonl"), "w") as f:
        f.write(_cdc("base_trademark", "insert", {"id": "1", "tm_name": "apple"}) + "\n")
        f.write(_cdc("activity_info", "insert", {"id": "5", "activity_name": "11.11"}) + "\n")

    from flink_realtime_data_warehouse_spark.streaming.jobs import parse_changelog_stream

    stream = parse_changelog_stream(read_jsonl_stream(spark, src))
    q = start_dim_app(spark, stream, cfg_path, store, ckpt)
    q.awaitTermination(120)
    assert store.tables() == ["dim_base_trademark"]  # activity not configured yet

    # add a config row (the reference would CDC this from MySQL) + new data
    new_cfg = CONFIG_ROWS + [("activity_info", "dim_activity_info", "id,activity_name", "id", None)]
    spark.createDataFrame(new_cfg, TABLE_PROCESS_SCHEMA).write.mode("overwrite").parquet(cfg_path)
    with open(os.path.join(src, "b2.jsonl"), "w") as f:
        f.write(_cdc("activity_info", "update", {"id": "5", "activity_name": "12.12"}) + "\n")

    stream2 = parse_changelog_stream(read_jsonl_stream(spark, src))
    q2 = start_dim_app(spark, stream2, cfg_path, store, ckpt)
    q2.awaitTermination(120)
    assert "dim_activity_info" in store.tables()
    act = store.read("dim_activity_info").collect()
    assert [(r["id"], r["activity_name"]) for r in act] == [("5", "12.12")]
