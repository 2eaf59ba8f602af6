"""T1/T2 parse + dirty channel and T7/T8 split/explode (batch forms)."""

import json

from flink_realtime_data_warehouse_spark.operators.parse import (
    entry_pages_only,
    keep_changelog_types,
    parse_with_dirty,
)
from flink_realtime_data_warehouse_spark.operators.split import split_log
from flink_realtime_data_warehouse_spark.schemas import (
    BEHAVIOR_LOG_SCHEMA,
    DIM_KEPT_TYPES,
    TOPIC_DB_SCHEMA,
)
from flink_realtime_data_warehouse_spark.sources.streams import static_jsonl


def _log(mid, ts, page=None, start=None, err=None, display=None, actions=None, is_new="0"):
    rec = {"common": {"mid": mid, "is_new": is_new}, "ts": ts}
    if page:
        rec["page"] = page
    if start:
        rec["start"] = start
    if err:
        rec["err"] = err
    if display:
        rec["display"] = display
    if actions:
        rec["actions"] = actions
    return json.dumps(rec)


def test_dirty_channel(spark):
    rows = [
        _log("m1", 1000, page={"page_id": "home"}),
        "{not valid json!!",
        _log("m2", 2000, start={"entry": "icon", "loading_time": 10}),
    ]
    clean, dirty = parse_with_dirty(static_jsonl(spark, rows), BEHAVIOR_LOG_SCHEMA)
    assert clean.count() == 2
    dirty_rows = dirty.collect()
    assert len(dirty_rows) == 1
    assert dirty_rows[0]["dirty_raw"].startswith("{not valid")


def test_changelog_type_filter(spark):
    rows = [
        json.dumps({"table": "t1", "type": t, "data": {"id": "1"}})
        for t in ("insert", "update", "bootstrap-insert", "delete", "truncate")
    ]
    clean, _ = parse_with_dirty(static_jsonl(spark, rows), TOPIC_DB_SCHEMA)
    kept = keep_changelog_types(clean, DIM_KEPT_TYPES)
    assert sorted(r["type"] for r in kept.collect()) == ["bootstrap-insert", "insert", "update"]


def test_split_routes_and_explodes(spark):
    rows = [
        # error record: copied to err AND continues as a page record
        _log("m1", 1000, page={"page_id": "home"}, err={"error_code": 5, "msg": "boom"}),
        # start record
        _log("m2", 2000, start={"entry": "icon", "loading_time": 10}),
        # page with 2 displays and 1 action — explode check (T7, with the
        # reference's displays/actions bug fixed: SURVEY.md §7.4)
        _log(
            "m3",
            3000,
            page={"page_id": "good_list", "last_page_id": "home"},
            display=[
                {"item": "sku1", "item_type": "sku_id", "pos_id": 1},
                {"item": "sku2", "item_type": "sku_id", "pos_id": 2},
            ],
            actions=[{"item": "sku1", "item_type": "sku_id", "action_id": "cart"}],
        ),
        # plain page
        _log("m4", 4000, page={"page_id": "mine"}),
    ]
    clean, _ = parse_with_dirty(static_jsonl(spark, rows), BEHAVIOR_LOG_SCHEMA)
    out = split_log(clean)
    assert out["err"].count() == 1
    assert out["start"].count() == 1
    displays = out["display"].collect()
    assert len(displays) == 2
    assert {d["display"]["item"] for d in displays} == {"sku1", "sku2"}
    actions = out["action"].collect()
    assert len(actions) == 1
    assert actions[0]["action"]["action_id"] == "cart"
    # page stream: m1 (err continues), m3, m4 — not the start record
    page_mids = sorted(r["common"]["mid"] for r in out["page"].collect())
    assert page_mids == ["m1", "m3", "m4"]
    # exploded children carry page_id + ts stamps (T6)
    assert displays[0]["page_id"] == "good_list"
    assert displays[0]["ts"] == 3000


def test_entry_pages_only(spark):
    rows = [
        _log("m1", 1000, page={"page_id": "home"}),
        _log("m1", 2000, page={"page_id": "list", "last_page_id": "home"}),
        _log("m2", 3000, start={"entry": "icon"}),
    ]
    clean, _ = parse_with_dirty(static_jsonl(spark, rows), BEHAVIOR_LOG_SCHEMA)
    entries = entry_pages_only(clean)
    got = entries.collect()
    assert len(got) == 1
    assert got[0]["common"]["mid"] == "m1"
    assert got[0]["ts"] == 1000
