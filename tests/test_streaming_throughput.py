"""The bench's streaming end-to-end harness must actually move rows
through all three topologies — counts here pin the workload shape so a
silent wiring break can't report a vacuous rows/sec number."""

from flink_realtime_data_warehouse_spark.streaming.throughput import (
    _smoke_outputs,
    run_streaming_throughput,
)

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_throughput_end_to_end(spark, tmp_path):
    res = run_streaming_throughput(spark, SF_DIR, str(tmp_path))
    assert res["rows_behavior"] > 0 and res["rows_changelog"] > 0
    assert res["streaming_rows_per_sec"] > 0
    assert set(res) >= {
        "parse_st1_split_sec",
        "st2_uv_sec",
        "dim_router_sec",
        "streaming_total_sec",
        "history_dedup_sec",
    }
    # startup/steady split (r7): the one-row probe measures a positive
    # fixed tax, and netting it out can only raise the rate
    assert res["streaming_startup_sec"] > 0
    assert res["streaming_rows_per_sec"] >= res["streaming_rows_per_sec_cold"]
    assert res["rows_docs"] > 0 and res["history_dedup_rows_per_sec"] > 0
    # the gated ingest (digest + df-capped band probe) has its own rate
    assert res["history_dedup_gated_rows_per_sec"] > 0
    # bloom-prefiltered ingest + the second-drop scan/skip pair
    assert res["history_dedup_bloom_rows_per_sec"] > 0
    assert res["history_dedup_second_scan_sec"] > 0
    assert res["history_dedup_second_bloom_sec"] > 0
    outs = _smoke_outputs(spark, str(tmp_path))
    # every behavior line is a page record and survives parse+ST1
    assert outs["out_baselog/dwd_traffic_corrected_log"] == res["rows_behavior"]
    assert outs["out_baselog/dwd_traffic_page_log"] == res["rows_behavior"]
    # UV output: one row per (mid, day) entry-page first visit — fewer
    # than the input, more than zero (a third of events are entries)
    assert 0 < outs["out_uv"] < res["rows_behavior"]
    # every changelog insert reached the dimension store
    assert outs["dim/dim_user_info"] == res["rows_changelog"]
    # history dedup: the corpus' distinct contents land in clean (one
    # keeper per digest), duplicates route away, digests cover all
    assert 0 < outs["out_histdedup/clean"] <= res["rows_docs"]
    assert outs["out_histdedup/digests"] == outs["out_histdedup/clean"]
