"""compare_bench must normalize host drift out of cross-round deltas
and recover queries from the truncated r3-r5 driver captures."""

import json
import os
import subprocess
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from tools.compare_bench import load_bench  # noqa: E402


def test_load_bench_recovers_from_truncated_tail(tmp_path):
    capture = {
        "n": 5,
        "rc": 0,
        "parsed": None,
        "tail": '4, "q_fast": 0.31, "q_slow": 2.5, "calib": 0.4, '
        '"queries_omitted": 2}\n',
    }
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(capture))
    d = load_bench(str(p))
    assert d["queries"]["q_fast"] == 0.31
    assert d["queries"]["q_slow"] == 2.5
    assert d["calib_shuffle_sec"] == 0.4


def test_load_bench_recovers_from_compact_tail(tmp_path):
    """The compact final line (separators=(",",":")) has no space after
    colons and carries scalar keys; recovery must parse it as JSON —
    reading the queries sub-dict, not scraping scalars into it."""
    compact = json.dumps(
        {
            "metric": "bench_total_sec",
            "value": 12.5,
            "total_min": 11.9,
            "calib_shuffle_sec": 0.41,
            "streaming_rows_per_sec": 21000.0,
            "sf": 0.1,
            "queries": {"q_fast": 0.31, "q_slow": 2.5},
        },
        separators=(",", ":"),
    )
    capture = {"n": 5, "rc": 0, "parsed": None, "tail": "noise\n" + compact}
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(capture))
    d = load_bench(str(p))
    assert d["queries"] == {"q_fast": 0.31, "q_slow": 2.5}
    assert d["calib_shuffle_sec"] == 0.41


def test_load_bench_compact_truncated_tail_excludes_scalars(tmp_path):
    """Even a TRUNCATED compact tail (JSON parse impossible) must not
    ingest scalar keys like value/total_min as query timings."""
    capture = {
        "n": 5,
        "rc": 0,
        "parsed": None,
        "tail": '5,"value":12.5,"total_min":11.9,"calib_shuffle_sec":0.41,'
        '"streaming_rows_per_sec":21000.0,"queries":{"q_fast":0.31,'
        '"q_slow":2.5}}',
    }
    p = tmp_path / "cap.json"
    p.write_text(json.dumps(capture))
    d = load_bench(str(p))
    assert d["queries"] == {"q_fast": 0.31, "q_slow": 2.5}
    assert d["calib_shuffle_sec"] == 0.41


def test_compare_normalizes_calibration_drift(tmp_path):
    old = {
        "queries_min": {"a": 1.0, "b": 2.0, "c": 0.1},
        "calib_shuffle_sec": 0.4,
    }
    # host ran 2x slower AND b regressed 2x structurally; c is noise
    # (stays under the 0.3 s floor on both sides)
    new = {
        "queries_min": {"a": 2.0, "b": 8.0, "c": 0.25},
        "calib_shuffle_sec": 0.8,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "tools", "compare_bench.py"),
             str(po), str(pn)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    assert out["calib_drift"] == 2.0
    flagged = {f["query"] for f in out["flagged"]}
    assert flagged == {"b"}  # a is pure drift; c is under the noise floor
    b = next(f for f in out["flagged"] if f["query"] == "b")
    assert b["norm_ratio"] == 2.0 and b["raw_ratio"] == 4.0


def test_compare_normalizes_compute_drift_for_numpy_rows(tmp_path):
    """CPU-bound rows (NumPy-kernel families) normalize by
    calib_cpu_sec, shuffle-bound rows by calib_shuffle_sec: a round
    where compute ran 3x slower but shuffle only 1x must not flag the
    embedding row (pure compute drift) while still flagging a real
    shuffle-side regression."""
    old = {
        "queries_min": {"dedup_embedding_pairs": 1.0, "q1": 1.0},
        "calib_shuffle_sec": 0.4,
        "calib_cpu_sec": 0.5,
    }
    new = {
        "queries_min": {"dedup_embedding_pairs": 3.0, "q1": 2.0},
        "calib_shuffle_sec": 0.4,
        "calib_cpu_sec": 1.5,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "tools", "compare_bench.py"),
             str(po), str(pn)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    assert out["calib_cpu_drift"] == 3.0
    flagged = {f["query"] for f in out["flagged"]}
    assert flagged == {"q1"}  # the embedding row is host compute drift


def test_compare_cpu_rows_fall_back_to_shuffle_drift_pre_r9(tmp_path):
    """Against a pre-r9 capture (no calib_cpu_sec) the CPU-bound rows
    keep the old shuffle-drift normalization — a flag there still means
    'adjudicate by hand', never a silent divide-by-None."""
    old = {"queries_min": {"ann_cosine_topk": 1.0}, "calib_shuffle_sec": 0.4}
    new = {
        "queries_min": {"ann_cosine_topk": 4.0},
        "calib_shuffle_sec": 0.4,
        "calib_cpu_sec": 1.5,
    }
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = json.loads(
        subprocess.run(
            [sys.executable, os.path.join(REPO_ROOT, "tools", "compare_bench.py"),
             str(po), str(pn)],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )
    assert out["calib_cpu_drift"] is None
    assert {f["query"] for f in out["flagged"]} == {"ann_cosine_topk"}
