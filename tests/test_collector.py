"""S4 log collector: HTTP edge → atomic spool → the same ODS pipeline
every streaming job consumes (file-drop JSONL → parse with dirty
side-channel)."""

import json
import os
import urllib.request

from flink_realtime_data_warehouse_spark.operators.parse import parse_with_dirty
from flink_realtime_data_warehouse_spark.schemas import BEHAVIOR_LOG_SCHEMA
from flink_realtime_data_warehouse_spark.sources.collector import LogCollector


def _post(url, body: bytes):
    req = urllib.request.Request(url, data=body, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=10) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_collector_test_stub_and_spool_to_ods(spark, tmp_path):
    spool = str(tmp_path / "ods_applog")
    c = LogCollector(spool, roll_every=2)
    host, port = c.start()
    try:
        # the reference's /test stub, byte-for-byte
        with urllib.request.urlopen(f"http://{host}:{port}/test", timeout=10) as r:
            assert r.status == 200 and r.read() == b"success"

        good1 = json.dumps(
            {"common": {"mid": "m1", "is_new": "1"},
             "page": {"page_id": "home"}, "ts": 1000}
        ).encode()
        good2 = json.dumps(
            {"common": {"mid": "m2", "is_new": "0"},
             "page": {"page_id": "cart", "last_page_id": "home"}, "ts": 2000}
        ).encode()
        bad = b"{not valid json"
        for body in (good1, good2, bad):
            assert _post(f"http://{host}:{port}/applog", body) == 200
        assert _post(f"http://{host}:{port}/nope", b"x") == 404
    finally:
        c.stop()

    # roll_every=2 published one file mid-stream; stop() flushed the rest.
    files = sorted(os.listdir(spool))
    assert len(files) == 2 and not any(f.endswith(".tmp") for f in files)

    # the spool is a valid ODS file drop: batch-read through the same
    # parse path the streaming jobs use; the bad line lands dirty
    raw = spark.read.text(spool)
    clean, dirty = parse_with_dirty(raw, BEHAVIOR_LOG_SCHEMA)
    mids = sorted(r["common"]["mid"] for r in clean.collect())
    assert mids == ["m1", "m2"]
    assert dirty.count() == 1


def test_collector_newline_injection_kept_single_line(tmp_path):
    """A payload containing newlines must still occupy ONE spool line —
    otherwise a hostile record could forge extra ODS records."""
    spool = str(tmp_path / "spool")
    c = LogCollector(spool)
    host, port = c.start()
    try:
        _post(f"http://{host}:{port}/applog", b'{"a": 1}\n{"b": 2}')
    finally:
        c.stop()
    files = os.listdir(spool)
    assert len(files) == 1
    lines = open(os.path.join(spool, files[0]), "rb").read().splitlines()
    assert lines == [b'{"a": 1} {"b": 2}']


def test_collector_never_acks_unreadable_bodies(tmp_path):
    """200 means spooled (round-5 review): a chunked request (no
    Content-Length) must get 411, a malformed length 400 — previously
    both were acked while the line was silently dropped (or the handler
    thread raised)."""
    import http.client

    spool = str(tmp_path / "spool")
    c = LogCollector(spool)
    host, port = c.start()
    try:
        conn = http.client.HTTPConnection(host, port)
        # no Content-Length at all
        conn.putrequest("POST", "/applog", skip_accept_encoding=True)
        conn.endheaders()
        assert conn.getresponse().status == 411
        conn.close()
        # malformed Content-Length
        conn = http.client.HTTPConnection(host, port)
        conn.putrequest("POST", "/applog", skip_accept_encoding=True)
        conn.putheader("Content-Length", "not-a-number")
        conn.endheaders()
        assert conn.getresponse().status == 400
        conn.close()
    finally:
        c.stop()
    assert not os.path.exists(spool) or os.listdir(spool) == []


def test_collector_rejects_truncated_body(tmp_path):
    """A client that dies mid-body must get 400, not an ack of the
    truncated prefix (round-5 review: rfile.read(n) can return short
    on EOF, and spooling the prefix is ack-and-corrupt)."""
    import socket

    spool = str(tmp_path / "spool")
    c = LogCollector(spool)
    host, port = c.start()
    try:
        s = socket.create_connection((host, port))
        s.sendall(
            b"POST /applog HTTP/1.1\r\nHost: x\r\nContent-Length: 100\r\n\r\n"
            b'{"partial": tru'  # 15 of the promised 100 bytes
        )
        s.shutdown(socket.SHUT_WR)  # EOF: the body can never complete
        resp = s.recv(4096)
        assert b"400" in resp.split(b"\r\n")[0], resp
        s.close()
    finally:
        c.stop()
    assert not os.path.exists(spool) or os.listdir(spool) == []
