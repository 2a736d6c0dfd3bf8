"""InfluxDB HTTP transport integration test against a real local HTTP
server — verifies the wire format (endpoint, content type, batch bodies)
without a real InfluxDB."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from node_mongo2influx_spark import TransformSpec
from node_mongo2influx_spark.sinks import InfluxLineProtocolSink
from node_mongo2influx_spark.sinks.influx import HttpTransport
from node_mongo2influx_spark.sources.catalog import DirectoryCatalog


class _Recorder(BaseHTTPRequestHandler):
    requests: list[tuple[str, bytes]] = []
    lock = threading.Lock()

    def do_POST(self):  # noqa: N802
        body = self.rfile.read(int(self.headers["Content-Length"]))
        with _Recorder.lock:
            _Recorder.requests.append((self.path, body))
        self.send_response(204)
        self.end_headers()

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def http_server():
    _Recorder.requests = []
    srv = HTTPServer(("127.0.0.1", 0), _Recorder)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def test_http_transport_posts_batches(engine, sf_dir, http_server):
    catalog = DirectoryCatalog(engine.spark, sf_dir)
    sink = InfluxLineProtocolSink(
        HttpTransport(http_server, database="tsdb"), insert_limit=300
    )
    trunc_engine = type(engine)(
        engine.spark, engine.config.merged(empty_series=True)
    )
    report = trunc_engine.migrate(
        catalog, TransformSpec(rename={"ts": "time"}), sink, tables=["events"]
    )
    # emptySeries mode issued a parameterized DELETE before any write
    first_path = _Recorder.requests[0][0]
    assert first_path.startswith("/query?")
    assert "DELETE+FROM+%22events%22" in first_path
    _Recorder.requests = [r for r in _Recorder.requests if r[0].startswith("/write")]
    assert not report.failed and report.rows_written == 1000
    paths = {p for p, _ in _Recorder.requests}
    assert paths == {"/write?db=tsdb"}
    lines = [
        ln
        for _, body in _Recorder.requests
        for ln in body.decode().strip().splitlines()
    ]
    assert len(lines) == 1000
    assert all(ln.startswith("events ") for ln in lines)
    # insert_limit respected per POST
    assert max(
        len(body.decode().strip().splitlines()) for _, body in _Recorder.requests
    ) <= 300
