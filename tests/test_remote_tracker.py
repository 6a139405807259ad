"""Remote tracker sinks (comet_utils.py:64-172 streaming role)."""

import json
import threading

import numpy as np

from hold_tpu.utils.logger import Tracker
from hold_tpu.utils.remote import HttpRemote, JsonlRemote, remote_from_spec


def test_jsonl_remote_streams_metrics_and_images(tmp_path):
    spool = str(tmp_path / "spool.jsonl")
    tr = Tracker(str(tmp_path / "logs"), exp_key="rem000001",
                 remote=f"jsonl:{spool}")
    tr.log_dict({"loss": 1.5, "psnr": 20.0}, step=3, epoch=0)
    tr.log_image("val", np.zeros((4, 4, 3), np.float32), step=3)
    tr.close()

    recs = [json.loads(l) for l in open(spool)]
    kinds = [r["kind"] for r in recs]
    assert kinds == ["metrics", "image"]
    assert recs[0]["data"]["loss"] == 1.5
    assert recs[1]["name"] == "val"


def test_http_remote_round_trip_and_offline_buffer(tmp_path):
    from http.server import BaseHTTPRequestHandler, HTTPServer

    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.extend(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        # offline buffering: a dead endpoint must not raise, and records
        # must survive to be delivered once the sink points somewhere live
        dead = HttpRemote("http://127.0.0.1:1/ingest", timeout=0.2)
        dead.log_metrics({"loss": 9.0}, step=0)
        assert len(dead._buf) == 1

        live = HttpRemote(f"http://127.0.0.1:{port}/ingest", timeout=2.0)
        live.log_metrics({"loss": 1.0}, step=1)
        live.log_image("panel", "/tmp/p.png", step=1)
        live.close()
        assert len(received) == 2
        assert received[0]["data"]["loss"] == 1.0
        assert received[1]["kind"] == "image"
    finally:
        srv.shutdown()


def test_remote_from_spec(tmp_path):
    assert remote_from_spec("") is None
    assert isinstance(remote_from_spec(f"jsonl:{tmp_path}/x.jsonl"), JsonlRemote)
    assert isinstance(remote_from_spec("http://h/i"), HttpRemote)
    import pytest

    with pytest.raises(ValueError):
        remote_from_spec("ftp://nope")
