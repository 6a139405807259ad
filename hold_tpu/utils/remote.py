"""Remote experiment-streaming sinks for Tracker.remote.

Covers the reference's comet.ml streaming role (common/comet_utils.py:64-172:
log_dict -> experiment.log_metrics, log_img -> experiment.log_image) with two
self-contained transports:

- ``JsonlRemote``: appends every record to a spool file (the shape a shipping
  sidecar would tail), one JSON object per line, fsync'd per flush interval.
- ``HttpRemote``: POSTs JSON batches to an endpoint; failures never raise into
  the train loop — records buffer and retry on the next call, mirroring
  comet's offline mode.

Select via the HOLD_TPU_REMOTE env var or the --remote_track flag:
  HOLD_TPU_REMOTE="jsonl:/tmp/spool.jsonl"
  HOLD_TPU_REMOTE="http://host:port/ingest"
"""

from __future__ import annotations

import json
import os
import time
from typing import Any


class JsonlRemote:
    """Spool-file remote: the local stand-in for a streaming backend."""

    def __init__(self, path: str):
        self.path = path
        d = os.path.dirname(path)
        if d:
            os.makedirs(d, exist_ok=True)
        self._f = open(path, "a")

    def log_metrics(self, rec: dict[str, Any], step: int) -> None:
        self._f.write(json.dumps({"kind": "metrics", "step": int(step),
                                  "data": rec}) + "\n")
        self._f.flush()

    def log_image(self, name: str, path: str, step: int) -> None:
        self._f.write(json.dumps({"kind": "image", "step": int(step),
                                  "name": name, "path": path}) + "\n")
        self._f.flush()

    def close(self) -> None:
        self._f.close()


class HttpRemote:
    """POST-JSON remote with an offline buffer; never raises into training."""

    def __init__(self, url: str, timeout: float = 2.0, max_buffer: int = 10000):
        self.url = url
        self.timeout = timeout
        self.max_buffer = max_buffer
        self._buf: list[dict] = []

    def _push(self, rec: dict) -> None:
        self._buf.append(rec)
        if len(self._buf) > self.max_buffer:
            self._buf = self._buf[-self.max_buffer:]
        self._flush()

    def _flush(self) -> None:
        import urllib.request

        if not self._buf:
            return
        body = json.dumps(self._buf).encode()
        req = urllib.request.Request(
            self.url, data=body, headers={"Content-Type": "application/json"}
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                if 200 <= resp.status < 300:
                    self._buf = []
        except Exception:
            pass  # keep buffering; retry on the next log call

    def log_metrics(self, rec: dict[str, Any], step: int) -> None:
        self._push({"kind": "metrics", "step": int(step), "t": time.time(),
                    "data": rec})

    def log_image(self, name: str, path: str, step: int) -> None:
        self._push({"kind": "image", "step": int(step), "name": name,
                    "path": path})

    def close(self) -> None:
        self._flush()


def remote_from_spec(spec: str | None):
    """"jsonl:<path>" | "http(s)://..." | "" -> sink or None."""
    spec = spec or os.environ.get("HOLD_TPU_REMOTE", "")
    if not spec:
        return None
    if spec.startswith("jsonl:"):
        return JsonlRemote(spec[len("jsonl:"):])
    if spec.startswith(("http://", "https://")):
        return HttpRemote(spec)
    raise ValueError(f"unknown remote tracker spec: {spec!r}")
