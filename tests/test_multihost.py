"""REAL two-process jax.distributed exercise (VERDICT r4 #3).

Replaces the monkeypatched process_count coverage with two actual CPU
processes coordinated on localhost: each holds 4 of the 8 global devices,
shards the identical host batch via parallel.sharding.shard_batch's
multi-host branch (make_array_from_callback), and runs a jitted global
reduction whose result must equal the full-batch value on BOTH processes —
proving the assembled global arrays are complete and consistent even though
each process materialised only its local shards.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_shard_batch(tmp_path):
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    outs = [str(tmp_path / f"report{i}.json") for i in range(2)]
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(HERE, "multihost_worker.py"),
             coordinator, "2", str(i), outs[i]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out.decode(errors="replace"))
    assert all(p.returncode == 0 for p in procs), "\n".join(logs)

    reports = [json.load(open(o)) for o in outs]
    for r in reports:
        assert r["process_count"] == 2
        assert r["local_device_count"] == 4
        assert r["global_device_count"] == 8
        # the jitted global reduction saw the COMPLETE batch
        np.testing.assert_allclose(r["sums"], r["expected_sums"], rtol=1e-6)

    # the two processes hold disjoint halves of the sharded axis
    for key in ("gt_rgb", "uv"):
        s0 = {tuple(rng) for rng, _ in reports[0]["local_shards"][key]}
        s1 = {tuple(rng) for rng, _ in reports[1]["local_shards"][key]}
        assert s0 and s1
        assert not (s0 & s1), (key, s0, s1)
