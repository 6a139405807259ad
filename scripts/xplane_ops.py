"""Aggregate device op time from a jax.profiler trace.

Reads the trace-viewer JSON (trace.json.gz) that jax.profiler.stop_trace
writes — no tensorflow/tensorboard dependency.

Usage:
  python scripts/xplane_ops.py <trace_dir_or_json.gz> [top_n]
where trace_dir is the directory passed to jax.profiler.start_trace.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict


def find_trace(path: str) -> str:
    if path.endswith(".json.gz"):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")
    ))
    assert hits, f"no *.trace.json.gz under {path}"
    return hits[-1]


def main(path: str, top: int = 30) -> None:
    f = find_trace(path)
    d = json.load(gzip.open(f))
    evs = d["traceEvents"]
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for e in evs:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" not in pids.get(e["pid"], ""):
                continue
            agg[e["name"]][0] += e["dur"]
            agg[e["name"]][1] += 1
            total += e["dur"]

    print(f"{f}\ntotal device span time: {total/1e3:.2f} ms "
          f"(parent spans double-count their children)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    for n, (us, c) in rows:
        print(f"{us/1e3:9.3f} ms x{c:<5d} {n[:95]}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 30)
