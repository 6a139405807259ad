"""Leaf-level device op attribution from a jax.profiler trace.

Unlike xplane_ops.py (which sums every span, double-counting parents), this
reconstructs the span nesting per (pid, tid) track and attributes each span
only its SELF time (duration minus children), then groups ops by a coarse
name family (fusion kind / kernel / primitive).  Optionally restricts to
spans nested under a parent whose name contains a filter string, so the grad
stage (`jit_step_fn`) can be broken down separately from the sampler.

Usage:
  python scripts/xplane_leaves.py <trace_dir_or_json.gz> [top_n] [parent_filter]
"""

import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from xplane_ops import find_trace


def family(name: str) -> str:
    """Coarse op family: strip SSA numbering, keep fusion/kernel identity."""
    n = re.sub(r"\.\d+$", "", name)
    n = re.sub(r"\d+$", "#", n)
    return n


def main(path: str, top: int = 30, parent_filter: str = "") -> None:
    import gzip
    import json

    f = find_trace(path)
    d = json.load(gzip.open(f))
    evs = d["traceEvents"]
    pids = {}
    for e in evs:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")

    tracks = defaultdict(list)
    for e in evs:
        if e.get("ph") == "X" and "dur" in e and "TPU" in pids.get(e["pid"], ""):
            tracks[(e["pid"], e.get("tid"))].append(e)

    # windows of the parent filter (matched on ANY track) — ops on other
    # tracks are attributed to a parent by time overlap, since the trace
    # viewer puts jit scopes and XLA ops on different threads
    windows = []
    if parent_filter:
        for track in tracks.values():
            for e in track:
                if parent_filter in e["name"]:
                    windows.append((e["ts"], e["ts"] + e["dur"]))
        windows.sort()
        # merge overlapping/adjacent windows into disjoint intervals: with
        # multiple device tracks each carries its own jit-scope span, and an
        # unmerged bisect would test only the latest-starting window,
        # silently dropping spans inside an earlier, longer one
        merged = []
        for s, t in windows:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], t)
            else:
                merged.append([s, t])
        windows = [(s, t) for s, t in merged]

    def in_window(ts: float) -> bool:
        # containment is tested on the span's START timestamp only: a leaf op
        # straddling a window edge is counted (or excluded) in full.  Edge
        # spans are rare and short relative to jit-scope windows, so the
        # approximation skews attribution by well under the noise floor.
        if not parent_filter:
            return True
        import bisect

        i = bisect.bisect_right(windows, (ts, float("inf"))) - 1
        return i >= 0 and ts < windows[i][1]

    # compute child time per span by stack-based interval containment on each
    # track, then attribute each span its SELF time only
    self_us = defaultdict(lambda: [0.0, 0])
    total = 0.0
    for track in tracks.values():
        track.sort(key=lambda e: (e["ts"], -e["dur"]))
        n = len(track)
        child = [0.0] * n
        stack = []
        for i, e in enumerate(track):
            ts = e["ts"]
            while stack and ts >= track[stack[-1]]["ts"] + track[stack[-1]]["dur"] - 1e-9:
                stack.pop()
            if stack:
                child[stack[-1]] += e["dur"]
            stack.append(i)
        for i, e in enumerate(track):
            if not in_window(e["ts"]):
                continue
            if parent_filter and parent_filter in e["name"]:
                continue  # the parent itself; only want its contents
            if re.fullmatch(r"\d+", e["name"]):
                continue  # queue/program id spans, not ops
            s = max(0.0, e["dur"] - child[i])
            key = family(e["name"])
            self_us[key][0] += s
            self_us[key][1] += 1
            total += s

    self_us = {k: v for k, v in self_us.items() if v[0] > 0}
    print(f"{f}\nself-time total: {total/1e3:.2f} ms"
          + (f"  (within '{parent_filter}')" if parent_filter else ""))
    rows = sorted(self_us.items(), key=lambda kv: -kv[1][0])[:top]
    for nm, (us, c) in rows:
        print(f"{us/1e3:9.3f} ms x{c:<5d} {nm[:95]}")


if __name__ == "__main__":
    main(
        sys.argv[1],
        int(sys.argv[2]) if len(sys.argv) > 2 else 30,
        sys.argv[3] if len(sys.argv) > 3 else "",
    )
