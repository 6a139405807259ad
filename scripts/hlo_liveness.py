"""Peak-HBM attribution from a scheduled HLO text dump.

Parses the ENTRY computation of an `is_scheduled=true` module (as produced by
jit(...).lower(...).compile().as_text(), see scripts/memprof_hlo.py), assigns
each instruction's output buffer a [def, last-use] live range in schedule
order, and reports (a) the liveness profile peak and (b) the instructions live
at the peak, grouped by shape — i.e. WHICH tensors own the HBM high-water
mark.  Approximations: ignores input/output aliasing and within-fusion
scratch, so the absolute number undershoots CompiledMemoryStats slightly; the
*attribution* is what matters.

Usage: python scripts/hlo_liveness.py /tmp/grad_hlo.txt [top_n]
"""

import re
import sys
from collections import defaultdict

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8, "u16": 2,
               "s16": 2, "c64": 8, "f8e4m3fn": 1, "f8e5m2": 1}

SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def shape_bytes(shape_str: str) -> int:
    """Total bytes of a (possibly tuple) shape string."""
    total = 0
    for m in SHAPE_RE.finditer(shape_str):
        dt, dims = m.groups()
        if dt not in DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DTYPE_BYTES[dt]
    return total


def main(path: str, top: int = 25) -> None:
    text = open(path).read()
    # ENTRY computation: from "ENTRY" to the matching closing brace (next
    # line starting with "}")
    m = re.search(r"^ENTRY [^\n]*\{$(.*?)^\}", text, re.M | re.S)
    if not m:
        # some dumps put ENTRY without trailing {$ on its own line
        m = re.search(r"ENTRY [^{]*\{(.*)", text, re.S)
    body = m.group(1)

    insns = []  # (name, bytes, [operand names])
    defs = {}
    head_re = re.compile(r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.+)$")
    op_re = re.compile(r"\s([a-z][\w\-]*)\(")
    for line in body.splitlines():
        mm = head_re.match(line)
        if not mm:
            continue
        name, rhs = mm.groups()
        om = op_re.search(" " + rhs)
        if not om:
            continue
        shape = rhs[: om.start()].strip()
        opname = om.group(1)
        rest = rhs[om.end():]
        ops = re.findall(r"%([\w.\-]+)", rest.split(", calls=")[0]
                         .split(", to_apply=")[0])
        b = shape_bytes(shape)
        idx = len(insns)
        insns.append((name, b, ops, opname, shape))
        defs[name] = idx

    n = len(insns)
    # aliasing: get-tuple-element / bitcast / (copy-done -> its copy-start)
    # allocate nothing; uses of them count as uses of their source buffer
    ALIAS_OPS = {"get-tuple-element", "bitcast", "copy-done", "tuple",
                 "async-done"}
    root_of = list(range(n))
    for i, (name, b, ops, opname, shape) in enumerate(insns):
        if opname in ALIAS_OPS and ops:
            j = defs.get(ops[0])
            if j is not None:
                root_of[i] = root_of[j]
    insns = [
        (name, 0 if opname in ALIAS_OPS else b, ops, opname, shape)
        for (name, b, ops, opname, shape) in insns
    ]

    last_use = [i for i in range(n)]
    for i, (_, _, ops, _, _) in enumerate(insns):
        for o in ops:
            j = defs.get(o)
            if j is not None:
                r = root_of[j]
                last_use[r] = max(last_use[r], i)
                last_use[j] = max(last_use[j], i)

    # parameters live whole program (approximation: they're arguments, not
    # temp — skip them from the profile)
    events = defaultdict(int)
    for i, (name, b, ops, opname, shape) in enumerate(insns):
        if opname == "parameter" or b == 0:
            continue
        events[i] += b
        events[last_use[i] + 1] -= b
    live = 0
    peak, peak_t = 0, 0
    profile = {}
    for t in sorted(events):
        live += events[t]
        profile[t] = live
        if live > peak:
            peak, peak_t = live, t

    print(f"{n} instructions; liveness peak {peak/2**30:.2f} GiB "
          f"at schedule index {peak_t}")

    # what's live at the peak, grouped by shape
    grp = defaultdict(lambda: [0, 0])
    at_peak = []
    for i, (name, b, ops, opname, shape) in enumerate(insns):
        if opname == "parameter" or b == 0:
            continue
        if i <= peak_t <= last_use[i]:
            key = (shape.split("{")[0], opname)
            grp[key][0] += b
            grp[key][1] += 1
            at_peak.append((b, name, shape, opname, i, last_use[i]))
    rows = sorted(grp.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"\nlive at peak, grouped:\n{'GiB':>8} {'count':>6}  shape  op")
    for (shape, opn), (b, c) in rows:
        print(f"{b/2**30:8.3f} {c:6d}  {shape}  {opn}")

    at_peak.sort(reverse=True)
    print(f"\ntop single buffers at peak:")
    for b, name, shape, opn, i, lu in at_peak[:top]:
        print(f"{b/2**30:8.3f} GiB  {name[:60]:60s} {shape.split('{')[0]:34s}"
              f" def={i} last={lu}")


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 25)
