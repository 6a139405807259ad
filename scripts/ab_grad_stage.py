"""A/B the grad-stage knobs on the real chip at the bench's best shape.

Grid: HOLD_NO_REMAT in {unset, 1} x HOLD_SHADE_CHUNK in {32768, 65536, 131072}.
Each cell re-execs profile_step.py in a child process (the knobs are read at
import/trace time). Prints a ranked table.

Usage: python scripts/ab_grad_stage.py [--rays 10240] [--iters 8]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cell(rays, iters, no_remat, chunk):
    env = dict(os.environ)
    env["HOLD_SHADE_CHUNK"] = str(chunk)
    if no_remat:
        env["HOLD_NO_REMAT"] = "1"
    else:
        env.pop("HOLD_NO_REMAT", None)
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "scripts", "profile_step.py"),
         "--rays", str(rays), "--iters", str(iters)],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    out = p.stdout.strip().splitlines()
    for line in out:
        if line.startswith("rays="):
            parts = line.split()
            return {
                "sampler_ms": float(parts[1].split("=")[1][:-2]),
                "grad_ms": float(parts[2].split("=")[1][:-2]),
                "rays_per_s": float(parts[4]),
            }
    return {"error": (p.stderr or "no output")[-300:]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=10240)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    results = []
    for no_remat in (False, True):
        for chunk in (32768, 65536, 131072):
            tag = f"remat={'off' if no_remat else 'on '} chunk={chunk:6d}"
            r = run_cell(args.rays, args.iters, no_remat, chunk)
            print(f"{tag}: {json.dumps(r)}", flush=True)
            results.append((tag, r))
    ok = [(t, r) for t, r in results if "rays_per_s" in r]
    if ok:
        best = max(ok, key=lambda x: x[1]["rays_per_s"])
        print(f"best: {best[0]} -> {best[1]['rays_per_s']:.0f} rays/s")


if __name__ == "__main__":
    main()
