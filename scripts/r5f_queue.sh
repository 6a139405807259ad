#!/bin/bash
# Round-5f queue (post-reset evidence regeneration): wait for the running
# bench, persist+commit its evidence, then run the refinement demo and
# persist+commit that too. Keeps the chip busy without overlap.
set -uo pipefail
cd "$(dirname "$0")/.."
exec >>logs/r5f_queue.log 2>&1
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

BPID=$(cat /tmp/bench.pid 2>/dev/null || echo "")
if [ -n "$BPID" ]; then
  stamp "waiting for bench (pid $BPID)"
  while kill -0 "$BPID" 2>/dev/null; do sleep 20; done
fi
stamp "bench done; persisting evidence"
bash scripts/collect_evidence.sh
git add evidence BENCH_ACC_BASELINE.json 2>/dev/null
git commit -q -m "Evidence: round-5 bench snapshot (perf grid + accuracy gate)" || true

stamp "running refinement demo"
bash scripts/refinement_demo.sh
stamp "refinement demo done; persisting evidence"
bash scripts/collect_evidence.sh
git add evidence 2>/dev/null
git commit -q -m "Evidence: refinement-effectiveness demo (noised-init pre/post eval)" || true
stamp "queue complete"
