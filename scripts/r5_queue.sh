#!/bin/bash
# Round-5 TPU work queue: wait for the pipeline to free the chip, then run
# the refinement-effectiveness demo, the FLOP-diet accuracy A/B, and a
# bench snapshot, back to back (the chip never idles).
set -uo pipefail
cd "$(dirname "$0")/.."
exec >>logs/r5_queue.log 2>&1
stamp() { echo "[$(date +%H:%M:%S)] $*"; }

PIPE_PID=$(cat /tmp/pipeline_r5.pid 2>/dev/null || echo "")
if [ -n "$PIPE_PID" ]; then
  stamp "waiting for pipeline (pid $PIPE_PID)"
  while kill -0 "$PIPE_PID" 2>/dev/null; do sleep 30; done
fi
stamp "pipeline done; running refinement demo"
bash scripts/refinement_demo.sh
stamp "refinement demo done; running FLOP-diet A/B"
bash scripts/ab_flop_diet.sh
stamp "A/B done; bench snapshot"
timeout 3000 python bench.py > logs/bench_r5_snapshot.json 2>logs/bench_r5_snapshot.err
stamp "queue complete"
bash scripts/collect_evidence.sh || true
