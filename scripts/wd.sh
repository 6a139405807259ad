# Shared TPU-step watchdog helpers (sourced by pipeline/demo/A-B scripts).
# The TPU tunnel intermittently wedges: a step can hang forever with the
# process alive.  run_wd launches a step, watches its console log's mtime,
# and kills+retries when it goes silent past $WDT seconds.  Training CLIs
# are idempotent via auto-resume, so a retry continues rather than restarts.
#
# The health probe runs a fresh python (import jax + tiny matmul); on this
# single shared CPU core that alone can take >60s under load, so the probe
# timeout is generous — a probe timeout usually means HOST contention, not
# a dead TPU.

WDT=${WDT:-900}

stamp() { echo "[$(date +%H:%M:%S)] $*"; }

tpu_ok() {
  timeout 150 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); assert float((x@x).sum()) > 0" >/dev/null 2>&1
}

wait_tpu() {
  until tpu_ok; do stamp "TPU not answering; retry in 60s"; sleep 60; done
  stamp "TPU healthy"
}

run_wd() {
  local watch=$1 tries=$2; shift 2
  local n=0
  while [ $n -lt $tries ]; do
    n=$((n + 1))
    wait_tpu
    stamp "launch (attempt $n/$tries): $*  [watch $watch]"
    "$@" >>"$watch" 2>&1 & local TPID=$!
    touch "$watch"
    while kill -0 $TPID 2>/dev/null; do
      sleep 45
      local age=$(( $(date +%s) - $(stat -c %Y "$watch") ))
      if [ "$age" -gt "$WDT" ]; then
        stamp "watchdog: $watch silent ${age}s — killing $TPID"
        kill $TPID 2>/dev/null; sleep 10; kill -9 $TPID 2>/dev/null
        break
      fi
    done
    wait $TPID 2>/dev/null; local rc=$?
    if [ $rc -eq 0 ]; then stamp "step done (watch $watch)"; return 0; fi
    stamp "step rc=$rc; retrying"
    sleep 20
  done
  stamp "step FAILED after $tries attempts: $*"
  return 1
}
