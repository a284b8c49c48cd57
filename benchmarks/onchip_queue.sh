#!/bin/bash
# On-chip measurement queue for TPU-tunnel recovery (ROADMAP round-3
# session 4). Run from the repo root; logs to /tmp/onchip_queue.log AND
# persists the full log + per-step JSON into benchmarks/results/ with an
# automatic commit, so measurements taken by the unattended watcher
# survive into the repo even if no interactive session is running.
# Each step is bounded; a dead tunnel makes bench.py fail fast (device
# probe), so this script is safe to fire blind. bench.py is the gate:
# if it fails, the queue aborts (but still copies + commits its log so
# the failure itself is recorded) and exits nonzero.
set -x
cd "$(dirname "$0")/.."
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_axon_cache}
RESULTS=benchmarks/results
mkdir -p "$RESULTS"
STAMP=$(date -u +%Y%m%dT%H%M%S)
RC=0
{
  echo "=== onchip queue start $(date -u) ==="
  # 1. headline re-confirm (also proves the tunnel is actually up).
  #    No pipe here: the exit status must be bench.py's own (a tee
  #    pipeline without pipefail reports tee's 0 and breaks the gate).
  if timeout 1500 python bench.py > "$RESULTS/bench_$STAMP.json"; then
    cat "$RESULTS/bench_$STAMP.json"
    # (the deep-pack A/B ran 2026-08-19: OFF won both variants — the path
    # was removed; negative result recorded in ROADMAP.md)
    # 3. blend rows_tile sweep (dual step)
    timeout 1800 python benchmarks/kernel_sweep.py blend
    # 4. BASELINE configs 1 (latency decomposition, VERDICT r3 #5) and 2
    timeout 1500 python benchmarks/run_configs.py 1 2
    # 5. banded-x crossover (pins the DESTRIPE_BANDED_X_MIN_W default):
    #    dense vs banded/spectral x through the halo kernel at 4k/8k/16k
    DESTRIPE_NO_PALLAS=1 timeout 1800 python benchmarks/kernel_sweep.py bandedx 2048 4096 8192 16384
    echo "=== onchip queue done $(date -u) ==="
  else
    RC=1
    echo "=== onchip queue ABORTED: bench.py failed (tunnel?) $(date -u) ==="
  fi
} >> /tmp/onchip_queue.log 2>&1
cp /tmp/onchip_queue.log "$RESULTS/onchip_queue_$STAMP.log"
# scope the unattended commit to the results dir only — a bare `git commit`
# would sweep in anything a developer happens to have staged
git add "$RESULTS" && git commit -m "Record on-chip measurement queue results ($STAMP)" -- "$RESULTS"
exit $RC
