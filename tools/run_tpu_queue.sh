#!/bin/bash
# TPU-window queue — round-5 backlog (VERDICT r4 item 2), in priority
# order, each step logged and independently resumable (every tool writes
# its artifacts incrementally, so a dropped tunnel mid-queue loses only
# the in-flight step). Re-run safe.
#
# Probe first (import jax hangs when the tunnel is down):
#   timeout 300 python -c 'import jax,numpy as np; x=jax.numpy.ones((128,128)); print(float(np.asarray((x@x).sum())))'
#
# Queue:
#   1. bench.py               — headline FPS (BENCH_r05 parity) + warms the
#                               hybrid XLA cache for everything downstream
#   2. run_accuracy_matrix    — cross-scene x drives x keys x 5-setting
#                               ladder + per-setting FPS; unblocks the
#                               landmark-default (item 6) and matcher-bf16
#                               (item 9) decisions
#   3. run_device_classic_matrix — regen with the device-AKAZE rows
#   4. run_sweep_tpu          — refresh docs/sweep_results.json to the
#                               82-row grid with fused-hybrid timing
#   5. flops_report           — EFFICIENCY.md device-classic cost rows

set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* $(date -u +%H:%M:%S) ===" | tee -a "$LOG/queue.log"
  timeout "$TMO" "$@" >"$LOG/$name.log" 2>&1
  echo "$name exit=$? $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
}

TMO=7200  run bench   python bench.py
TMO=14400 run accmat  python tools/run_accuracy_matrix.py
TMO=10800 run devmat  python tools/run_device_classic_matrix.py
TMO=21600 run sweep   python tools/run_sweep_tpu.py
TMO=3600  run flops   python tools/flops_report.py
echo "queue drained $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
