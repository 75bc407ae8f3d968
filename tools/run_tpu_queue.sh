#!/bin/bash
# TPU-window queue: everything blocked on the axon tunnel, in priority
# order, each step logged and independently resumable (every tool writes
# its artifacts incrementally, so a dropped tunnel mid-queue loses only
# the in-flight step). Re-run safe.
#
# Probe first (import jax hangs when the tunnel is down):
#   timeout 90 python -c 'import jax,numpy as np; x=jax.numpy.ones((128,128)); print(float(np.asarray((x@x).sum())))'
#
# Steps 4-6 (full distill refresh) are gated on reading step 3's A/B
# ranking (docs/distill_ab_sp_sparse.json) — pass knob flags accordingly.

set -uo pipefail
cd "$(dirname "$0")/.."
LOG=/tmp/tpu_queue
mkdir -p "$LOG"

run() {
  name=$1; shift
  echo "=== $name: $* ===" | tee -a "$LOG/queue.log"
  timeout "$TMO" "$@" >"$LOG/$name.log" 2>&1
  echo "$name exit=$? $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
}

# 1. hoist A/B + device-ORB/GFTT FPS + bench refresh (highest priority:
#    unblocks the README/BENCH_NOTES "measure on next TPU window" rows)
TMO=7200 run tail python tools/measure_round3_tail.py

# 2. EFFICIENCY.md device-classic cost rows (TPU-compiled numbers)
TMO=3600 run flops python tools/flops_report.py

# 3. distill knob A/B on the weakest family (short schedule)
TMO=14400 run distill_ab python tools/distill_ab.py --prefix sp_sparse

echo "A/B ranking ready: $LOG/distill_ab.log — pick knobs, then run:" \
  | tee -a "$LOG/queue.log"
echo "  python tools/distill_families.py --steps 12000 [--clean-prob ...]" \
  | tee -a "$LOG/queue.log"
echo "  python tools/family_accuracy.py" | tee -a "$LOG/queue.log"
echo "  for f in superpoint_pretrained sp_sparse sp_resnet18; do" \
  | tee -a "$LOG/queue.log"
echo "    python tools/run_sweep_tpu.py --filter \$f; done" \
  | tee -a "$LOG/queue.log"
