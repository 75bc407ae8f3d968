"""Run the full 72-config sweep (the reference's engine grid) on the TPU.

Mirrors the reference's 72-engine benchmark (6 backbones x 3 resolutions x
2 precisions x 2 batch sizes, scripts/engine_generation.py:25-31 + the
long_term_eval harness) with latency AND accuracy columns per config
(report §4.2's accuracy-vs-config study): frames come from a hermetic
synthetic drive with known ground truth, so every row carries FPS, ATE,
final drift and RPE.

Writes docs/sweep_results.json. Run: python tools/run_sweep_tpu.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spsvo_tpu  # noqa: E402
from spsvo_tpu.config import (classic_sweep_configs,  # noqa: E402
                              device_classic_sweep_configs, sweep_configs)
from spsvo_tpu.eval import harness  # noqa: E402
from spsvo_tpu.eval.synthetic import synthetic_drive  # noqa: E402


def main() -> None:
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="",
                    help="substring filter on config_string (e.g. 'orbtpu' "
                         "to refresh only the device-classic rows); "
                         "filtered runs merge into existing sweep_results")
    flags = ap.parse_args()

    rng = np.random.default_rng(42)
    n_frames = int(os.environ.get("SWEEP_FRAMES", "12"))
    frames, poses, P_l, P_r = synthetic_drive(rng, n_frames=n_frames)

    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    os.makedirs(docs, exist_ok=True)
    out = os.path.join(docs, "sweep_results.json")

    t0 = time.time()
    # the reference's full grid: 72 NN engines + 6 classic configs
    # (report §4.1.2); classic rows run the fused host-detect-all mode.
    # Plus 4 beyond-reference device-classic rows (ops/orb.py: ORB and
    # GFTT fully on-device, flagship + native resolution).
    cfgs = (sweep_configs() + classic_sweep_configs()
            + device_classic_sweep_configs())
    if flags.filter:
        cfgs = [c for c in cfgs if flags.filter in c.config_string]
        print(f"filter {flags.filter!r}: {len(cfgs)} configs")
    # snapshot the existing rows BEFORE run_sweep overwrites the file —
    # merging from git HEAD would silently discard any uncommitted rows
    # from a previous filtered run (e.g. back-to-back per-family refreshes)
    existing = []
    if flags.filter and os.path.exists(out):
        import json
        with open(out) as f:
            existing = json.load(f)
    rows = harness.run_sweep(lambda: list(frames), P_l, P_r,
                             configs=cfgs, out_json=out, gt_poses=poses,
                             max_frames=n_frames)
    if flags.filter and os.path.exists(out):
        # merge the refreshed rows over the pre-run snapshot
        import json
        with open(out) as f:
            fresh = {r["config"]: r for r in json.load(f)}
        full = {r["config"]: r for r in existing}
        full.update(fresh)
        with open(out, "w") as f:
            json.dump(list(full.values()), f, indent=1)
        print(f"merged {len(fresh)} refreshed rows into {len(full)} total")
    ok = [r for r in rows if "error" not in r]
    print(f"{len(ok)}/{len(rows)} configs ok in {time.time()-t0:.0f}s "
          f"-> {out}")
    for r in rows:
        if "error" in r:
            print("FAILED:", r["config"], r["error"][:200])


if __name__ == "__main__":
    main()
