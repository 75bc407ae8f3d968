"""Round-3 tail measurements queued for the next TPU window.

The axon tunnel has been down since 2026-08-17 evening; these are the
measurements blocked on real hardware, in priority order:

  1. landmark scan-body point-tile hoist A/B (the last landmark-fusion
     optimisation landed unmeasured when the tunnel dropped);
  2. device-ORB / device-GFTT classic hybrid throughput at the flagship
     resolution and at native KITTI resolution (the classic path's first
     zero-host-work numbers — vs 25.6 FPS host-detect fused and the
     reference's 11.6 FPS);
  3. the full bench (BENCH refresh incl. the new device-ORB aux row).

Afterwards (separate runs): `python tools/flops_report.py` regenerates
docs/EFFICIENCY.md with the new device-classic cost rows (must run on the
TPU backend — the committed numbers are TPU-compiled), and
`python tools/run_sweep_tpu.py` refreshes the sweep incl. the 4
device-classic rows.

Then the distillation-fidelity refresh (VERDICT r2 item 3's 0.85 bar,
round-3 recipe additions: clean_prob, best-checkpoint selection, KD
temperature knob):
  python tools/distill_families.py --steps 12000   # ~TPU-hours; per-family
  python tools/family_accuracy.py                  # drift-ordering gate
  for f in superpoint_pretrained sp_sparse sp_resnet18; do \
      python tools/run_sweep_tpu.py --filter $f; done   # distilled rows
so the drift ordering is re-validated with the new weights.

Run: `python tools/measure_round3_tail.py [--skip-bench]`
(probe the tunnel first: a 90s-timeout tiny matmul — see CLAUDE.md).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import subprocess
import sys

import numpy as np

sys.path.insert(0, "/root/repo")  # before any spsvo_tpu/bench import:
# `python tools/...` puts only tools/ on sys.path, and PYTHONPATH=/root/repo
# breaks the axon jax plugin (CLAUDE.md)

import bench  # noqa: E402  (bench._load_frames / _measure_pipelined)

N_FRAMES = 128


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-bench", action="store_true")
    flags = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from spsvo_tpu.config import DescriptorType, DetectorType, VOConfig
    from spsvo_tpu.models import zoo
    from spsvo_tpu.parallel.sharding import (build_online_hybrid,
                                             build_orb_hybrid)

    cfg = VOConfig(model_name_prefix="sp_mbv1", image_height=120,
                   image_width=392, max_keypoints=512,
                   ransac_iterations=256, use_pallas_matcher=True)
    cfg_seq = dataclasses.replace(cfg, ransac_chunk=0, lm_unroll=6,
                                  solve_slots=128, use_pallas_solver=True)
    frames, P_l2, P_r2, gt = bench._load_frames(cfg)
    images = jnp.asarray(frames)
    P_l_j = jnp.asarray(P_l2, jnp.float32)
    P_r_j = jnp.asarray(P_r2, jnp.float32)
    key = jax.random.PRNGKey(0)
    apply_fn, params = zoo.load_model(cfg.model_name_prefix)
    results = {}

    # --- 1. landmark point-tile hoist A/B ---------------------------------
    # the hoist packs the 12 landmark-independent point-tile rows
    # frame-parallel and splices only 4 rows in-scan (sharding.py landmark
    # branch; SPSVO_LM_HOIST=0 disables it). The env var is read when the
    # program is traced, so each arm rebuilds the program.
    import os
    cfg_lm = dataclasses.replace(cfg_seq, landmark_fusion=True)
    for arm, env in (("hoist_on", "1"), ("hoist_off", "0")):
        os.environ["SPSVO_LM_HOIST"] = env
        fps_lm, d, _ = bench._measure_pipelined(
            build_online_hybrid(apply_fn, cfg_lm),
            (params, images, P_l_j, P_r_j, key), N_FRAMES)
        results[f"landmark_hybrid_fp32_fps_{arm}"] = round(fps_lm, 1)
        print(f"landmark hybrid fp32 [{arm}]: {fps_lm:.1f} FPS "
              f"(inl {np.asarray(d['num_inliers']).mean():.0f})")
    os.environ["SPSVO_LM_HOIST"] = "1"

    # --- 2. device-classic hybrids ----------------------------------------
    for name, dt, res in [
        ("orb_120x392", DetectorType.ORB, (120, 392)),
        ("gftt_120x392", DetectorType.SHI_TOMASI, (120, 392)),
        ("orb_native_375x1242", DetectorType.ORB, (375, 1242)),
    ]:
        c = dataclasses.replace(
            cfg_seq, is_classic=True, device_classic=True,
            detector_type=dt, descriptor_type=DescriptorType.ORB,
            image_height=res[0], image_width=res[1],
            orb_edge_threshold=16 if res[0] <= 200 else 31)
        if res == (120, 392):
            imgs_c, pl, pr = images, P_l_j, P_r_j
        else:
            # native-res corridor render (reuses bench's cache machinery;
            # load with the CLASSIC config `c` — the CNN config's
            # __post_init__ rejects non-multiple-of-8 dims like 375x1242)
            f2, pl2, pr2, _ = bench._load_frames(c)
            imgs_c = jnp.asarray(f2)
            pl, pr = (jnp.asarray(pl2, jnp.float32),
                      jnp.asarray(pr2, jnp.float32))
        fps_c, d, _ = bench._measure_pipelined(
            build_orb_hybrid(c), (None, imgs_c, pl, pr, key), N_FRAMES)
        results[f"device_classic_{name}_fps"] = round(fps_c, 1)
        print(f"device-classic {name}: {fps_c:.1f} FPS "
              f"(inl {np.asarray(d['num_inliers']).mean():.0f})")

    with open("/tmp/round3_tail_results.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))

    # --- 3. full bench refresh --------------------------------------------
    if not flags.skip_bench:
        subprocess.run([sys.executable, "/root/repo/bench.py"], check=False)


if __name__ == "__main__":
    main()
