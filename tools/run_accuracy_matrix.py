"""Generator for docs/accuracy_matrix.json (VERDICT r4 item 2).

The cross-scene precision/mode accuracy matrix: BOTH synthetic scene
families (S-curve corridor + urban block world) x >=3 drives x 3 PRNG keys
x the full setting ladder:

  * fp32        — the headline online-hybrid config
  * bf16        — bf16 CNN trunk (the reference's FP16-engine counterpart,
                  engine_generation.py:27-31)
  * int8        — static-calibrated int8 trunk
  * fp32_mbf16  — fp32 trunk with cfg.matcher_bf16 (bf16 descriptor
                  matmuls, fp32 accumulation) — the matcher-precision A/B
                  (VERDICT r4 item 9)
  * landmark    — fp32 + landmark fusion (the beyond-reference accuracy
                  mode, docs/landmark_matrix.json)

Every setting also gets ONE sustained-FPS measurement on the 128-frame
bench drive (bench._measure_pipelined — same basis as the headline), so
the drift ladder and the speed ladder live in one artifact.

The reference's counterpart is its accuracy-vs-config study (report §4.2,
KITTI translation%/rotation scored per config); scene-family cross-checks
replace KITTI (no data in-container, SURVEY §6 note) per VERDICT r3 item 4.

Usage:  python tools/run_accuracy_matrix.py [--frames 96] [--drives 3]
          [--keys 3] [--scenes corridor,blocks] [--settings fp32,bf16,...]
          [--skip-fps]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from run_landmark_matrix import DRIVE_SEEDS, load_drive  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--drives", type=int, default=3)
    ap.add_argument("--keys", type=int, default=3)
    ap.add_argument("--scenes", default="corridor,blocks")
    ap.add_argument("--settings", default="")
    ap.add_argument("--skip-fps", action="store_true")
    ap.add_argument("--out", default="docs/accuracy_matrix.json")
    args = ap.parse_args()
    scenes = [s.strip() for s in args.scenes.split(",") if s.strip()]

    import jax
    import jax.numpy as jnp

    import spsvo_tpu  # noqa: F401
    import bench
    from spsvo_tpu.config import Precision, VOConfig
    from spsvo_tpu.eval.synthetic import score_trajectory
    from spsvo_tpu.models import zoo
    from spsvo_tpu.parallel.sharding import build_online_hybrid

    base = VOConfig(model_name_prefix="sp_mbv1", image_height=120,
                    image_width=392, max_keypoints=512,
                    ransac_iterations=256, use_pallas_matcher=True,
                    ransac_chunk=0, lm_unroll=6, solve_slots=128,
                    use_pallas_solver=True)
    apply32, params32 = zoo.load_model(base.model_name_prefix)
    apply16, params16 = zoo.load_model(base.model_name_prefix, jnp.bfloat16)
    # int8 calibration: 16 frames spread across the seed-42 corridor drive
    # (every 6th of 96). NOTE: the calibration recipe barely moves the
    # scales (first-8 vs spread-16 vs L-only agree within 1%), yet int8
    # end-to-end drift is chaotically sensitive to those last-percent
    # differences (0.27% vs 6.84% on the same drive; one scale nudged
    # 0.5% moves drift 6.8 -> 2.1 — BENCH_NOTES round-5 int8 section).
    # The int8 rows are therefore samples from a heavy-tailed
    # distribution; read the summary's max/median, not single rows.
    cal_frames, _, _, _ = load_drive(DRIVE_SEEDS[0], 96, base,
                                     scene="corridor")
    calib = cal_frames[::6][:16].reshape(-1, base.image_height,
                                         base.image_width)[..., None]
    apply8, params8 = zoo.load_model(base.model_name_prefix, int8=True,
                                     int8_calibration=calib)

    settings = {
        "fp32": (base, apply32, params32),
        "bf16": (dataclasses.replace(base, precision=Precision.BF16),
                 apply16, params16),
        "int8": (dataclasses.replace(base, precision=Precision.INT8),
                 apply8, params8),
        "fp32_mbf16": (dataclasses.replace(base, matcher_bf16=True),
                       apply32, params32),
        "landmark": (dataclasses.replace(base, landmark_fusion=True),
                     apply32, params32),
        # composed candidates for the flagship default: the matrix showed
        # bf16 both faster (1.53x) and no less accurate than fp32, and
        # landmark fusion the best accuracy mode on BOTH scene families —
        # measure the compositions before flipping presets.flagship_tpu
        "bf16_landmark": (dataclasses.replace(
            base, precision=Precision.BF16, landmark_fusion=True),
            apply16, params16),
        "bf16_lm_mbf16": (dataclasses.replace(
            base, precision=Precision.BF16, landmark_fusion=True,
            matcher_bf16=True),
            apply16, params16),
        # int8 compositions with the spread calibration — measured after
        # the round-5 finding that the int8 drift tail was a
        # calibration-coverage artifact, to see whether the fastest trunk
        # can also be accuracy-par end to end
        "int8_landmark": (dataclasses.replace(
            base, precision=Precision.INT8, landmark_fusion=True),
            apply8, params8),
        "int8_lm_mbf16": (dataclasses.replace(
            base, precision=Precision.INT8, landmark_fusion=True,
            matcher_bf16=True),
            apply8, params8),
    }
    if args.settings:
        keep = {s.strip() for s in args.settings.split(",")}
        settings = {k: v for k, v in settings.items() if k in keep}

    fns = {name: build_online_hybrid(af, cfg)
           for name, (cfg, af, _) in settings.items()}

    out_doc = {"config": {
        "frames": args.frames, "drives": args.drives, "keys": args.keys,
        "scenes": scenes,
        "resolution": f"{base.image_height}x{base.image_width}",
        "model": base.model_name_prefix,
        "int8_calibration": "16 frames spread across corridor drive seed "
                            f"{DRIVE_SEEDS[0]} (every 6th of 96; 99.9-"
                            "percentile clipping, models/zoo.py)",
        "fps_basis": "bench drive (128-frame corridor seed 42), "
                     "bench._measure_pipelined depth=4 best-of-3",
        "generator": "tools/run_accuracy_matrix.py",
    }, "summary": {}, "fps": {}, "rows": {}}

    def save():
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out_doc, f, indent=1)

    results: dict = {}
    for scene in scenes:
        for seed in DRIVE_SEEDS[:args.drives]:
            frames, P_l, P_r, gt = load_drive(seed, args.frames, base,
                                              scene=scene)
            images = jnp.asarray(frames)
            Pl = jnp.asarray(P_l, jnp.float32)
            Pr = jnp.asarray(P_r, jnp.float32)
            for name, (cfg, af, params) in settings.items():
                for ki in range(args.keys):
                    t0 = time.time()
                    try:
                        world, diag = fns[name](params, images, Pl, Pr,
                                                jax.random.PRNGKey(ki))
                        world = np.asarray(world)
                    except Exception as e:  # record, keep the grid going
                        msg = str(e).splitlines()[0][:300]
                        results.setdefault(name, []).append({
                            "scene": scene, "drive": seed, "setting": name,
                            "key": ki, "error": msg})
                        print(f"{scene} d{seed} {name} k{ki}: ERROR {msg}",
                              flush=True)
                        out_doc["rows"] = results
                        save()
                        break  # same failure for every key of this setting
                    acc = score_trajectory(
                        [world[i] for i in range(len(world))],
                        [gt[i] for i in range(len(gt))])
                    row = {
                        "scene": scene, "drive": seed, "setting": name,
                        "key": ki,
                        "drift_pct": round(acc["final_drift_percent"], 3),
                        "ate_m": round(acc["ate_m"], 4),
                        "rpe_trans_m": round(acc["rpe_trans_rmse_m"], 4),
                        "rpe_rot_deg": round(acc["rpe_rot_rmse_deg"], 4),
                        "path_m": round(acc["path_length_m"], 1),
                        "mean_inliers": round(float(np.asarray(
                            diag["num_inliers"]).mean()), 1),
                        "wall_s": round(time.time() - t0, 1),
                    }
                    results.setdefault(name, []).append(row)
                    print(f"{scene} d{seed} {name} k{ki}: "
                          f"drift {row['drift_pct']}% "
                          f"ate {row['ate_m']} ({row['wall_s']}s)",
                          flush=True)
                out_doc["rows"] = results
                save()

    for name, rows in results.items():
        rows = [r for r in rows if "drift_pct" in r]
        if not rows:
            out_doc["summary"][name] = {"error": "all runs failed"}
            continue
        s = {"mean_drift_pct": round(float(np.mean(
                [r["drift_pct"] for r in rows])), 3),
             "median_drift_pct": round(float(np.median(
                [r["drift_pct"] for r in rows])), 3),
             "max_drift_pct": round(float(np.max(
                [r["drift_pct"] for r in rows])), 3),
             "mean_ate_m": round(float(np.mean(
                [r["ate_m"] for r in rows])), 4),
             "n_runs": len(rows)}
        for scene in {r["scene"] for r in rows}:
            sd = [r["drift_pct"] for r in rows if r["scene"] == scene]
            s[f"{scene}_mean_drift_pct"] = round(float(np.mean(sd)), 3)
        out_doc["summary"][name] = s
    save()

    if not args.skip_fps:
        cfgb = dataclasses.replace(base, image_height=120, image_width=392)
        bf, bP_l, bP_r, _ = bench._load_frames(cfgb)
        bi = jnp.asarray(bf)
        bPl = jnp.asarray(bP_l, jnp.float32)
        bPr = jnp.asarray(bP_r, jnp.float32)
        for name, (cfg, af, params) in settings.items():
            try:
                fps, _, _ = bench._measure_pipelined(
                    fns[name], (params, bi, bPl, bPr,
                                jax.random.PRNGKey(0)), bench.N_FRAMES)
                out_doc["fps"][name] = round(fps, 1)
                print(f"fps {name}: {fps:.1f}", flush=True)
            except Exception as e:
                out_doc["fps"][name] = f"error: {str(e).splitlines()[0][:200]}"
            save()

    print("\n| setting | mean drift % | median | max | mean ATE m | FPS |")
    print("|---|---|---|---|---|---|")
    for name, s in out_doc["summary"].items():
        print(f"| {name} | {s['mean_drift_pct']} | {s['median_drift_pct']} "
              f"| {s['max_drift_pct']} | {s['mean_ate_m']} "
              f"| {out_doc['fps'].get(name, '-')} |")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
