"""Headline benchmark: end-to-end stereo VO throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": "stereo_vo_fps", "value": N, "unit": "frames/sec",
   "vs_baseline": N / 66.3}

Baseline: the reference's best end-to-end throughput — SuperPoint @ 120x392
on an RTX 2070 laptop, ~66.3 FPS (BASELINE.md; src/odml_visual_odometry/
README.md:46). North-star target: 500 FPS on one v5e chip.

Measured quantity (headline): the FLAGSHIP composed mode
(`presets.flagship_tpu`: bf16 CNN trunk + landmark fusion + bf16 matcher,
ONLINE semantics via `parallel.build_online_hybrid` with the fused Pallas
solver) over 128 REAL-GEOMETRY stereo frames at 120x392 — the full
per-frame pipeline (CNN forward, detector postprocess, descriptor
sampling, 3x matching, chain filter, triangulation x2, 256-hypothesis
RANSAC + polish, LM refinement, landmark fuse/carry, exact sequential
gate/prior semantics, pose chaining). The composition was selected by the
round-5 cross-scene matrix (docs/accuracy_matrix.json): 1.49x the fp32
non-landmark mode's speed AND more accurate on every statistic (mean
drift 2.14% vs 3.05%, ATE 0.301 m vs 0.411 m). The fp32 non-landmark
hybrid — the old headline — stays measured as the first aux row.

Workload (VERDICT r2 weak #1): a 128-frame curved drive through
`eval.synthetic.synthetic_corridor` — ray-cast TRUE stereo with depth
diversity (near high-disparity ground + far low-disparity walls, the
KITTI-like regime) and known ground truth, so the quoted behavioral stats
(inlier counts, prior-winner rate, final drift) are measured on real
geometry, not a constant-disparity plane. Renders are cached under
~/.cache/spsvo_tpu. Aux numbers on stderr: the legacy sample-image
(np.roll disparity) row for continuity, batch throughput mode,
reference-parity config, strict per-frame scan, bf16/int8 trunk variants.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

BASELINE_FPS = 66.3
N_FRAMES = 128


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _load_frames(cfg):
    """Headline workload: 128-frame real-geometry corridor drive.

    Ray-cast true stereo (synthetic_corridor: ground plane + walls, depth
    diversity) on a gently curving trajectory, preprocessed to the config
    resolution. Ground-truth poses returned for the drift aux stat. Renders
    cached on disk — ray casting 128 KITTI-res stereo frames costs ~2 min
    once, ~1 s thereafter."""
    from spsvo_tpu.eval.synthetic import synthetic_corridor
    from spsvo_tpu.ops.image import (preprocess_image_np,
                                     update_projection_matrix_np)

    cache_dir = os.path.expanduser("~/.cache/spsvo_tpu")
    os.makedirs(cache_dir, exist_ok=True)
    cache = os.path.join(
        cache_dir,
        f"bench_corridor_v2_{N_FRAMES}_{cfg.image_height}x{cfg.image_width}"
        ".npz")
    if os.path.exists(cache):
        z = np.load(cache)
        return z["frames"], z["P_l"], z["P_r"], z["gt"]

    rng = np.random.default_rng(42)
    # KITTI-scale motion: 0.35 m/frame forward (~12.6 km/h at 10 Hz) on an
    # S-curve (yaw +0.003 then -0.003 rad/frame) — curvature keeps the
    # constant-velocity prior non-trivially wrong, while the bounded ~2 m
    # lateral deviation keeps the camera INSIDE the axis-aligned corridor
    # (a constant yaw drives through the half_width=6 m wall around frame
    # 90: keypoints collapse and PnP fails on the out-of-scene frames).
    twists = [(np.array([0.0, (0.003 if i < N_FRAMES // 2 else -0.003), 0.0]),
               np.array([0.0, 0.0, 0.35])) for i in range(N_FRAMES - 1)]
    frames_raw, gt_poses, P_l, P_r = synthetic_corridor(
        rng, n_frames=N_FRAMES, h=375, w=1242, twists=twists)
    h0, w0 = frames_raw[0][0].shape
    P_l2 = update_projection_matrix_np(P_l, h0, w0, cfg.image_height,
                                       cfg.image_width)
    P_r2 = update_projection_matrix_np(P_r, h0, w0, cfg.image_height,
                                       cfg.image_width)
    frames = np.stack([
        np.stack([preprocess_image_np(il, cfg.image_height, cfg.image_width),
                  preprocess_image_np(ir, cfg.image_height, cfg.image_width)])
        for il, ir in frames_raw]).astype(np.float32)
    gt = np.stack(gt_poses).astype(np.float32)
    np.savez_compressed(cache, frames=frames,
                        P_l=P_l2.astype(np.float32),
                        P_r=P_r2.astype(np.float32), gt=gt)
    return frames, P_l2.astype(np.float32), P_r2.astype(np.float32), gt


def _load_sample_frames(cfg):
    """Legacy aux workload: the reference's 22 bundled KITTI frames looped to
    N_FRAMES with constant-disparity np.roll stereo (degenerate geometry —
    kept only for throughput continuity with earlier rounds)."""
    import cv2

    from spsvo_tpu.ops.image import (preprocess_image_np,
                                     update_projection_matrix_np)
    img_dir = "/root/reference/src/odml_visual_odometry/sample_images"
    files = sorted(os.listdir(img_dir))
    raw = [cv2.imread(os.path.join(img_dir, f), cv2.IMREAD_GRAYSCALE)
           for f in files]
    P_l = np.array([[718.856, 0, 607.1928, 0.0],
                    [0, 718.856, 185.2157, 0.0],
                    [0, 0, 1.0, 0.0]], np.float32)
    P_r = P_l.copy(); P_r[0, 3] = -386.1448
    h0, w0 = raw[0].shape
    P_l2 = update_projection_matrix_np(P_l, h0, w0, cfg.image_height,
                                       cfg.image_width)
    P_r2 = update_projection_matrix_np(P_r, h0, w0, cfg.image_height,
                                       cfg.image_width)
    pre = [preprocess_image_np(im, cfg.image_height, cfg.image_width)
           for im in raw]
    frames = np.zeros((N_FRAMES, 2, cfg.image_height, cfg.image_width),
                      np.float32)
    for i in range(N_FRAMES):
        im = pre[i % len(pre)]
        frames[i, 0] = im
        frames[i, 1] = np.roll(im, -6, axis=1)  # synthetic disparity
    return frames, P_l2, P_r2


def _drift_str(world, gt_poses) -> str:
    """Accuracy column for a precision-variant aux row: final drift on the
    real-geometry workload (the precision's cost next to its FPS win).
    `world` is the trajectory already fetched by the measurement loop —
    re-running the program just to score it would add a whole-sequence
    dispatch per aux row on the RTT-bound tunnel."""
    try:
        from spsvo_tpu.eval.synthetic import score_trajectory
        world = np.asarray(world)
        acc = score_trajectory([world[i] for i in range(len(world))],
                               [gt_poses[i] for i in range(len(gt_poses))])
        return (f"(corridor drift {acc['final_drift_percent']:.2f}%, "
                f"ATE {acc['ate_m']:.3f} m)")
    except Exception as e:
        return f"(drift aux failed: {e})"


def _measure(fn, args, n_frames, reps=3):
    out = fn(*args)
    np.asarray(out[0])  # compile+run; host fetch is the only reliable sync
    best = float("inf")
    diags = world = None
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        world = np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
        diags = out[1]
    return n_frames / best, diags, world


def _measure_pipelined(fn, args, n_frames, depth=4, reps=3):
    """Sustained throughput: enqueue `depth` async dispatches, sync once.

    A single dispatch+fetch pays the host<->device tunnel RTT (~50 ms here,
    ~0.4 ms/frame at N=128) that a local PCIe/DMA deployment would not; the
    device queue executes calls in order, so fetching the last output bounds
    them all. `_measure` (single-call, RTT included) is kept as an aux row."""
    out = fn(*args)
    np.asarray(out[0])
    best = float("inf")
    diags = world = None
    for _ in range(reps):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(depth)]
        world = np.asarray(outs[-1][0])
        best = min(best, (time.perf_counter() - t0) / depth)
        diags = outs[-1][1]
    return n_frames / best, diags, world


def _probe_tpu(timeout_s: float = 0.0) -> None:
    """Fail fast if the axon tunnel is down.

    When the tunnel drops, `import jax` HANGS at backend init (observed
    2026-08-17/18: a multi-hour outage) — a hung bench gives the driver no
    diagnostics. Probe with a tiny matmul in a SUBPROCESS under a timeout
    (the parent must not import jax before the verdict) and exit non-zero
    with a clear message if the device is unreachable. The probe imports
    spsvo_tpu first so it reuses the persistent XLA cache (the cache dir is
    configured on package import, not by the environment) — without it
    every probe would pay a fresh multi-minute axon compile and a healthy
    tunnel could read as down. In a fresh container the cache is EMPTY, so
    the probe pays the full cold axon compile — observed 19 min on a slow
    2026-08-21 window — hence the generous default; override with
    SPSVO_PROBE_TIMEOUT_S."""
    import subprocess
    if not timeout_s:
        timeout_s = float(os.environ.get("SPSVO_PROBE_TIMEOUT_S", "1500"))
    repo = os.path.dirname(os.path.abspath(__file__))
    code = (f"import sys; sys.path.insert(0, {repo!r});"
            "import spsvo_tpu;"
            "import jax, jax.numpy as jnp, numpy as np;"
            "x = jnp.ones((128,128));"
            "print(float(np.asarray(x @ x)[0,0]))")
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=timeout_s,
                           capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        log(f"TPU probe timed out after {timeout_s:.0f}s: the axon tunnel "
            "is down (backend init hangs). No benchmark numbers can be "
            "produced; see BENCH_NOTES.md for the last recorded run.")
        sys.exit(3)
    if r.returncode != 0:
        log("TPU probe failed:\n" + (r.stderr or "")[-2000:])
        sys.exit(3)


def main():
    _probe_tpu()
    import jax
    import jax.numpy as jnp

    from spsvo_tpu.config import Precision, VOConfig
    from spsvo_tpu.models import zoo
    from spsvo_tpu.parallel.sharding import (build_batch_vo,
                                             build_online_hybrid,
                                             build_orb_hybrid,
                                             build_sequence_scan, make_mesh)

    cfg = VOConfig(model_name_prefix="sp_mbv1", image_height=120,
                   image_width=392, max_keypoints=512, ransac_iterations=256,
                   use_pallas_matcher=True)
    # sequential-mode tuning: one exhaustive RANSAC batch and a fixed
    # unrolled LM — every while/scan iteration costs ~0.27 ms of fixed
    # runtime overhead on this TPU (BENCH_NOTES.md), so sequential paths
    # minimise iteration counts, not FLOPs. Accuracy pinned by
    # tests/test_parallel.py::test_online_hybrid_tuned_config_accuracy.
    # use_pallas_solver: the whole prior-dependent solve (RANSAC scoring,
    # winner, refit, polish, LM, gates) is ONE Pallas kernel per frame —
    # the sequential scan is dispatch-bound, not FLOP-bound (521 -> 751 FPS
    # fp32 online, identical trajectories to the XLA path).
    cfg_seq = dataclasses.replace(cfg, ransac_chunk=0, lm_unroll=6,
                                  solve_slots=128, use_pallas_solver=True)
    frames, P_l2, P_r2, gt_poses = _load_frames(cfg)
    mesh = make_mesh()
    key = jax.random.PRNGKey(0)
    images = jnp.asarray(frames)
    P_l_j = jnp.asarray(P_l2, jnp.float32)
    P_r_j = jnp.asarray(P_r2, jnp.float32)

    # ---- headline: the FLAGSHIP composed mode (presets.flagship_tpu) ------
    # bf16 CNN trunk + landmark fusion + bf16 matcher, ONLINE semantics,
    # fused Pallas solver — selected by the round-5 cross-scene matrix
    # (docs/accuracy_matrix.json): faster than the fp32 non-landmark mode
    # AND more accurate on every statistic.
    apply_fn, params = zoo.load_model(cfg.model_name_prefix)
    apply16, params16 = zoo.load_model(cfg.model_name_prefix, jnp.bfloat16)
    cfg_flag = dataclasses.replace(cfg_seq, precision=Precision.BF16,
                                   landmark_fusion=True, matcher_bf16=True)
    t0 = time.perf_counter()
    flag_fn = build_online_hybrid(apply16, cfg_flag)
    args_f = (params16, images, P_l_j, P_r_j, key)
    fps, diags, world_h = _measure_pipelined(flag_fn, args_f, N_FRAMES)
    log(f"FLAGSHIP online-hybrid bf16+landmark+mbf16 (sustained, headline): "
        f"{fps:.1f} FPS "
        f"(compile+reps {time.perf_counter()-t0:.0f}s, "
        f"mean inliers {np.asarray(diags['num_inliers']).mean():.0f})")
    # behavioral stats on the real-geometry workload (VERDICT r2 weak #1)
    try:
        from spsvo_tpu.eval.synthetic import score_trajectory
        world = world_h
        acc = score_trajectory([world[i] for i in range(len(world))],
                               [gt_poses[i] for i in range(len(gt_poses))])
        pw = diags.get("prior_winner")
        pw_pct = (100.0 * np.asarray(pw).mean()) if pw is not None else None
        log(f"corridor accuracy: final drift {acc['final_drift_percent']:.2f}%"
            f" over {acc['path_length_m']:.1f} m, ATE {acc['ate_m']:.3f} m"
            + (f"; prior beats sampled hypotheses on {pw_pct:.0f}% of frames"
               if pw_pct is not None else ""))
    except Exception as e:
        log(f"corridor accuracy aux failed: {e}")
    fps_1call, _, _ = _measure(flag_fn, args_f, N_FRAMES, reps=3)
    log(f"flagship online-hybrid (single call incl. tunnel RTT): "
        f"{fps_1call:.1f} FPS")

    # ---- aux: fp32 non-landmark online-hybrid (the pre-round-5 headline) --
    args_h = (params, images, P_l_j, P_r_j, key)
    try:
        t0 = time.perf_counter()
        hyb_fn = build_online_hybrid(apply_fn, cfg_seq)
        fps_f32, diags_f32, w_f32 = _measure_pipelined(hyb_fn, args_h,
                                                       N_FRAMES)
        log(f"online-hybrid fp32 (sustained): {fps_f32:.1f} FPS "
            f"(compile+reps {time.perf_counter()-t0:.0f}s, "
            f"mean inliers {np.asarray(diags_f32['num_inliers']).mean():.0f})"
            f" " + _drift_str(w_f32, gt_poses))
    except Exception as e:
        log(f"fp32 hybrid aux run failed: {e}")

    # ---- aux: legacy sample-image workload (constant-disparity stereo) ----
    try:
        sf, sP_l, sP_r = _load_sample_frames(cfg)
        fps_s, diags_s, _ = _measure_pipelined(
            hyb_fn, (params, jnp.asarray(sf), jnp.asarray(sP_l, jnp.float32),
                     jnp.asarray(sP_r, jnp.float32), key), N_FRAMES)
        log(f"online-hybrid fp32 on legacy sample-image workload: "
            f"{fps_s:.1f} FPS "
            f"(mean inliers {np.asarray(diags_s['num_inliers']).mean():.0f})")
    except Exception as e:
        log(f"sample-image aux run failed: {e}")

    # ---- aux: batch throughput mode (relaxed prior, gates post-scan) ------
    try:
        t0 = time.perf_counter()
        batch_fn = build_batch_vo(apply_fn, cfg, mesh)
        fps_b, diags_b, _ = _measure_pipelined(
            batch_fn, (params, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"throughput fp32 (sustained): {fps_b:.1f} FPS "
            f"(compile+reps {time.perf_counter()-t0:.0f}s, "
            f"mean inliers {np.asarray(diags_b['num_inliers']).mean():.0f})")
    except Exception as e:
        log(f"batch throughput aux run failed: {e}")

    # ---- aux: reference-parity settings (VERDICT r1 #4) -------------------
    # the reference runs 500 RANSAC iterations (feature_detection_base.cpp:
    # 237-239) and caps keypoints at 1000 (feature_detection.hpp:368); the
    # tuned headline uses 256/512. Measure the parity config too — the
    # adaptive-confidence loop keeps the 500-iteration budget cheap.
    try:
        cfg_par = dataclasses.replace(cfg, ransac_iterations=500,
                                      max_keypoints=1024, solve_slots=1024)
        par_fn = build_batch_vo(apply_fn, cfg_par, mesh)
        fps_par, diags_par, _ = _measure(
            par_fn, (params, images, P_l_j, P_r_j, key), N_FRAMES, reps=3)
        log(f"throughput fp32 parity(ransac500,K1024): {fps_par:.1f} FPS "
            f"(mean inliers {np.asarray(diags_par['num_inliers']).mean():.0f})")
        # parity settings in the FAITHFUL mode: online hybrid + fused solver,
        # 500 exhaustive hypotheses, no chain compaction
        cfg_par_on = dataclasses.replace(
            cfg_par, ransac_chunk=0, lm_unroll=6, use_pallas_solver=True)
        par_on = build_online_hybrid(apply_fn, cfg_par_on)
        fps_po, diags_po, _ = _measure_pipelined(
            par_on, (params, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"ONLINE-hybrid fp32 parity(ransac500,K1024,slots1024): "
            f"{fps_po:.1f} FPS "
            f"(mean inliers {np.asarray(diags_po['num_inliers']).mean():.0f})")
    except Exception as e:
        log(f"parity aux run failed: {e}")

    # ---- aux: strict per-frame sequential scan (whole step in the scan) ---
    try:
        seq_fn = build_sequence_scan(apply_fn, cfg_seq)
        fps_online, _, _ = _measure(
            seq_fn, (params, images, P_l_j, P_r_j, key), N_FRAMES, reps=2)
        log(f"online-sequential fp32: {fps_online:.1f} FPS")
    except Exception as e:
        log(f"online aux run failed: {e}")

    # ---- aux: bf16 trunk (the reference's FP16-engine counterpart) -------
    try:
        cfg16 = dataclasses.replace(cfg, precision=Precision.BF16)
        b16 = build_batch_vo(apply16, cfg16, mesh)
        fps16, _, _ = _measure_pipelined(
            b16, (params16, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"throughput bf16 (sustained): {fps16:.1f} FPS")
        h16 = build_online_hybrid(
            apply16, dataclasses.replace(cfg_seq, precision=Precision.BF16))
        fps_h16, _, w16 = _measure_pipelined(
            h16, (params16, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"online-hybrid bf16 (sustained): {fps_h16:.1f} FPS "
            + _drift_str(w16, gt_poses))
    except Exception as e:
        log(f"bf16 aux run failed: {e}")

    # ---- aux: int8 trunk with static calibrated activation scales ---------
    # calibration frames are spread across the drive (every 8th of 128).
    # NOTE (round 5): int8 end-to-end drift is chaotically sensitive to
    # the exact scale values — a 0.5% nudge of ONE activation scale moves
    # a drive's drift 6.8% -> 2.1% (BENCH_NOTES round-5 int8 section) —
    # so the int8 FPS row is robust but its drift column is a sample from
    # a heavy-tailed distribution, which is why bf16 is the flagship trunk.
    try:
        calib = frames[::8][:16].reshape(-1, cfg.image_height,
                                         cfg.image_width)[..., None]
        apply8, params8 = zoo.load_model(cfg.model_name_prefix, int8=True,
                                         int8_calibration=calib)
        cfg8 = dataclasses.replace(cfg, precision=Precision.INT8)
        b8 = build_batch_vo(apply8, cfg8, mesh)
        fps8, _, _ = _measure_pipelined(
            b8, (params8, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"throughput int8 static-calibrated (sustained): {fps8:.1f} FPS")
        h8 = build_online_hybrid(
            apply8, dataclasses.replace(cfg_seq, precision=Precision.INT8))
        fps_h8, _, w8 = _measure_pipelined(
            h8, (params8, images, P_l_j, P_r_j, key), N_FRAMES)
        log(f"online-hybrid int8 (sustained): {fps_h8:.1f} FPS "
            + _drift_str(w8, gt_poses))
    except Exception as e:
        log(f"int8 aux run failed: {e}")

    # ---- aux: landmark-fusion accuracy mode (beyond reference) ------------
    # carried per-track fused 3D landmarks replace per-frame re-triangulation
    # (docs/landmark_matrix.json: multi-drive drift matrix). Same online
    # gate/prior semantics; the carried LandmarkState joins the scan.
    try:
        cfg_lm = dataclasses.replace(cfg_seq, landmark_fusion=True)
        hlm = build_online_hybrid(apply_fn, cfg_lm)
        fps_lm, diags_lm, w_lm = _measure_pipelined(hlm, args_h, N_FRAMES)
        log(f"online-hybrid fp32 + landmark fusion (sustained): "
            f"{fps_lm:.1f} FPS "
            f"(mean inliers {np.asarray(diags_lm['num_inliers']).mean():.0f}) "
            + _drift_str(w_lm, gt_poses))
    except Exception as e:
        log(f"landmark aux run failed: {e}")

    # ---- aux: composed int8 trunk + landmark fusion -----------------------
    # the precision ladder and the accuracy mode compose freely (the geometry
    # solve stays fp32 in all trunk precisions): int8 speed at
    # landmark-fusion accuracy (BENCH_NOTES.md round-3 table).
    try:
        cfg_lm8 = dataclasses.replace(cfg_seq, landmark_fusion=True,
                                      precision=Precision.INT8)
        hlm8 = build_online_hybrid(apply8, cfg_lm8)
        args_lm8 = (params8, images, P_l_j, P_r_j, key)
        fps_lm8, diags_lm8, w_lm8 = _measure_pipelined(hlm8, args_lm8,
                                                       N_FRAMES)
        log(f"online-hybrid int8 + landmark fusion (sustained): "
            f"{fps_lm8:.1f} FPS "
            f"(mean inliers "
            f"{np.asarray(diags_lm8['num_inliers']).mean():.0f}) "
            + _drift_str(w_lm8, gt_poses))
    except Exception as e:
        log(f"int8+landmark aux run failed: {e}")

    # ---- aux: device-resident classic modes (TPU-native front ends) -------
    # the reference's classic ORB/ORB config ran 11.6 FPS on the RTX 2070
    # laptop (BASELINE.md) AT NATIVE RESOLUTION (visual_odometry_classic.
    # launch: image_height=0) — so the device-classic rows are measured at
    # native 375x1242, the regime classic features actually work in (at
    # 120x392 even host cv2.ORB drifts 35%, docs/device_classic_matrix.
    # json). ops/orb.py moves detection onto the TPU so the classic
    # pipeline has zero per-frame host work; the BRISK ring-pattern
    # descriptor (60 samples/keypoint vs steered-BRIEF's 512) is the
    # fastest AND most accurate classic config.
    try:
        from spsvo_tpu.config import DescriptorType, DetectorType
        cfg_nat = dataclasses.replace(
            cfg_seq, is_classic=True, device_classic=True,
            detector_type=DetectorType.ORB,
            descriptor_type=DescriptorType.ORB,
            image_height=375, image_width=1242, orb_edge_threshold=31)
        fr_n, pl_n, pr_n, gt_n = _load_frames(cfg_nat)
        args_n = (None, jnp.asarray(fr_n), jnp.asarray(pl_n, jnp.float32),
                  jnp.asarray(pr_n, jnp.float32), key)
        for desc_t, name in ((DescriptorType.ORB, "ORB"),
                             (DescriptorType.BRISK, "BRISK")):
            cfg_o = dataclasses.replace(cfg_nat, descriptor_type=desc_t)
            fps_o, diags_o, w_o = _measure_pipelined(
                build_orb_hybrid(cfg_o), args_n, N_FRAMES)
            log(f"device-{name} classic hybrid @375x1242 (sustained): "
                f"{fps_o:.1f} FPS (mean inliers "
                f"{np.asarray(diags_o['num_inliers']).mean():.0f}) "
                + _drift_str(w_o, gt_n))
    except Exception as e:
        log(f"device-classic aux run failed: {e}")

    print(json.dumps({
        "metric": "stereo_vo_fps",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
