"""Stereo odometry solve: match-chain filtering, triangulation, RANSAC,
anomaly gates, LM refinement — one fused on-device stage.

TPU-native re-design of FeatureFrontEnd::solveStereoOdometry
(src/odml_visual_odometry/src/feature_detection_base.cpp:125-399). The
reference's dynamic filter loop (:156-207) becomes boolean-mask composition
over fixed-capacity aligned arrays; its sequential OpenCV/Ceres solves become
the batched kernels in `pnp.py` / `lm.py`.

Chain filter, per current-left keypoint i (reference :156-207):
  kept iff  stereo_map[i] != -1                  (curr stereo matched)
        and interframe_map[i] != -1              (curr->prev left matched)
        and |y_cl - y_cr| <= stereo_threshold    (epipolar gate, :169-171)
        and |x_cl - x_cr| >= min_disparity
        and prev_stereo_map[interframe_map[i]] != -1   (:181)

Gates (reference :241-272 and feature_detection.hpp:145-147):
  * PnP failure  -> reuse predicted motion;
  * acceleration ||t - t_pred|| / dt > max_acceleration after
    `ignore_frame_count` frames -> reuse predicted motion;
  * otherwise update the constant-velocity prior with the raw PnP pose
    (the reference updates before refinement, :269-271 — mirrored).

Output is cam0_curr_T_cam0_prev = (prev_T_curr)^-1 (:377-385).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from spsvo_tpu.config import VOConfig
from spsvo_tpu.geometry import se3
from spsvo_tpu.ops import lm, pnp
from spsvo_tpu.ops.triangulation import triangulate


class SolveInputs(NamedTuple):
    """Aligned per-current-left-keypoint arrays, capacity K."""

    xy_curr_l: jax.Array      # (K, 2)
    xy_curr_r: jax.Array      # (K, 2) gathered via stereo_map
    xy_prev_l: jax.Array      # (K, 2) gathered via interframe_map
    xy_prev_r: jax.Array      # (K, 2) gathered via prev chain
    chain_valid: jax.Array    # (K,) bool


class SolveResult(NamedTuple):
    q: jax.Array              # (4,) prev_T_curr after gates+refinement
    t: jax.Array              # (3,)
    T_curr_prev: jax.Array    # (4, 4) odometry output transform
    q_pred: jax.Array         # updated motion prior
    t_pred: jax.Array
    chain_valid: jax.Array    # (K,) post-matching filter survivors
    inliers: jax.Array        # (K,) PnP inlier mask (on chain slots)
    num_chain: jax.Array
    num_inliers: jax.Array
    pnp_success: jax.Array
    accel_anomaly: jax.Array
    lm_improved: jax.Array
    n_ransac_hypotheses: jax.Array   # evaluated before adaptive exit


def build_chain(xy_curr_l, xy_curr_r, valid_curr_l, valid_curr_r,
                xy_prev_l, xy_prev_r, valid_prev_l, valid_prev_r,
                stereo_map, interframe_map, prev_stereo_map,
                stereo_threshold: float, min_disparity: float
                ) -> SolveInputs:
    """Compose the reference's filter chain as masked gathers."""
    s_idx = jnp.maximum(stereo_map, 0)
    f_idx = jnp.maximum(interframe_map, 0)
    uv_cr = xy_curr_r[s_idx]
    uv_pl = xy_prev_l[f_idx]
    prev_r_map = prev_stereo_map[f_idx]
    pr_idx = jnp.maximum(prev_r_map, 0)
    uv_pr = xy_prev_r[pr_idx]

    dy = jnp.abs(xy_curr_l[:, 1] - uv_cr[:, 1])
    disp = jnp.abs(xy_curr_l[:, 0] - uv_cr[:, 0])
    chain = (valid_curr_l
             & (stereo_map >= 0) & valid_curr_r[s_idx]
             & (interframe_map >= 0) & valid_prev_l[f_idx]
             & (dy <= stereo_threshold) & (disp >= min_disparity)
             & (prev_r_map >= 0) & valid_prev_r[pr_idx])
    return SolveInputs(xy_curr_l, uv_cr, uv_pl, uv_pr, chain)


def solve_stereo_odometry(key: jax.Array, inputs: SolveInputs,
                          P_l: jax.Array, P_r: jax.Array, q_pred: jax.Array,
                          t_pred: jax.Array, frame_count: jax.Array,
                          cfg: VOConfig) -> SolveResult:
    """Full geometric solve for one frame. Everything fixed-shape under jit."""
    chain = inputs.chain_valid

    pts3d_curr = triangulate(P_l, P_r, inputs.xy_curr_l, inputs.xy_curr_r)
    pts3d_prev = triangulate(P_l, P_r, inputs.xy_prev_l, inputs.xy_prev_r)
    # guard NaN/degenerate triangulations out of the chain
    finite = (jnp.all(jnp.isfinite(pts3d_curr), axis=-1)
              & jnp.all(jnp.isfinite(pts3d_prev), axis=-1))
    chain = chain & finite
    pts3d_curr = jnp.where(chain[:, None], pts3d_curr, 0.0)
    pts3d_prev = jnp.where(chain[:, None], pts3d_prev, 0.0)

    res = pnp.ransac_pose(
        key, pts3d_curr, pts3d_prev, inputs.xy_prev_l, chain, P_l,
        q_pred, t_pred, iterations=cfg.ransac_iterations,
        reproj_threshold=cfg.ransac_reproj_threshold,
        min_inliers=cfg.ransac_min_inliers,
        confidence=cfg.ransac_confidence)

    # acceleration anomaly gate (reference :241-260)
    accel = jnp.linalg.norm(res.t - t_pred) / cfg.time_interval
    accel_anomaly = ((frame_count > cfg.ignore_frame_count)
                     & (accel > cfg.max_acceleration))
    use_pred = (~res.success) | accel_anomaly

    q = jnp.where(use_pred, q_pred, res.q)
    t = jnp.where(use_pred, t_pred, res.t)
    do_optimize = ~use_pred

    # prior update with the raw PnP pose (reference :269-271)
    q_pred_new = jnp.where(do_optimize, res.q, q_pred)
    t_pred_new = jnp.where(do_optimize, res.t, t_pred)

    lm_improved = jnp.asarray(False)
    if cfg.refinement_degree > 0:
        refined = lm.refine_pose(
            q, t, pts3d_curr, pts3d_prev, inputs.xy_prev_l, inputs.xy_prev_r,
            inputs.xy_curr_l, inputs.xy_curr_r,
            res.inliers & do_optimize, P_l, P_r,
            refinement_degree=cfg.refinement_degree,
            max_iterations=cfg.lm_max_iterations,
            huber_delta=cfg.huber_delta)
        q = jnp.where(do_optimize, refined.q, q)
        t = jnp.where(do_optimize, refined.t, t)
        lm_improved = refined.improved & do_optimize

    T_prev_curr = se3.make_transform(q, t)
    T_curr_prev = se3.invert_transform(T_prev_curr)

    return SolveResult(
        q=q, t=t, T_curr_prev=T_curr_prev,
        q_pred=q_pred_new, t_pred=t_pred_new,
        chain_valid=chain, inliers=res.inliers,
        num_chain=jnp.sum(chain).astype(jnp.int32),
        num_inliers=res.num_inliers,
        pnp_success=res.success, accel_anomaly=accel_anomaly,
        lm_improved=lm_improved, n_ransac_hypotheses=res.n_hypotheses)
