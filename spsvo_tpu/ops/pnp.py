"""Robust pose estimation: batched-hypothesis RANSAC + on-device polish.

TPU-native replacement for cv::solvePnPRansac(USAC_ACCURATE)
(src/odml_visual_odometry/src/feature_detection_base.cpp:237-239). The
reference's adaptive sequential RANSAC does not map to SIMD hardware, so the
design is re-shaped rather than translated:

  * every hypothesis is one lane of a batch: S minimal 3-point samples are
    drawn at once, solved in closed form (Kabsch/Umeyama alignment of the
    triangulated current-frame points to the triangulated previous-frame
    points — stereo VO gives us 3D on both sides, which is cheaper and
    better-conditioned on TPU than per-hypothesis P3P root-finding);
  * scoring matches the reference: 2D reprojection error of the CURRENT-frame
    3D points into the PREVIOUS left image, inlier iff err < threshold px;
  * the motion prior (r_vec_pred/t_vec_pred, useExtrinsicGuess=true at :232-239)
    is injected as one extra hypothesis lane;
  * the winner is re-fit on its inliers (Kabsch) and polished with a few
    Gauss-Newton steps on the reprojection cost — the role USAC's local
    optimisation plays.

Returned transform maps current-frame points into the previous camera frame
(x_prev = R x_curr + t), i.e. prev_T_curr — the same convention as the
reference's solved rvec/tvec, which the caller inverts for the odometry
output (:377-385).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from spsvo_tpu.geometry import se3
from spsvo_tpu.ops.triangulation import project


class PnPResult(NamedTuple):
    q: jax.Array          # (4,) xyzw, prev_T_curr rotation
    t: jax.Array          # (3,)
    inliers: jax.Array    # (K,) bool
    num_inliers: jax.Array  # scalar int32
    success: jax.Array    # scalar bool


def _horn(src: jax.Array, dst: jax.Array, w: jax.Array, iters: int = 16
          ) -> Tuple[jax.Array, jax.Array]:
    """Weighted rigid alignment dst ≈ R src + t via Horn's quaternion method.

    The optimal quaternion is the dominant eigenvector of a 4x4 symmetric
    matrix built from the cross-covariance; computed with a shifted power
    iteration — batched 4x4 matvecs only, no SVD/eigh kernels. ~10x faster
    than batched 3x3 SVD on TPU for the RANSAC hypothesis batch, and it
    handles reflections correctly by construction.

    src, dst: (..., N, 3); w: (..., N). Returns (q_xyzw (..., 4), t (..., 3)).
    """
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1e-9)
    wn = w / wsum
    c_src = jnp.sum(src * wn[..., None], axis=-2)
    c_dst = jnp.sum(dst * wn[..., None], axis=-2)
    src0 = src - c_src[..., None, :]
    dst0 = dst - c_dst[..., None, :]
    H = jnp.einsum("...ni,...nj,...n->...ij", src0, dst0, wn)

    sxx, sxy, sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    syx, syy, syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    szx, szy, szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    N = jnp.stack([
        sxx + syy + szz, syz - szy, szx - sxz, sxy - syx,
        syz - szy, sxx - syy - szz, sxy + syx, szx + sxz,
        szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy,
        sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz,
    ], axis=-1).reshape(H.shape[:-2] + (4, 4))

    # shift to make the target eigenvalue dominant in magnitude
    sigma = 2.0 * jnp.linalg.norm(H, axis=(-2, -1))[..., None, None] + 1e-9
    Ns = N + sigma * jnp.eye(4, dtype=N.dtype)
    v = jnp.ones(N.shape[:-2] + (4,), N.dtype)
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", Ns, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)
    # Horn's quaternion is (w, x, y, z); convert to xyzw
    q = jnp.concatenate([v[..., 1:], v[..., :1]], axis=-1)
    R = se3.quat_to_matrix(q)
    t = c_dst - jnp.einsum("...ij,...j->...i", R, c_src)
    return q, t


def _sample_indices(key: jax.Array, valid: jax.Array, num_hyp: int,
                    sample_size: int) -> jax.Array:
    """(num_hyp, sample_size) indices drawn from valid slots.

    Gumbel-top-k over the validity mask: one fused sort instead of
    sequential rejection sampling. Distinct indices per hypothesis.
    """
    k = valid.shape[0]
    logits = jnp.where(valid, 0.0, -jnp.inf)
    g = jax.random.gumbel(key, (num_hyp, k))
    _, idx = jax.lax.top_k(logits[None, :] + g, sample_size)
    return idx


def ransac_pose(key: jax.Array, pts3d_curr: jax.Array, pts3d_prev: jax.Array,
                pts2d_prev: jax.Array, valid: jax.Array, P_l: jax.Array,
                q_prior: jax.Array, t_prior: jax.Array, *,
                iterations: int = 500, reproj_threshold: float = 2.0,
                min_inliers: int = 6) -> PnPResult:
    """RANSAC over 3-point rigid hypotheses, scored by 2D reprojection.

    pts3d_curr: (K, 3) triangulated in the current left-cam frame.
    pts3d_prev: (K, 3) triangulated in the previous left-cam frame.
    pts2d_prev: (K, 2) previous-left pixels (scoring observations).
    valid:      (K,) chain-filter mask.
    P_l:        (3, 4) left projection matrix (current intrinsics).
    q/t_prior:  constant-velocity prior, injected as an extra hypothesis.
    """
    K = pts3d_curr.shape[0]
    k_samp, _ = jax.random.split(key)
    idx = _sample_indices(k_samp, valid, iterations, 3)   # (S, 3)

    src = pts3d_curr[idx]                                  # (S, 3, 3)
    dst = pts3d_prev[idx]
    w = jnp.ones(idx.shape, jnp.float32)
    q_h, t_h = _horn(src, dst, w)                          # (S,4), (S,3)
    R_h = se3.quat_to_matrix(q_h)

    # prior hypothesis lane
    R_p = se3.quat_to_matrix(q_prior)
    R_all = jnp.concatenate([R_h, R_p[None]], axis=0)
    t_all = jnp.concatenate([t_h, t_prior[None]], axis=0)

    # score: reproject all K current points into prev-left for each hypothesis
    Xp = jnp.einsum("sij,kj->ski", R_all, pts3d_curr) + t_all[:, None, :]
    Xh = jnp.concatenate([Xp, jnp.ones_like(Xp[..., :1])], axis=-1)
    uvw = jnp.einsum("ij,skj->ski", P_l.astype(jnp.float32), Xh)
    z = uvw[..., 2:3]
    uv = uvw[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)
    err2 = jnp.sum((uv - pts2d_prev[None]) ** 2, axis=-1)  # (S+1, K)
    thr2 = reproj_threshold * reproj_threshold
    inl = (err2 < thr2) & valid[None] & (Xp[..., 2] > 0)
    counts = jnp.sum(inl, axis=-1)                          # (S+1,)

    best = jnp.argmax(counts)
    best_inl = inl[best]
    R_best, t_best = R_all[best], t_all[best]

    # local optimisation: weighted Kabsch re-fit on inliers, then recount —
    # two rounds, the batched analogue of USAC's LO step.
    def refit(carry, _):
        R, t, inliers = carry
        w = inliers.astype(jnp.float32)
        q2, t2 = _horn(pts3d_curr, pts3d_prev, w)
        R2 = se3.quat_to_matrix(q2)
        Xp = pts3d_curr @ R2.T + t2
        uv = project(P_l, Xp)
        err2 = jnp.sum((uv - pts2d_prev) ** 2, axis=-1)
        inl2 = (err2 < thr2) & valid & (Xp[..., 2] > 0)
        # only accept if it didn't collapse
        better = jnp.sum(inl2) >= jnp.sum(inliers)
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        inliers = jnp.where(better, inl2, inliers)
        return (R, t, inliers), None

    (R_best, t_best, best_inl), _ = jax.lax.scan(
        refit, (R_best, t_best, best_inl), None, length=2)

    # final polish: Gauss-Newton on the 2D reprojection cost over the inliers
    # (depth-noisy triangulations are weighted correctly by image-space
    # residuals) — the role of cv::solvePnPRansac's terminal LM refinement.
    from spsvo_tpu.ops import lm as _lm  # local import: lm is leaf-only
    q_best = se3.matrix_to_quat(R_best)
    zeros2 = jnp.zeros_like(pts2d_prev)
    polished = _lm.refine_pose(
        q_best, t_best, pts3d_curr, pts3d_curr, pts2d_prev, zeros2, zeros2,
        zeros2, best_inl, P_l, P_l, refinement_degree=1, max_iterations=10,
        huber_delta=reproj_threshold)
    Xp = pts3d_curr @ se3.quat_to_matrix(polished.q).T + polished.t
    uv = project(P_l, Xp)
    err2 = jnp.sum((uv - pts2d_prev) ** 2, axis=-1)
    inl_pol = (err2 < thr2) & valid & (Xp[..., 2] > 0)
    better = jnp.sum(inl_pol) >= jnp.sum(best_inl)
    q = jnp.where(better, polished.q, q_best)
    t = jnp.where(better, polished.t, t_best)
    best_inl = jnp.where(better, inl_pol, best_inl)

    num = jnp.sum(best_inl)
    success = num >= min_inliers
    return PnPResult(q=q, t=t, inliers=best_inl,
                     num_inliers=num.astype(jnp.int32), success=success)
