"""Batched stereo triangulation (DLT), mask-correct, on-device.

Replaces cv::triangulatePoints + convertPointsFromHomogeneous in the
reference solver (src/odml_visual_odometry/src/feature_detection_base.cpp:212-223).

The DLT system per point is
    A = [ x  * P_l[2] - P_l[0]
          y  * P_l[2] - P_l[1]
          x' * P_r[2] - P_r[0]
          y' * P_r[2] - P_r[1] ]          (4 x 4)
and the homogeneous solution is the least-significant right singular vector —
computed here as the smallest eigenvector of AᵀA (4x4 symmetric, batched
`eigh`: K tiny eigenproblems run as one batched kernel on TPU rather than a
host loop).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def triangulate(P_l: jax.Array, P_r: jax.Array, xy_l: jax.Array,
                xy_r: jax.Array) -> jax.Array:
    """Triangulate matched stereo pixels.

    P_l, P_r: (3, 4) projection matrices. xy_l, xy_r: (K, 2) pixels.
    Returns (K, 3) 3D points in the left-camera frame. Invalid rows produce
    garbage; callers mask.
    """
    P_l = P_l.astype(jnp.float32)
    P_r = P_r.astype(jnp.float32)

    def rows(P, xy):
        x = xy[..., 0:1]
        y = xy[..., 1:2]
        r0 = x * P[2][None] - P[0][None]   # (K, 4)
        r1 = y * P[2][None] - P[1][None]
        return r0, r1

    a0, a1 = rows(P_l, xy_l)
    a2, a3 = rows(P_r, xy_r)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)          # (K, 4, 4)
    # Row normalisation for conditioning (fp32 on device).
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("kij,kil->kjl", A, A)
    _, vecs = jnp.linalg.eigh(AtA)                    # ascending eigenvalues
    X = vecs[..., 0]                                  # (K, 4) smallest
    w = X[..., 3:4]
    sign = jnp.where(w < 0, -1.0, 1.0)
    X = X * sign
    w = jnp.where(jnp.abs(X[..., 3:4]) < 1e-12, 1e-12, X[..., 3:4])
    return X[..., :3] / w


def project(P: jax.Array, pts3d: jax.Array) -> jax.Array:
    """Project (K, 3) points with a (3, 4) matrix -> (K, 2) pixels."""
    Xh = jnp.concatenate([pts3d, jnp.ones_like(pts3d[..., :1])], axis=-1)
    uvw = Xh @ P.T
    w = uvw[..., 2:3]
    w = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    return uvw[..., :2] / w
