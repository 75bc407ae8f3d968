"""SE(3) / SO(3) utilities in pure JAX.

The reference carries poses as (axis-angle r_vec, t_vec) through OpenCV and as
(quaternion, translation) through Ceres/tf2 (reference
feature_detection_base.cpp:274-285, 377-385). Here everything is a pytree of
jnp arrays; quaternions use the (x, y, z, w) layout matching Eigen's
coefficient order so tests can compare directly against scipy/Eigen
conventions.

All functions are shape-polymorphic over leading batch dims where noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12


def quat_normalize(q: jax.Array) -> jax.Array:
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product, (x, y, z, w) layout. a ⊗ b."""
    ax, ay, az, aw = jnp.moveaxis(a, -1, 0)
    bx, by, bz, bw = jnp.moveaxis(b, -1, 0)
    return jnp.stack([
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
        aw * bw - ax * bx - ay * by - az * bz,
    ], axis=-1)


def quat_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) xyzw -> (..., 3, 3) rotation matrix."""
    q = quat_normalize(q)
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack([
        1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
        2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
        2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
    ], axis=-1)
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 4) xyzw. Branch-free Shepperd's method via
    selecting the numerically best of the four candidate quaternions."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidates (unnormalised), one per dominant component.
    qw = jnp.stack([1 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1 + m00 - m11 - m22, m01 + m10, m02 + m20],
                   axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1 - m00 + m11 - m22, m12 + m21],
                   axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1 - m00 - m11 + m22],
                   axis=-1)
    # candidate i stored as (w, x, y, z) scaled by 4*q_i
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4 comps)
    norms = jnp.stack([1 + tr, 1 + m00 - m11 - m22, 1 - m00 + m11 - m22,
                       1 - m00 - m11 + m22], axis=-1)
    best = jnp.argmax(norms, axis=-1)
    cand = jnp.take_along_axis(
        cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    w, x, y, z = jnp.moveaxis(cand, -1, 0)
    q = jnp.stack([x, y, z, w], axis=-1)
    return quat_normalize(q)


def axis_angle_to_quat(rvec: jax.Array) -> jax.Array:
    """Rodrigues vector (..., 3) -> quaternion (..., 4) xyzw."""
    angle = jnp.linalg.norm(rvec, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sinc form is stable at angle -> 0
    k = jnp.where(angle > 1e-8, jnp.sin(half) / jnp.maximum(angle, _EPS), 0.5)
    xyz = rvec * k
    w = jnp.cos(half)[..., 0]
    return jnp.concatenate([xyz, w[..., None]], axis=-1)


def quat_to_axis_angle(q: jax.Array) -> jax.Array:
    q = quat_normalize(q)
    xyz = q[..., :3]
    w = q[..., 3]
    # force w >= 0 for the short rotation
    sign = jnp.where(w < 0, -1.0, 1.0)
    xyz = xyz * sign[..., None]
    w = w * sign
    norm = jnp.linalg.norm(xyz, axis=-1)
    angle = 2.0 * jnp.arctan2(norm, w)
    axis = xyz / jnp.maximum(norm, _EPS)[..., None]
    return jnp.where(norm[..., None] > 1e-12, axis * angle[..., None],
                     2.0 * xyz)


def axis_angle_to_matrix(rvec: jax.Array) -> jax.Array:
    return quat_to_matrix(axis_angle_to_quat(rvec))


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    return quat_to_axis_angle(matrix_to_quat(m))


def so3_exp(phi: jax.Array) -> jax.Array:
    """so(3) tangent (..., 3) -> rotation matrix, Rodrigues formula."""
    return axis_angle_to_matrix(phi)


def hat(v: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(v.shape[:-1] + (3, 3))


def make_transform(q: jax.Array, t: jax.Array) -> jax.Array:
    """(quat xyzw, t) -> (..., 4, 4) homogeneous transform."""
    R = quat_to_matrix(q)
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def invert_transform(T: jax.Array) -> jax.Array:
    """Inverse of a rigid (..., 4, 4) transform."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("...ij,...j->...i", Rt, t)
    top = jnp.concatenate([Rt, t_inv[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=T.dtype), T.shape[:-2] + (4,))
    return jnp.concatenate([top, bottom[..., None, :]], axis=-2)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts) + t[..., None, :]


def rotate_points(q: jax.Array, pts: jax.Array) -> jax.Array:
    """Rotate points (..., N, 3) by quaternion (..., 4)."""
    R = quat_to_matrix(q)
    return jnp.einsum("...ij,...nj->...ni", R, pts)


def quat_boxplus(q: jax.Array, delta: jax.Array) -> jax.Array:
    """Quaternion manifold retraction matching Ceres'
    EigenQuaternionParameterization: q ⊞ δ = dq(δ) ⊗ q, where dq is the
    exponential of the 3-vector tangent (reference
    feature_detection_base.cpp:358-359 uses this local parameterization).

    AD-safe at δ = 0: sin|δ|/|δ| and cos|δ| are computed with a Taylor
    branch so forward-mode Jacobians (the LM solver linearises here) stay
    finite — a plain where(|δ|>ε, sin/|δ|, 1) leaks NaN through the
    unselected branch under jacfwd.
    """
    n2 = jnp.sum(delta * delta, axis=-1, keepdims=True)
    small = n2 < 1e-12
    n2_safe = jnp.where(small, 1.0, n2)
    norm = jnp.sqrt(n2_safe)
    k = jnp.where(small, 1.0 - n2 / 6.0, jnp.sin(norm) / norm)
    w = jnp.where(small, 1.0 - n2 / 2.0, jnp.cos(norm))
    dq = jnp.concatenate([delta * k, w[..., 0][..., None]], axis=-1)
    return quat_normalize(quat_multiply(dq, q))
