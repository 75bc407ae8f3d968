"""Fused Pallas matcher kernel — distance matrix + mutual-NN in one pass.

The XLA path (`ops/matching.py`) lowers to several TPU kernels: the MXU
matmul, the mask selects, two argmin reductions and the gather for the
cross-check — each reading/writing the 512x512 distance matrix. This kernel
keeps everything resident in VMEM: one MXU dot, the masking, both argmins and
the mutual-consistency check happen in a single `pallas_call`, so the
distance matrix never touches HBM.

The mutual check avoids an unsupported dynamic gather by the one-hot matmul
identity: colmin_at_best1 = onehot(best1) @ colmin — another MXU op.
Tie-breaking matches argmin (lowest index wins) up to exact float equality of
distances, which is measure-zero for real descriptors (validated against the
XLA path in tests).

Capacities are padded to multiples of 128 lanes by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e30


def _match_kernel(d0_ref, v0_ref, d1_ref, v1_ref, idx_ref, dist_ref):
    d0 = d0_ref[:]                        # (K0, D)
    d1 = d1_ref[:]                        # (K1, D)
    v0 = v0_ref[:]                        # (K0, 1) float {0,1}
    v1 = v1_ref[:]                        # (K1, 1)
    k0 = d0.shape[0]
    k1 = d1.shape[0]

    # bf16 inputs (cfg.matcher_bf16) are upcast AFTER the VMEM load: the
    # HBM/VMEM feed traffic is halved (the flag's purpose) while the MXU
    # dot runs in fp32 — Mosaic rejects a bf16 lhs in this transposed
    # matmul form ("Bad lhs type", measured on v5e round 5), and the
    # matcher matmul is a negligible share of frame time anyway
    d0f = d0.astype(jnp.float32)
    d1f = d1.astype(jnp.float32)
    dots = jnp.dot(d0f, d1f.T, preferred_element_type=jnp.float32)  # MXU
    n0 = jnp.sum(d0f * d0f, axis=1, keepdims=True)                # (K0, 1)
    n1 = jnp.sum(d1f * d1f, axis=1, keepdims=True)                # (K1, 1)
    dist = jnp.maximum(n0 + n1.T - 2.0 * dots, 0.0)
    mask = (v0 > 0) & (v1.T > 0)                                  # (K0, K1)
    dist = jnp.where(mask, dist, _BIG)

    # row argmin (query -> train)
    rowmin = jnp.min(dist, axis=1, keepdims=True)                 # (K0, 1)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (k0, k1), 1)
    best1 = jnp.min(jnp.where(dist == rowmin, col_ids, k1), axis=1,
                    keepdims=True)                                # (K0, 1)

    # column argmin (train -> query)
    colmin = jnp.min(dist, axis=0, keepdims=True)                 # (1, K1)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (k0, k1), 0)
    best0 = jnp.min(jnp.where(dist == colmin, row_ids, k0), axis=0,
                    keepdims=True)                                # (1, K1)

    # mutual check via one-hot matmuls (no dynamic gather):
    onehot = (col_ids == best1).astype(jnp.float32)               # (K0, K1)
    best0_at_best1 = jnp.dot(onehot, best0.T.astype(jnp.float32),
                             preferred_element_type=jnp.float32)  # (K0, 1)
    my_row = jax.lax.broadcasted_iota(jnp.int32, (k0, 1), 0)
    ok = ((v0 > 0) & (rowmin < _BIG)
          & (best0_at_best1.astype(jnp.int32) == my_row))
    idx_ref[:] = jnp.where(ok, best1, -1)
    dist_ref[:] = rowmin


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def match_nn_pallas(desc0: jax.Array, valid0: jax.Array, desc1: jax.Array,
                    valid1: jax.Array, interpret: bool = False):
    """Mutual-NN matching, fused. Returns (idx (K0,) int32 with -1 sentinel,
    dist2 (K0,) of the selected match). Semantics match
    `matching.match_nn(l2_distance_sq(...), cross_check=True)`."""
    k0, d = desc0.shape
    k1 = desc1.shape[0]
    K0 = max(8, -(-k0 // 128) * 128)
    K1 = max(128, -(-k1 // 128) * 128)
    D = max(128, -(-d // 128) * 128)

    # bf16 descriptors stay bf16 into the kernel (half the VMEM feed
    # traffic; the kernel accumulates in fp32) — everything else is fp32
    cdt = desc0.dtype if desc0.dtype == jnp.bfloat16 else jnp.float32
    d0 = _pad_to(_pad_to(desc0.astype(cdt), K0, 0), D, 1)
    d1 = _pad_to(_pad_to(desc1.astype(cdt), K1, 0), D, 1)
    v0 = _pad_to(valid0.astype(jnp.float32)[:, None], K0, 0)
    v1 = _pad_to(valid1.astype(jnp.float32)[:, None], K1, 0)

    idx, dist = pl.pallas_call(
        _match_kernel,
        out_shape=(jax.ShapeDtypeStruct((K0, 1), jnp.int32),
                   jax.ShapeDtypeStruct((K0, 1), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                   pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(d0, v0, d1, v1)
    idx = idx[:k0, 0]
    # padded train slots can never win (invalid mask), but clamp for safety
    idx = jnp.where(idx >= k1, -1, idx)
    return idx, dist[:k0, 0]
