"""Checkpoint / resume for training and sweeps.

The reference's only checkpointing is its compiled-engine file cache and
per-sequence result files (SURVEY.md §5 "Checkpoint / resume"); the XLA
persistent cache and the eval-harness artefacts cover those. This module adds
what a real training framework needs on top: durable TrainState snapshots
(params + optimizer state + step) via orbax, with an npz fallback for
params-only use.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_train_state(path: str, state: Any) -> str:
    """Snapshot a TrainState pytree with orbax."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    return path


def restore_train_state(path: str, template: Any) -> Any:
    """Restore a TrainState saved by `save_train_state`; `template` provides
    the pytree structure/dtypes (e.g. a freshly built state)."""
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path),
            jax.tree.map(ocp.utils.to_shape_dtype_struct
                         if hasattr(ocp.utils, "to_shape_dtype_struct")
                         else (lambda x: jax.ShapeDtypeStruct(
                             np.shape(x), np.asarray(x).dtype)), template))
    return jax.tree.unflatten(jax.tree.structure(template),
                              jax.tree.leaves(restored))


def save_params_npz(path: str, params: dict) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    return path


def load_params_npz(path: str) -> dict:
    import jax.numpy as jnp
    data = np.load(path)
    return {k: jnp.asarray(data[k]) for k in data.files}
