"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp

from spsvo_tpu.ops import matching
from spsvo_tpu.ops.matching_pallas import match_nn_pallas


def _descs(rng, n, d=256):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def test_pallas_matcher_matches_xla(rng):
    d0 = _descs(rng, 300)
    d1 = _descs(rng, 450)
    v0 = rng.random(300) > 0.15
    v1 = rng.random(450) > 0.15
    ref = matching.match_descriptors(
        jnp.asarray(d0), jnp.asarray(v0), jnp.asarray(d1), jnp.asarray(v1),
        cross_check=True)
    idx, dist2 = match_nn_pallas(jnp.asarray(d0), jnp.asarray(v0),
                                 jnp.asarray(d1), jnp.asarray(v1),
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref.idx))
    matched = np.asarray(idx) >= 0
    np.testing.assert_allclose(np.asarray(dist2)[matched],
                               np.asarray(ref.dist2)[matched], atol=1e-5)


def test_pallas_matcher_all_invalid(rng):
    d0 = _descs(rng, 64)
    idx, _ = match_nn_pallas(jnp.asarray(d0), jnp.zeros(64, bool),
                             jnp.asarray(d0), jnp.ones(64, bool),
                             interpret=True)
    assert (np.asarray(idx) == -1).all()


def test_pipeline_flag_uses_pallas(monkeypatch, rng):
    """use_pallas_matcher=True must route through the kernel ON TPU (here
    simulated by patching the backend query; the kernel itself runs in
    interpret mode) and produce the same match maps; on any other backend it
    must transparently fall back to the XLA path."""
    import dataclasses

    import jax as jax_mod

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import matching_pallas
    from spsvo_tpu import pipeline as pipeline_mod
    from spsvo_tpu.pipeline import Keypoints, _match

    calls = []
    orig = matching_pallas.match_nn_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, interpret=True)

    monkeypatch.setattr(matching_pallas, "match_nn_pallas", spy)

    d = _descs(rng, 128)
    kp = Keypoints(xy=jnp.zeros((128, 2)), score=jnp.ones(128),
                   valid=jnp.ones(128, bool), desc=jnp.asarray(d))
    cfg = VOConfig(model_name_prefix="sp_mbv1", max_keypoints=128)
    ref = _match(kp, kp, cfg)
    cfg_p = dataclasses.replace(cfg, use_pallas_matcher=True)

    # off-TPU: the flag is a no-op (XLA fallback), kernel NOT invoked
    out_cpu = _match(kp, kp, cfg_p)
    assert not calls, "pallas kernel must not run off-TPU"
    np.testing.assert_array_equal(np.asarray(out_cpu.idx),
                                  np.asarray(ref.idx))

    # "on TPU": backend query patched; kernel must be invoked and agree
    monkeypatch.setattr(pipeline_mod.jax, "default_backend", lambda: "tpu")
    out = _match(kp, kp, cfg_p)
    assert calls, "pallas kernel was not invoked"
    np.testing.assert_array_equal(np.asarray(out.idx), np.asarray(ref.idx))
