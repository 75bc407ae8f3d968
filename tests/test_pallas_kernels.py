"""Pallas kernels vs their XLA reference paths (interpret mode on CPU)."""
import pytest
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


def test_fused_solver_matches_solve_prepared(rng):
    """The whole-solver Pallas kernel (score -> winner -> refit -> polish ->
    LM -> gates) must reproduce solver.solve_prepared in both winner
    branches (interpret mode; fp32 reduction-order tolerance)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from scipy.spatial.transform import Rotation
    from test_geometry_solvers import (P_L, P_R, _prepared_from_frame,
                                       _vo_frame)

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import solver, solver_pallas

    cfg = VOConfig(model_name_prefix="sp_mbv1", ransac_iterations=64,
                   ransac_chunk=0, lm_unroll=6, solve_slots=0)
    data, R, t = _vo_frame(rng, n=250, outlier_frac=0.15, k_pad=512)
    prep = _prepared_from_frame(data)
    P_l = jnp.asarray(P_L, jnp.float32)
    P_r = jnp.asarray(P_R, jnp.float32)
    key = jax.random.PRNGKey(7)
    q_true = jnp.asarray(Rotation.from_matrix(R).as_quat(), jnp.float32)
    t_true = jnp.asarray(t, jnp.float32)
    q_id = jnp.array([0, 0, 0, 1.0], jnp.float32)
    t_id = jnp.zeros(3, jnp.float32)

    hyp = solver_pallas.precompute_hypotheses(key, prep, cfg)
    fc = jnp.int32(5)   # accel gate disarmed: full refinement path compared
    for q_pred, t_pred, want_prior in ((q_id, t_id, False),
                                       (q_true, t_true, True)):
        ref = solver.solve_prepared(key, prep, P_l, P_r, q_pred, t_pred,
                                    fc, cfg)
        got = solver_pallas.fused_solve(hyp, prep, P_l, P_r, q_pred,
                                        t_pred, fc, cfg, interpret=True)
        assert bool(got.prior_winner) == want_prior
        np.testing.assert_allclose(np.asarray(got.q), np.asarray(ref.q),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(got.q_pred),
                                   np.asarray(ref.q_pred), atol=1e-4)
        np.testing.assert_allclose(np.asarray(got.t_pred),
                                   np.asarray(ref.t_pred), atol=1e-3)
        assert abs(int(got.num_inliers) - int(ref.num_inliers)) <= 3
        assert bool(got.pnp_success) == bool(ref.pnp_success)
        assert bool(got.accel_anomaly) == bool(ref.accel_anomaly)
        assert int(got.num_chain) == int(ref.num_chain)
        inl_ref = np.asarray(ref.inliers)
        inl_got = np.asarray(got.inliers)
        assert (inl_ref != inl_got).sum() <= 3


def test_fused_solver_gate_fallback(rng):
    """PnP failure (too few inliers) must fall back to the prediction, like
    the reference's gate (feature_detection_base.cpp:244-250)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_geometry_solvers import P_L, P_R, _prepared_from_frame, _vo_frame

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import solver_pallas

    cfg = VOConfig(model_name_prefix="sp_mbv1", ransac_iterations=32,
                   ransac_chunk=0, lm_unroll=4, solve_slots=0)
    data, R, t = _vo_frame(rng, n=20, outlier_frac=0.0, k_pad=256)
    # destroy the observations so nothing can be an inlier
    data["uv_prev_l"] = data["uv_prev_l"] + 500.0
    prep = _prepared_from_frame(data)
    hyp = solver_pallas.precompute_hypotheses(jax.random.PRNGKey(0), prep,
                                              cfg)
    q_pred = jnp.asarray([0.1, 0.0, 0.0, 0.99], jnp.float32)
    q_pred = q_pred / jnp.linalg.norm(q_pred)
    t_pred = jnp.asarray([0.3, 0.0, -1.0], jnp.float32)
    got = solver_pallas.fused_solve(
        hyp, prep, jnp.asarray(P_L, jnp.float32),
        jnp.asarray(P_R, jnp.float32), q_pred, t_pred, jnp.int32(5), cfg,
        interpret=True)
    assert not bool(got.pnp_success)
    np.testing.assert_allclose(np.asarray(got.q), np.asarray(q_pred),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(t_pred),
                               atol=1e-6)


def test_hybrid_pallas_solver_flag_falls_back_off_tpu(rng):
    """With use_pallas_solver=True off-TPU, build_online_hybrid must take the
    XLA solve_prepared path and produce a normal trajectory."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pipeline import _synthetic_sequence

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.models import zoo
    from spsvo_tpu.ops.image import (preprocess_image_np,
                                     update_projection_matrix_np)
    from spsvo_tpu.parallel.sharding import build_online_hybrid

    cfg = VOConfig(model_name_prefix="sp_mbv1", conf_thresh=0.005,
                   ransac_iterations=64, max_keypoints=256,
                   ransac_chunk=0, lm_unroll=4, solve_slots=128,
                   use_pallas_solver=True)
    apply_fn, params = zoo.load_model(cfg.model_name_prefix)
    frames, poses, P_l, P_r = _synthetic_sequence(rng, n_frames=4)
    h0, w0 = frames[0][0].shape
    P_l2 = update_projection_matrix_np(P_l, h0, w0, 120, 392)
    P_r2 = update_projection_matrix_np(P_r, h0, w0, 120, 392)
    imgs = np.stack([
        np.stack([preprocess_image_np(il, 120, 392),
                  preprocess_image_np(ir, 120, 392)])
        for il, ir in frames])
    w, _ = build_online_hybrid(apply_fn, cfg)(
        params, jnp.asarray(imgs), jnp.asarray(P_l2, jnp.float32),
        jnp.asarray(P_r2, jnp.float32), jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(w)).all()
    gt = np.array([T[:3, 3] for T in poses])
    assert np.abs(np.asarray(w)[:, :3, 3] - gt).max() < 0.3


@pytest.mark.parametrize("degree,unroll", [(1, 4), (2, 6), (0, 4), (3, 6)])
def test_fused_solver_degree_variants(rng, degree, unroll):
    """Kernel parity across the refinement-degree schedule and LM unroll
    counts (degree 0 = no LM refinement at all; degree 3 is the only
    schedule point with exactly one inverse factor)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_geometry_solvers import P_L, P_R, _prepared_from_frame, _vo_frame

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import solver, solver_pallas

    cfg = VOConfig(model_name_prefix="sp_mbv1", ransac_iterations=32,
                   ransac_chunk=0, lm_unroll=unroll, solve_slots=0,
                   refinement_degree=degree)
    data, R, t = _vo_frame(rng, n=150, outlier_frac=0.1, k_pad=256)
    prep = _prepared_from_frame(data)
    P_l = jnp.asarray(P_L, jnp.float32)
    P_r = jnp.asarray(P_R, jnp.float32)
    key = jax.random.PRNGKey(11)
    q_id = jnp.array([0, 0, 0, 1.0], jnp.float32)
    t_id = jnp.zeros(3, jnp.float32)
    hyp = solver_pallas.precompute_hypotheses(key, prep, cfg)
    ref = solver.solve_prepared(key, prep, P_l, P_r, q_id, t_id,
                                jnp.int32(5), cfg)
    got = solver_pallas.fused_solve(hyp, prep, P_l, P_r, q_id, t_id,
                                    jnp.int32(5), cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got.q), np.asarray(ref.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               atol=1e-3)
    assert abs(int(got.num_inliers) - int(ref.num_inliers)) <= 3
    assert bool(got.lm_improved) == bool(ref.lm_improved)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic TPU lowering parity needs a real TPU "
                           "(the CPU suite pins interpret-mode parity only)")
def test_fused_solver_tpu_lowering_parity(rng):
    """Opt-in (real-TPU) parity: the MOSAIC-lowered fused_solve must match
    solve_prepared at the same tolerances the interpret-mode tests pin —
    catching TPU-lowering numerics regressions that interpret mode cannot
    (ADVICE r2). Run via: python -m pytest tests/test_pallas_kernels.py
    -k tpu_lowering --no-header -p no:cacheprovider (outside the CPU-forcing
    conftest env, e.g. SPSVO_TEST_TPU=1)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_geometry_solvers import P_L, P_R, _prepared_from_frame, _vo_frame

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import solver, solver_pallas

    cfg = VOConfig(model_name_prefix="sp_mbv1", ransac_iterations=32,
                   ransac_chunk=0, lm_unroll=6, solve_slots=0)
    data, R, t = _vo_frame(rng, n=150, outlier_frac=0.1, k_pad=256)
    prep = _prepared_from_frame(data)
    P_l = jnp.asarray(P_L, jnp.float32)
    P_r = jnp.asarray(P_R, jnp.float32)
    key = jax.random.PRNGKey(11)
    q_id = jnp.array([0, 0, 0, 1.0], jnp.float32)
    t_id = jnp.zeros(3, jnp.float32)
    hyp = solver_pallas.precompute_hypotheses(key, prep, cfg)
    ref = solver.solve_prepared(key, prep, P_l, P_r, q_id, t_id,
                                jnp.int32(5), cfg)
    got = jax.jit(lambda *a: solver_pallas.fused_solve(*a, cfg=cfg))(
        hyp, prep, P_l, P_r, q_id, t_id, jnp.int32(5))
    np.testing.assert_allclose(np.asarray(got.q), np.asarray(ref.q),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(ref.t),
                               atol=1e-3)
    assert abs(int(got.num_inliers) - int(ref.num_inliers)) <= 3


def test_fused_solver_weighted_lm_matches_xla(rng):
    """The in-kernel GLS weighted-LM pass (landmark fusion's lane_weights)
    must reproduce the XLA composition solve_prepared + weighted
    lm.refine_pose that solve_with_landmarks runs off-TPU."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(__file__))
    from test_geometry_solvers import P_L, P_R, _prepared_from_frame, _vo_frame

    from spsvo_tpu.config import VOConfig
    from spsvo_tpu.ops import lm, solver, solver_pallas

    cfg = VOConfig(model_name_prefix="sp_mbv1", ransac_iterations=64,
                   ransac_chunk=0, lm_unroll=6, solve_slots=0)
    data, R, t = _vo_frame(rng, n=250, outlier_frac=0.1, k_pad=512)
    prep = _prepared_from_frame(data)
    P_l = jnp.asarray(P_L, jnp.float32)
    P_r = jnp.asarray(P_R, jnp.float32)
    key = jax.random.PRNGKey(3)
    fc = jnp.int32(5)
    q_id = jnp.array([0, 0, 0, 1.0], jnp.float32)
    t_id = jnp.zeros(3, jnp.float32)
    k = prep.chain.shape[0]
    w_row = jnp.asarray(
        rng.integers(1, 12, k).astype(np.float32))

    # XLA reference: unweighted solve, then the GLS pass from the refined
    # pose (exactly solve_with_landmarks's non-kernel branch)
    ref = solver.solve_prepared(key, prep, P_l, P_r, q_id, t_id, fc, cfg)
    use_pred = (~ref.pnp_success) | ref.accel_anomaly
    refined = lm.refine_pose(
        ref.q, ref.t, prep.pts3d_curr, prep.pts3d_prev, prep.uv_prev_l,
        prep.uv_prev_r, prep.uv_curr_l, prep.uv_curr_r,
        ref.inliers & ~use_pred, P_l, P_r,
        refinement_degree=cfg.refinement_degree,
        max_iterations=cfg.lm_max_iterations,
        huber_delta=cfg.huber_delta, unroll=cfg.lm_unroll,
        inv_factor_weights=w_row)
    q_ref = jnp.where(use_pred, ref.q, refined.q)
    t_ref = jnp.where(use_pred, ref.t, refined.t)

    hyp = solver_pallas.precompute_hypotheses(key, prep, cfg)
    got = solver_pallas.fused_solve(hyp, prep, P_l, P_r, q_id, t_id, fc,
                                    cfg, interpret=True, lane_weights=w_row)
    np.testing.assert_allclose(np.asarray(got.q), np.asarray(q_ref),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.t), np.asarray(t_ref),
                               atol=1e-3)
    # the weighted pass must differ from the unweighted result (the weights
    # actually steer the solution) while staying near the true pose
    assert np.abs(np.asarray(got.t) - np.asarray(ref.t)).max() > 1e-6
