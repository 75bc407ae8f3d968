"""SuperPoint detector/descriptor postprocess — fully on-device, fixed shapes.

TPU-native replacement for the reference's host-side Eigen postprocess
(src/odml_visual_odometry/src/feature_detection_neural_network.cpp:188-431):

  reference (host, threaded Eigen)          here (device, one fused XLA graph)
  -----------------------------------       ---------------------------------
  exp + channel-softmax (+1e-5)  :271-284   `cell_softmax`
  drop dustbin channel           :289-295   slice [..., :64]
  NCHW->NHWC + depth-to-space    :298-326   `depth_to_space` (NHWC native)
  sparse threshold + sort + greedy NMS
  + border removal + cap 1000    :188-262   `iterated max-pool NMS` + masked
                                            top-K (greedy NMS is inherently
                                            sequential; the iterated max-pool
                                            form is the TPU-shaped equivalent,
                                            validated for parity in tests)
  bilinear desc sampling (align_corners
  =True) + L2 norm               :366-431   `sample_descriptors` (batched
                                            gather instead of per-point loop)

Outputs use a fixed keypoint capacity K with a validity mask instead of the
reference's dynamic-length vectors, so every downstream stage stays
static-shaped under jit.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set for one image batch.

    xy:    (B, K, 2) float32 — (x=col, y=row) in full-resolution pixels.
    score: (B, K)    float32 — heatmap confidence (0 for invalid slots).
    valid: (B, K)    bool.
    desc:  (B, K, D) float32 — L2-normalised descriptors (garbage in invalid
           slots; every consumer masks by `valid`).
    """

    xy: jax.Array
    score: jax.Array
    valid: jax.Array
    desc: jax.Array


def cell_softmax(det: jax.Array) -> jax.Array:
    """Channel softmax with the reference's +1e-5 denominator
    (feature_detection_neural_network.cpp:270-284), computed stably:
    exp(x)/(sum(exp(x)) + 1e-5) == exp(x-m)/(sum(exp(x-m)) + 1e-5*exp(-m)).

    det: (B, Hc, Wc, 65) logits -> same-shaped probabilities.
    """
    m = jnp.max(det, axis=-1, keepdims=True)
    e = jnp.exp(det - m)
    denom = jnp.sum(e, axis=-1, keepdims=True) + 1e-5 * jnp.exp(-m)
    return e / denom


def depth_to_space(nodust: jax.Array, cell: int = 8) -> jax.Array:
    """(B, Hc, Wc, cell*cell) -> (B, Hc*cell, Wc*cell) heatmap.

    Channel c maps to (row=c//cell, col=c%cell) inside each cell, matching the
    reference's reshape/shuffle chain (:298-326).
    """
    b, hc, wc, c2 = nodust.shape
    x = nodust.reshape(b, hc, wc, cell, cell)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, hc * cell, wc * cell)


def heatmap_from_logits(det: jax.Array, cell: int = 8) -> jax.Array:
    """Full detector-head postprocess: logits (B,Hc,Wc,65) -> heatmap (B,H,W)."""
    probs = cell_softmax(det)
    return depth_to_space(probs[..., :cell * cell], cell)


def _maxpool_same(x: jax.Array, radius: int) -> jax.Array:
    """(B, H, W) max-pool, window (2r+1)^2, stride 1, SAME padding."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k),
        window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius)))


def nms(scores: jax.Array, radius: int, iterations: int = 2) -> jax.Array:
    """Iterated max-pool non-maximum suppression.

    TPU-shaped equivalent of the reference's confidence-sorted greedy NMS
    (feature_detection_neural_network.cpp:219-258): a point survives if it is
    the maximum of its (2r+1)^2 window among not-yet-suppressed points;
    additional rounds recover secondary peaks whose stronger neighbour was
    itself suppressed — the same chains greedy NMS keeps. Exact greedy order
    is data-dependent and inherently sequential; parity is validated
    statistically in tests (keypoint-set overlap + downstream pose accuracy).

    scores: (B, H, W) non-negative (0 = already excluded). Returns scores with
    suppressed positions zeroed.
    """
    zeros = jnp.zeros_like(scores)
    max_mask = scores == _maxpool_same(scores, radius)
    for _ in range(iterations):
        supp_mask = _maxpool_same(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == _maxpool_same(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask & (scores > 0), scores, zeros)


def select_topk(scores: jax.Array, k: int, conf_thresh: float,
                border: int, post_nms_radius: int = 0
                ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Masked top-K keypoint selection.

    Applies the confidence threshold (strict >, reference :203) and border
    removal (keep row in [border, H-border), col likewise, reference
    :239-242), then takes the K best by score.

    `post_nms_radius > 0` DECLARES that `scores` have ALREADY been
    NMS-suppressed with that radius (it does not apply NMS itself — passing
    raw scores with post_nms_radius >= 3 would silently cap detections at
    one per 4x4 block): the guarantee is at most one survivor per
    (radius+1)-sized block (surviving pairs are > radius apart in Chebyshev
    distance). The top-K then runs on a 4x4 block-max reduction — a 16x
    smaller sort with identical results up to EXACT-score ties: inside a
    block the plain sort would keep both of two equal-valued neighbours NMS
    failed to separate (the block path keeps the first), and across blocks
    equal scores at the k-th boundary may order/select differently (plain
    sorts by flat pixel index, blocks by block raster order). Measure-zero
    for real heatmaps; equality is test-pinned on random NMS'd maps. This
    is the hot sort of the postprocess: 0.22 -> ~0.03 ms/frame.

    Returns (xy (B,K,2) float32, score (B,K), valid (B,K)).
    """
    b, h, w = scores.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    keep = ((row >= border) & (row < h - border) &
            (col >= border) & (col < w - border))
    masked = jnp.where(keep[None], scores, 0.0)
    masked = jnp.where(masked > conf_thresh, masked, 0.0)

    blk = 4
    if post_nms_radius >= blk - 1 and h % blk == 0 and w % blk == 0:
        # block-max reduction: value + first flat index per 4x4 block
        hb, wb = h // blk, w // blk
        tiles = masked.reshape(b, hb, blk, wb, blk)
        vals = jnp.max(tiles, axis=(2, 4))                # (B, hb, wb)
        flat_idx = (row * w + col).reshape(hb, blk, wb, blk)
        is_max = tiles == vals[:, :, None, :, None]
        idx = jnp.min(jnp.where(is_max, flat_idx[None], h * w),
                      axis=(2, 4))                        # (B, hb, wb)
        # NMS admits at most one survivor per block, so k beyond the block
        # count can only select zero-score (invalid) slots — clamp and pad
        kb = min(k, hb * wb)
        top_scores, top_blk = jax.lax.top_k(vals.reshape(b, hb * wb), kb)
        top_idx = jnp.take_along_axis(idx.reshape(b, hb * wb), top_blk,
                                      axis=1)
        if kb < k:
            top_scores = jnp.pad(top_scores, ((0, 0), (0, k - kb)))
            top_idx = jnp.pad(top_idx, ((0, 0), (0, k - kb)))
    else:
        flat = masked.reshape(b, h * w)
        top_scores, top_idx = jax.lax.top_k(flat, k)
    ys = (top_idx // w).astype(jnp.float32)
    xs = (top_idx % w).astype(jnp.float32)
    xy = jnp.stack([xs, ys], axis=-1)
    valid = top_scores > 0.0
    return xy, top_scores, valid


def refine_subpixel(heat: jax.Array, xy: jax.Array, valid: jax.Array
                    ) -> jax.Array:
    """Sub-pixel keypoint refinement: per-axis parabolic peak interpolation.

    The reference (like the original SuperPoint demo) keeps integer heatmap
    coordinates — its accuracy floor is pixel quantisation. This opt-in
    improvement (cfg.subpixel_refine) fits a parabola through each NMS
    winner's score and its two axis neighbours and shifts to the vertex:
    shift = (f(-1) - f(+1)) / (2 (f(-1) - 2 f(0) + f(+1))), clamped to
    ±0.5 (the winner is the local max, so the vertex lies within its cell).
    Out-of-image neighbours contribute 0 (the clamp bounds the shift);
    invalid slots pass through unchanged.

    heat: (B, H, W) RAW heatmap — pre-threshold AND pre-NMS, so every
    neighbour carries its true score (extract_keypoints passes heat_raw;
    a conf-thresholded heat would clamp sub-threshold neighbours to the
    floor and bias the parabola vertex for winners near conf_thresh);
    xy: (B, K, 2) integer pixel coords.
    """
    b, h, w = heat.shape
    flat = heat.reshape(b, h * w)
    x0 = xy[..., 0].astype(jnp.int32)
    y0 = xy[..., 1].astype(jnp.int32)

    def at(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        return jnp.where(inb, jnp.take_along_axis(flat, idx, axis=1), 0.0)

    def axis_shift(v_m, v_0, v_p):
        denom = v_m - 2.0 * v_0 + v_p
        shift = 0.5 * (v_m - v_p) / jnp.where(jnp.abs(denom) < 1e-12,
                                              1e-12, denom)
        return jnp.clip(jnp.where(jnp.abs(denom) < 1e-12, 0.0, shift),
                        -0.5, 0.5)

    dx = axis_shift(at(y0, x0 - 1), at(y0, x0), at(y0, x0 + 1))
    dy = axis_shift(at(y0 - 1, x0), at(y0, x0), at(y0 + 1, x0))
    refined = jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], axis=-1)
    return jnp.where(valid[..., None], refined, xy)


def refine_subpixel_quad(heat: jax.Array, xy: jax.Array, valid: jax.Array
                         ) -> jax.Array:
    """Coupled 2D quadratic subpixel refinement (3x3 least-squares fit).

    Fits f(x, y) = a + bx + cy + dx^2 + exy + fy^2 to the 3x3 neighbourhood
    (Savitzky-Golay closed form on the fixed stencil) and shifts to the
    vertex solve [[2d, e], [e, 2f]] s = -[b, c]. Unlike the separable
    per-axis parabolas (`refine_subpixel`), the cross term e captures
    diagonal peak anisotropy — the candidate fix for the per-axis fit's
    long-horizon drift bias (VERDICT r2 #8). Falls back to no shift where
    the Hessian is not negative definite (saddle/ridge), and clamps to
    +-0.5 per axis. Same contract as `refine_subpixel`.
    """
    b, h, w = heat.shape
    flat = heat.reshape(b, h * w)
    x0 = xy[..., 0].astype(jnp.int32)
    y0 = xy[..., 1].astype(jnp.int32)

    def at(yy, xx):
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        idx = jnp.clip(yy, 0, h - 1) * w + jnp.clip(xx, 0, w - 1)
        return jnp.where(inb, jnp.take_along_axis(flat, idx, axis=1), 0.0)

    # 3x3 samples f[dy][dx], dy/dx in {-1, 0, +1}
    f = [[at(y0 + dy_, x0 + dx_) for dx_ in (-1, 0, 1)]
         for dy_ in (-1, 0, 1)]
    s_all = sum(f[i][j] for i in range(3) for j in range(3))
    sx = sum(f[i][j] * (j - 1) for i in range(3) for j in range(3))
    sy = sum(f[i][j] * (i - 1) for i in range(3) for j in range(3))
    sxx = sum(f[i][j] * (j - 1) ** 2 for i in range(3) for j in range(3))
    syy = sum(f[i][j] * (i - 1) ** 2 for i in range(3) for j in range(3))
    sxy = sum(f[i][j] * (i - 1) * (j - 1) for i in range(3) for j in range(3))
    # Savitzky-Golay closed form on the 3x3 stencil:
    bq = sx / 6.0
    cq = sy / 6.0
    dq = 0.5 * sxx - s_all / 3.0
    fq = 0.5 * syy - s_all / 3.0
    eq = sxy / 4.0
    det = 4.0 * dq * fq - eq * eq
    neg_def = (dq < 0) & (det > 1e-12)
    safe_det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    dx = (-2.0 * fq * bq + eq * cq) / safe_det
    dy = (-2.0 * dq * cq + eq * bq) / safe_det
    dx = jnp.clip(jnp.where(neg_def, dx, 0.0), -0.5, 0.5)
    dy = jnp.clip(jnp.where(neg_def, dy, 0.0), -0.5, 0.5)
    refined = jnp.stack([xy[..., 0] + dx, xy[..., 1] + dy], axis=-1)
    return jnp.where(valid[..., None], refined, xy)


def sample_descriptors(desc_grid: jax.Array, xy: jax.Array,
                       image_hw: Tuple[int, int]) -> jax.Array:
    """Bilinear descriptor sampling with align_corners=True semantics.

    Mirrors the reference bilinearInterpolationDesc
    (feature_detection_neural_network.cpp:366-431): heatmap coords (row, col)
    map to the coarse grid as row/(H-1)*(Hc-1) (PyTorch-0.4 grid_sample
    align_corners=True contract, documented at :372-377), 4-neighbour
    interpolation, then per-keypoint L2 normalisation.

    desc_grid: (B, Hc, Wc, D); xy: (B, K, 2) full-res pixels.
    Returns (B, K, D) L2-normalised.
    """
    b, hc, wc, d = desc_grid.shape
    h, w = image_hw
    x = xy[..., 0]
    y = xy[..., 1]
    yc = y / (h - 1) * (hc - 1)
    xc = x / (w - 1) * (wc - 1)

    y0 = jnp.floor(yc)
    x0 = jnp.floor(xc)
    fy = yc - y0
    fx = xc - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, hc - 1)
    x1 = jnp.minimum(x0 + 1, wc - 1)

    flat = desc_grid.reshape(b, hc * wc, d)

    def gather(rows, cols):
        idx = rows * wc + cols  # (B, K)
        return jnp.take_along_axis(flat, idx[..., None], axis=1)

    wtl = ((1 - fy) * (1 - fx))[..., None]
    wtr = ((1 - fy) * fx)[..., None]
    wbl = (fy * (1 - fx))[..., None]
    wbr = (fy * fx)[..., None]
    out = (gather(y0, x0) * wtl + gather(y0, x1) * wtr +
           gather(y1, x0) * wbl + gather(y1, x1) * wbr)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-12)


def extract_keypoints(det: jax.Array, desc: jax.Array, *, k: int,
                      conf_thresh: float, nms_radius: int, border: int,
                      nms_iterations: int = 2,
                      subpixel=False) -> Keypoints:
    """Full postprocess: raw heads -> fixed-capacity keypoints+descriptors.

    det:  (B, Hc, Wc, 65) logits; desc: (B, Hc, Wc, 256) L2-normalised grid.
    `subpixel` shifts winners to their sub-pixel peak (beyond-reference
    accuracy improvement; default off = integer-pixel parity): True/"axis"
    = separable per-axis parabolas, "quad" = coupled 2D quadratic fit
    (refine_subpixel_quad).
    """
    heat_raw = heatmap_from_logits(det)
    h, w = heat_raw.shape[1], heat_raw.shape[2]
    # exclude sub-threshold points from suppression participation parity:
    # the reference only considers > conf_thresh points at all (:203).
    heat = jnp.where(heat_raw > conf_thresh, heat_raw, 0.0)
    suppressed = nms(heat, nms_radius, nms_iterations)
    xy, score, valid = select_topk(suppressed, k, conf_thresh, border,
                                   post_nms_radius=nms_radius)
    if subpixel:
        if subpixel not in (True, "axis", "quad"):
            raise ValueError(
                f"subpixel_refine={subpixel!r}: expected False, True/'axis' "
                "(per-axis parabolas) or 'quad' (coupled 2D quadratic) — "
                "refusing to silently fall back to the per-axis refiner")
        # refine on the PRE-threshold heatmap: sub-threshold neighbours must
        # contribute their true scores or the parabola vertex is biased
        # toward the clamp for winners near conf_thresh
        refine = (refine_subpixel_quad if subpixel == "quad"
                  else refine_subpixel)
        xy = refine(heat_raw, xy, valid)
    descs = sample_descriptors(desc, xy, (h, w))
    return Keypoints(xy=xy, score=score, valid=valid, desc=descs)
