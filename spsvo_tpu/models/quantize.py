"""Post-training int8 quantization for the CNN trunk.

Extends the reference's FP32/FP16 engine grid with an int8 mode (the
BASELINE config list names "quantized bf16/int8 SuperPoint"): convolution
weights are quantized per-output-channel to int8 offline; activations are
quantized per-tensor dynamically at each conv input; the conv itself runs as
an int8 x int8 -> int32 contraction on the MXU, then dequantizes into fp32
for bias/BN/ReLU (which XLA fuses). Heads and normalisation stay fp32 — the
descriptor L2-norm and detector softmax are precision-critical.

This is weight/activation PTQ with dynamic activation scales (no calibration
dataset needed); accuracy is validated in tests against the fp32 trunk
(descriptor cosine similarity / keypoint overlap).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def quantize_weights(params: Dict[str, jax.Array], conv_weight_names
                     ) -> Dict[str, jax.Array]:
    """Replace HWIO conv weights with int8 values + fp32 per-channel scales.

    Adds `<name>#scale` entries; non-conv params pass through.
    """
    out: Dict[str, jax.Array] = {}
    for name, w in params.items():
        if name in conv_weight_names:
            absmax = jnp.max(jnp.abs(w), axis=(0, 1, 2), keepdims=True)
            scale = jnp.maximum(absmax, 1e-12) / 127.0
            q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
            out[name] = q
            out[f"{name}#scale"] = scale[0, 0, 0].astype(jnp.float32)
        else:
            out[name] = w
    return out


def int8_conv(x: jax.Array, w_q: jax.Array, w_scale: jax.Array,
              strides, padding, dilations, groups: int) -> jax.Array:
    """Dynamically-quantized int8 convolution.

    x: (B, H, W, C) fp32; w_q: (kh, kw, Cin/g, Cout) int8;
    w_scale: (Cout,) fp32. Returns fp32.
    """
    a_absmax = jnp.maximum(jnp.max(jnp.abs(x)), 1e-12)
    a_scale = a_absmax / 127.0
    x_q = jnp.clip(jnp.round(x / a_scale), -127, 127).astype(jnp.int8)
    y = jax.lax.conv_general_dilated(
        x_q, w_q, window_strides=strides, padding=padding,
        rhs_dilation=dilations,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (a_scale * w_scale)
