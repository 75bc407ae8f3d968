"""SuperPoint model zoo.

Covers the reference's 6 backbone families (reference
scripts/engine_generation.py:25 and models/*.onnx; SURVEY.md C17):

  * sp_mbv1, sp_mbv2, sp_squeeze — weights imported from the bundled ONNX
    exports via `onnx_import`;
  * superpoint_pretrained (original VGG-style SuperPoint), sp_sparse,
    sp_resnet18 — those ONNX files are LFS-stripped in the reference
    checkout (.MISSING_LARGE_BLOBS), so the architectures are defined here
    from the published SuperPoint paper / report description and initialised
    randomly unless a weights .npz is provided.

All models share the same contract as the reference engines
(feature_detection_neural_network.cpp:96-132): input (B, H, W, 1) float in
[0, 1] -> `output_det` (B, H/8, W/8, 65) raw logits and `output_desc`
(B, H/8, W/8, 256) L2-normalised, NHWC on TPU (the reference is NCHW).

A model is `(apply_fn, params)` where apply is the jittable graph interpreter
from `onnx_import.make_apply`; hand-defined architectures build the same
graph IR programmatically with `GraphBuilder`.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from spsvo_tpu.models.onnx_import import OnnxGraph, OnnxNode, make_apply

REFERENCE_MODELS_DIR = "/root/reference/src/odml_visual_odometry/models"
BUNDLED_ONNX = {"sp_mbv1", "sp_mbv2", "sp_squeeze"}
ALL_PREFIXES = ("superpoint_pretrained", "sp_sparse", "sp_mbv1", "sp_mbv2",
                "sp_squeeze", "sp_resnet18")


class GraphBuilder:
    """Programmatic construction of the model-graph IR.

    Emits the same node/param structures the ONNX importer produces, so the
    single `make_apply` interpreter serves both imported and hand-defined
    architectures.
    """

    def __init__(self, input_name: str = "input"):
        self.nodes: List[OnnxNode] = []
        self.shapes: Dict[str, Tuple[int, ...]] = {}  # param name -> shape
        self.input_name = input_name
        self._ctr = 0

    def _fresh(self, hint: str) -> str:
        self._ctr += 1
        return f"{hint}_{self._ctr}"

    def conv(self, x: str, name: str, in_ch: int, out_ch: int, kernel: int,
             stride: int = 1, groups: int = 1, relu: bool = True,
             pad: Optional[int] = None) -> str:
        pad = kernel // 2 if pad is None else pad
        w_name, b_name = f"{name}.weight", f"{name}.bias"
        # HWIO layout (TPU native)
        self.shapes[w_name] = (kernel, kernel, in_ch // groups, out_ch)
        self.shapes[b_name] = (out_ch,)
        out = self._fresh(name)
        self.nodes.append(OnnxNode(
            "Conv", [x, w_name, b_name], [out],
            {"pads": {"ints": [pad, pad, pad, pad]},
             "strides": {"ints": [stride, stride]},
             "dilations": {"ints": [1, 1]},
             "group": {"i": groups}}))
        if relu:
            out = self.relu(out)
        return out

    def relu(self, x: str) -> str:
        out = self._fresh("relu")
        self.nodes.append(OnnxNode("Relu", [x], [out], {}))
        return out

    def bn(self, x: str, name: str, ch: int, relu: bool = True) -> str:
        names = [f"{name}.weight", f"{name}.bias", f"{name}.running_mean",
                 f"{name}.running_var"]
        for n in names:
            self.shapes[n] = (ch,)
        out = self._fresh(name)
        self.nodes.append(OnnxNode(
            "BatchNormalization", [x] + names, [out],
            {"epsilon": {"f": 1e-5}}))
        if relu:
            out = self.relu(out)
        return out

    def maxpool(self, x: str, kernel: int = 2, stride: int = 2) -> str:
        out = self._fresh("pool")
        self.nodes.append(OnnxNode(
            "MaxPool", [x], [out],
            {"kernel_shape": {"ints": [kernel, kernel]},
             "strides": {"ints": [stride, stride]},
             "pads": {"ints": [0, 0, 0, 0]}}))
        return out

    def add(self, a: str, b: str) -> str:
        out = self._fresh("add")
        self.nodes.append(OnnxNode("Add", [a, b], [out], {}))
        return out

    def concat(self, xs: List[str]) -> str:
        out = self._fresh("cat")
        self.nodes.append(OnnxNode("Concat", xs, [out], {"axis": {"i": 1}}))
        return out

    def l2norm_div(self, x: str, out_name: str) -> str:
        norm = self._fresh("l2")
        self.nodes.append(OnnxNode(
            "ReduceL2", [x], [norm],
            {"axes": {"ints": [1]}, "keepdims": {"i": 1}}))
        self.nodes.append(OnnxNode("Div", [x, norm], [out_name], {}))
        return out_name

    def heads(self, feat: str, feat_ch: int) -> None:
        """Shared SuperPoint det(65) / desc(256) heads, matching the bundled
        graphs' tail structure (3x3 conv+relu then 1x1 conv; desc adds an
        in-graph L2 normalisation)."""
        pa = self.conv(feat, "convPa", feat_ch, 256, 3, relu=True)
        self.nodes.append(OnnxNode(
            "Conv", [pa, "convPb.weight", "convPb.bias"], ["output_det"],
            {"pads": {"ints": [0, 0, 0, 0]}, "strides": {"ints": [1, 1]},
             "dilations": {"ints": [1, 1]}, "group": {"i": 1}}))
        self.shapes["convPb.weight"] = (1, 1, 256, 65)
        self.shapes["convPb.bias"] = (65,)
        da = self.conv(feat, "convDa", feat_ch, 256, 3, relu=True)
        db = self.conv(da, "convDb", 256, 256, 1, relu=False, pad=0)
        self.l2norm_div(db, "output_desc")

    def build(self) -> OnnxGraph:
        return OnnxGraph(self.nodes, {}, [self.input_name],
                         ["output_det", "output_desc"])

    def init_params(self, key: jax.Array) -> Dict[str, jnp.ndarray]:
        """He-normal conv init, standard BN init."""
        params: Dict[str, jnp.ndarray] = {}
        names = sorted(self.shapes)
        keys = jax.random.split(key, len(names))
        for k, name in zip(keys, names):
            shape = self.shapes[name]
            if name.endswith(".weight") and len(shape) == 4:
                fan_in = shape[0] * shape[1] * shape[2]
                params[name] = (jax.random.normal(k, shape, jnp.float32)
                                * jnp.sqrt(2.0 / fan_in))
            elif name.endswith(".running_var") or (
                    name.endswith(".weight") and len(shape) == 1):
                params[name] = jnp.ones(shape, jnp.float32)
            else:
                params[name] = jnp.zeros(shape, jnp.float32)
        return params


# --------------------------------------------------------------------------
# Hand-defined architectures (LFS-stripped families)
# --------------------------------------------------------------------------

def build_superpoint_vgg() -> GraphBuilder:
    """Original MagicLeap SuperPoint backbone: VGG-style
    64-64 / 64-64 / 128-128 / 128-128 with 3 max-pools (SuperPoint paper;
    SURVEY.md C17). Used for `superpoint_pretrained`."""
    g = GraphBuilder()
    x = g.conv(g.input_name, "conv1a", 1, 64, 3)
    x = g.conv(x, "conv1b", 64, 64, 3)
    x = g.maxpool(x)
    x = g.conv(x, "conv2a", 64, 64, 3)
    x = g.conv(x, "conv2b", 64, 64, 3)
    x = g.maxpool(x)
    x = g.conv(x, "conv3a", 64, 128, 3)
    x = g.conv(x, "conv3b", 128, 128, 3)
    x = g.maxpool(x)
    x = g.conv(x, "conv4a", 128, 128, 3)
    x = g.conv(x, "conv4b", 128, 128, 3)
    g.heads(x, 128)
    return g


def build_sp_sparse() -> GraphBuilder:
    """`sp_sparse` ONNX is LFS-stripped; per the report it is the pretrained
    VGG backbone retrained with sparsity regularisation — architecturally
    identical to superpoint_pretrained, so we reuse that graph."""
    return build_superpoint_vgg()


def build_sp_resnet18() -> GraphBuilder:
    """ResNet18 encoder truncated at stride 8 (report §4.1.2 retrained
    backbone; 3 stages of 2 basic blocks, stride via max-pools to mirror the
    other exports' pooling style)."""
    g = GraphBuilder()
    x = g.conv(g.input_name, "stem.conv", 1, 64, 3)
    x = g.bn(x, "stem.bn", 64)

    def basic_block(x: str, name: str, in_ch: int, out_ch: int) -> str:
        identity = x
        y = g.conv(x, f"{name}.conv1", in_ch, out_ch, 3, relu=False)
        y = g.bn(y, f"{name}.bn1", out_ch, relu=True)
        y = g.conv(y, f"{name}.conv2", out_ch, out_ch, 3, relu=False)
        y = g.bn(y, f"{name}.bn2", out_ch, relu=False)
        if in_ch != out_ch:
            identity = g.conv(identity, f"{name}.down", in_ch, out_ch, 1,
                              relu=False, pad=0)
        return g.relu(g.add(y, identity))

    x = basic_block(x, "layer1.0", 64, 64)
    x = basic_block(x, "layer1.1", 64, 64)
    x = g.maxpool(x)
    x = basic_block(x, "layer2.0", 64, 128)
    x = basic_block(x, "layer2.1", 128, 128)
    x = g.maxpool(x)
    x = basic_block(x, "layer3.0", 128, 128)
    x = basic_block(x, "layer3.1", 128, 128)
    x = g.maxpool(x)
    g.heads(x, 128)
    return g


_BUILDERS: Dict[str, Callable[[], GraphBuilder]] = {
    "superpoint_pretrained": build_superpoint_vgg,
    "sp_sparse": build_sp_sparse,
    "sp_resnet18": build_sp_resnet18,
}


# --------------------------------------------------------------------------
# Registry / loading
# --------------------------------------------------------------------------

def weights_dir() -> str:
    d = os.environ.get("SPSVO_WEIGHTS_DIR",
                       os.path.join(os.path.dirname(__file__), "..", "..",
                                    "weights"))
    return os.path.abspath(d)


def load_model(prefix: str, compute_dtype=jnp.float32, seed: int = 0,
               models_dir: Optional[str] = None, int8: bool = False,
               int8_calibration=None, int8_percentile: Optional[float] = 99.9):
    """Load a model family by its reference prefix.

    Returns (apply_fn, params). apply_fn(params, x_nhwc) ->
    {"output_det": (B,Hc,Wc,65), "output_desc": (B,Hc,Wc,256)}.
    `int8=True` post-training-quantizes the conv trunk (weights per-channel
    int8, int8 MXU path); activations use dynamic per-tensor scales unless
    `int8_calibration` ((N, H, W, 1) float images in [0, 1]) is given, in
    which case static calibrated scales are baked into the params and the
    per-conv dynamic absmax passes disappear. `int8_percentile` clips the
    calibrated scales at that |x| percentile (None = absmax): measured over
    three corridor drives (BENCH_NOTES.md), absmax calibration averages
    5.4% drift vs fp32's 2.6% while 99.9-percentile clipping averages
    2.5% — accuracy on par with fp32/bf16 at int8 speed on most drives.
    Caveat (round-5 finding, BENCH_NOTES): end-to-end VO drift under the
    int8 trunk is chaotically sensitive to the exact calibrated scale
    values — near-identical calibrations (scales within 1%) produced
    0.27% and 6.84% drift on the same drive, and nudging ONE scale by
    0.5% moved it 6.8% -> 2.1%. The mean over drives is fp32-class, but
    the distribution has a catastrophic tail that no calibration recipe
    tested removes; prefer the bf16 trunk where accuracy matters.
    """
    if prefix in BUNDLED_ONNX:
        d = models_dir or REFERENCE_MODELS_DIR
        path = os.path.join(d, f"{prefix}_b1.onnx")
        from spsvo_tpu.models.onnx_import import parse_onnx, build_params
        graph = parse_onnx(path)
        params = {k: jnp.asarray(v)
                  for k, v in build_params(graph).items()}
    else:
        if prefix not in _BUILDERS:
            raise KeyError(f"unknown model prefix {prefix!r}; "
                           f"known: {ALL_PREFIXES}")
        builder = _BUILDERS[prefix]()
        graph = builder.build()
        npz = os.path.join(weights_dir(), f"{prefix}.npz")
        if os.path.exists(npz):
            data = np.load(npz)
            params = {k: jnp.asarray(data[k]) for k in data.files}
        else:
            params = builder.init_params(jax.random.PRNGKey(seed))
    if int8:
        from spsvo_tpu.models.quantize import (calibrate_activation_scales,
                                               quantize_weights)
        conv_names = {n.inputs[1] for n in graph.nodes if n.op == "Conv"}
        ascales = {}
        if int8_calibration is not None:
            ascales = calibrate_activation_scales(
                graph, params, jnp.asarray(int8_calibration),
                percentile=int8_percentile)
        params = quantize_weights(params, conv_names)
        params.update(ascales)
    return make_apply(graph, compute_dtype), params


def save_params(prefix: str, params: Dict[str, jax.Array]) -> str:
    os.makedirs(weights_dir(), exist_ok=True)
    path = os.path.join(weights_dir(), f"{prefix}.npz")
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})
    return path


def param_count(params: Dict[str, jax.Array]) -> int:
    return int(sum(np.prod(v.shape) for v in params.values()))
