"""spsvo_tpu — TPU-native SuperPoint stereo visual odometry framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
YukunXia/SuperPoint-Stereo-Visual-Odometry (stereo VO on KITTI with
swappable classic / SuperPoint-CNN feature front ends).
"""
import jax as _jax

# The geometry stack (triangulation, Kabsch, LM normal equations) is
# correctness-critical in fp32: this platform's DEFAULT matmul precision is
# bfloat16 (~1e-3 relative error), which corrupts pose solves. Pin fp32
# matmul semantics globally; the CNN trunk opts back into fast bf16 MXU
# passes by casting its inputs to bfloat16 (native single-pass, unaffected
# by this knob) when Precision.BF16 is selected.
_jax.config.update("jax_default_matmul_precision", "float32")

# Persistent XLA compilation cache — the TPU-native analogue of the
# reference's compiled-.engine file cache keyed by config
# (feature_detection_neural_network.cpp:44-49, engine_generation.py:35-39
# skip-if-exists). First compile of a config is slow; every later process
# reuses the binary.
import os as _os

_cache_dir = _os.environ.get(
    "SPSVO_XLA_CACHE", _os.path.expanduser("~/.cache/spsvo_tpu/xla"))
if _cache_dir and _cache_dir != "0":
    _os.makedirs(_cache_dir, exist_ok=True)
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from spsvo_tpu.config import (VOConfig, DetectorType, DescriptorType,
                              MatcherType, SelectorType, Precision, MatchType)

__version__ = "0.1.0"
