"""Per-family compute-cost report — the reference's efficiency study, TPU-native.

The reference measured energy per inference for each backbone on a Jetson
with an external power meter (report §4.2.2, Table 2: mbv1 0.595 J, mbv2
0.798 J, squeeze 0.413 J, resnet18 0.319 J). No power rail is readable from
inside this container, so the TPU-native counterpart is the compiler's own
cost model: XLA's `cost_analysis()` on the compiled stereo-frontend program
gives FLOPs and HBM bytes per frame, and together with the measured FPS an
achieved-FLOP/s figure per family.

Writes docs/EFFICIENCY.md. Run: python tools/flops_report.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import spsvo_tpu  # noqa: E402
from spsvo_tpu.config import MODEL_PREFIXES  # noqa: E402
from spsvo_tpu.models import zoo  # noqa: E402

H, W = 120, 392
BATCH = 2  # one stereo pair


def _measured_fps() -> float:
    """Headline fp32 FPS: --fps arg, else the newest BENCH_r*.json at the
    repo root (the driver's record of the last real-TPU bench run)."""
    import argparse
    import glob
    import json

    ap = argparse.ArgumentParser()
    ap.add_argument("--fps", type=float, default=None,
                    help="measured headline FPS (overrides BENCH_r*.json)")
    args, _ = ap.parse_known_args()
    if args.fps:
        return args.fps
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in sorted(glob.glob(os.path.join(repo, "BENCH_r*.json")),
                    reverse=True):
        try:
            with open(p) as f:
                v = json.load(f).get("parsed", {}).get("value")
            if v:
                return float(v)
        except Exception:
            continue
    raise SystemExit("no BENCH_r*.json with a parsed value found; "
                     "pass --fps explicitly")


def analyze(prefix: str) -> dict:
    import jax
    import jax.numpy as jnp

    apply_fn, params = zoo.load_model(prefix)
    x = jnp.zeros((BATCH, H, W, 1), jnp.float32)
    lowered = jax.jit(lambda p, x: apply_fn(p, x)).lower(params, x)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns [dict]
        cost = cost[0]
    n_params = sum(int(np.prod(v.shape))
                   for v in jax.tree.leaves(params))
    t0 = time.perf_counter()
    out = compiled(params, x)
    jax.tree.map(np.asarray, out)
    return {
        "prefix": prefix,
        "params": n_params,
        "gflops_per_frame": float(cost.get("flops", 0.0)) / 1e9,
        "hbm_mb_per_frame": float(cost.get("bytes accessed", 0.0)) / 2**20,
        "first_run_s": time.perf_counter() - t0,
    }


def analyze_device_classic(detector: str, descriptor: str = "brief") -> dict:
    """Same cost model on the device-classic front ends: one stereo pair
    through FAST/GFTT/AKAZE detection + BRIEF/BRISK/M-LDB description
    (ops/orb.py, ops/akaze.py)."""
    import jax
    import jax.numpy as jnp

    from spsvo_tpu.ops.orb import orb_frontend_batch

    x = jnp.zeros((BATCH, H, W), jnp.float32)
    fn = jax.jit(lambda x: orb_frontend_batch(
        x, k=512, border=16, detector=detector, descriptor=descriptor,
        n_levels=8 if detector == "orb" else 1))
    cost = fn.lower(x).compile().cost_analysis()
    if isinstance(cost, list):
        cost = cost[0]
    name = detector if descriptor in ("brief", "mldb") else \
        f"{detector}_{descriptor}"
    return {
        "prefix": f"device_{name}",
        "params": 0,
        "gflops_per_frame": float(cost.get("flops", 0.0)) / 1e9,
        "hbm_mb_per_frame": float(cost.get("bytes accessed", 0.0)) / 2**20,
    }


def main() -> None:
    docs = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs")
    os.makedirs(docs, exist_ok=True)
    rows = []
    for prefix in MODEL_PREFIXES:
        try:
            rows.append(analyze(prefix))
            print(rows[-1], flush=True)
        except Exception as e:  # record and continue
            print(f"{prefix} FAILED: {e}", file=sys.stderr)
    for det, desc in (("orb", "brief"), ("shi_tomasi", "brief"),
                      ("orb", "brisk"), ("akaze", "mldb")):
        try:
            rows.append(analyze_device_classic(det, desc))
            print(rows[-1], flush=True)
        except Exception as e:
            print(f"device_{det}/{desc} FAILED: {e}", file=sys.stderr)

    # reference Table 2 energy (J/inference on Jetson Nano), for side-by-side
    ref_energy = {"sp_mbv1": 0.595, "sp_mbv2": 0.798, "sp_squeeze": 0.413,
                  "sp_resnet18": 0.319}

    lines = [
        "# Per-family compute cost (XLA cost model, stereo pair @ 120x392)",
        "",
        "The reference's efficiency study measured energy per inference on a",
        "Jetson Nano with an external meter (report Table 2). The TPU-native",
        "counterpart is the compiler's cost model on the compiled stereo",
        "forward pass (batch-2, 120x392): FLOPs and HBM traffic per frame.",
        "Generated by `tools/flops_report.py`.",
        "",
        "| family | params | GFLOP/frame | HBM MB/frame | reference J/inf "
        "(Jetson) |",
        "|---|---|---|---|---|",
    ]
    for r in rows:
        ref = ref_energy.get(r["prefix"])
        lines.append(
            f"| {r['prefix']} | {r['params']:,} | "
            f"{r['gflops_per_frame']:.2f} | {r['hbm_mb_per_frame']:.1f} | "
            f"{ref if ref is not None else '—'} |")
    mbv1 = next((r for r in rows if r["prefix"] == "sp_mbv1"), None)
    lines += [""]
    if mbv1 is not None and mbv1["hbm_mb_per_frame"] > 0:
        fps = _measured_fps()
        gbs = mbv1["hbm_mb_per_frame"] / 1024.0 * fps
        tf = mbv1["gflops_per_frame"] / 1000.0 * fps
        lines += [
            "## Roofline: the fp32 trunk is HBM-bandwidth-bound",
            "",
            f"sp_mbv1 moves {mbv1['hbm_mb_per_frame']:.0f} MB of HBM "
            f"traffic per stereo frame but only {mbv1['gflops_per_frame']:.1f}"
            " GFLOP — arithmetic intensity ~"
            f"{mbv1['gflops_per_frame']*1e9/(mbv1['hbm_mb_per_frame']*2**20):.0f}"
            f" FLOP/byte. At the measured {fps:.0f}-FPS fp32 headline that is "
            f"~{gbs:.0f} GB/s of sustained HBM traffic (one v5-lite chip's "
            f"bandwidth class) against only {tf:.1f} TFLOP/s of compute:",
            "the depthwise trunk is bandwidth-limited, not MXU-limited.",
            "bf16 (half the trunk bytes) lifts the end-to-end pipeline less",
            "than the trunk's own ~2x because the post-trunk stages",
            "(postprocess, matching, solve) keep their fp32 traffic; int8",
            "with static scales and epilogue requantization (1-byte",
            "inter-layer activations) goes further — see BENCH_NOTES.md for",
            "the current per-precision numbers. The fp32 trunk sits at the",
            "memory roofline: further trunk gains come from precision, not",
            "scheduling.",
        ]
    lines += [
        "",
        "Energy is not observable from inside this container; FLOPs, bytes",
        "and achieved bandwidth are the portable efficiency proxies.",
    ]
    out = os.path.join(docs, "EFFICIENCY.md")
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
