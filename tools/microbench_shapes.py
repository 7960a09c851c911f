"""Isolated per-shape MFU microbenchmarks for the model's hot matmuls/convs.

PERF.md attributes the exact-mode gap to UNet convs at 76% MXU and
linears at 69%. This tool measures what XLA achieves on the SAME shapes
in isolation (no surrounding graph), which separates
"the shape's practical cap on this hardware" from "fusion/scheduling
slack in our pipeline": if an isolated op matches its in-situ MFU, the
pipeline is AT the per-shape cap and the remaining gap is physical.

Timing comes from tools/profile_components.timeit — ITERS invocations
inside one lax.scan (dispatch amortized, iterations kept live by a
carry perturbation), best-of-2 after warmup, synced by a host scalar
read (platform gotcha: block_until_ready is not reliable here). The
scan carry accumulates the output's mean, so every output element is
consumed and XLA cannot dead-code-eliminate any matmul columns.

Usage: python tools/microbench_shapes.py [--iters 50] [--batch 8]
Prints one JSON line per op: {"op", "shape", "ms", "tflops", "mfu"}.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import profile_components as PC

PEAK_TFLOPS = 197.0  # v5e bf16


def tile_cap(m, k, n):
    """Shape-intrinsic MXU utilization cap from pad-to-tile granularity.

    The 128x128 systolic array consumes operands in 128-wide lane tiles on
    the contraction (k) and output (n) dims (and 8-sublane tiles on m);
    a dim that is not a multiple of 128 wastes the padded fraction of the
    array regardless of blocking. E.g. the SD2.1 320-channel level:
    k=n=320 -> (320/384)^2 = 69% cap — the measured in-situ linear MFU.
    This is an upper bound (ignores pipeline drain, memory stalls)."""
    pad = lambda d, t: d / (-(-d // t) * t)  # noqa: E731
    return pad(m, 8) * pad(k, 128) * pad(n, 128)


def conv_case(name, b, hw, cin, cout, k=3):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, cin),
                          jnp.bfloat16)
    # divide by a PYTHON float: np.float64 scalars are not weak-typed and
    # would silently promote the bf16 weights (and the measured op) to f32
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout),
                          jnp.bfloat16) / float(np.sqrt(k * k * cin))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)

    flops = 2 * b * hw * hw * k * k * cin * cout
    cap = tile_cap(b * hw * hw, k * k * cin, cout)
    return name, f"{b}x{hw}^2x{cin}->{cout} k{k}", f, x, w, flops, cap


def linear_case(name, rows, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (cin, cout),
                          jnp.bfloat16) / float(np.sqrt(cin))  # see conv_case

    def f(x, w):
        return jnp.dot(x, w, preferred_element_type=jnp.float32)

    flops = 2 * rows * cin * cout
    return (name, f"({rows},{cin})@({cin},{cout})", f, x, w, flops,
            tile_cap(rows, cin, cout))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu for a plumbing run)")
    args = ap.parse_args()
    if args.platform:  # before any backend use (env vars are too late here)
        jax.config.update("jax_platforms", args.platform)
    PC.ITERS = args.iters
    b = args.batch

    cases = [
        # UNet conv shapes at 512px input (64^2 latent), SD2.1 channels
        conv_case("unet_conv_top", b, 64, 320, 320),
        conv_case("unet_conv_mid", b, 32, 640, 640),
        conv_case("unet_conv_deep", b, 16, 1280, 1280),
        conv_case("unet_conv_bottom", b, 8, 1280, 1280),
        # VAE encoder/decoder conv shapes (the 512^2 levels dominate)
        conv_case("vae_conv_512_128", b, 512, 128, 128),
        conv_case("vae_conv_256_256", b, 256, 256, 256),
        conv_case("vae_conv_128_512", b, 128, 512, 512),
        # UNet attention projections (token-major GEMMs)
        linear_case("qkv_320", b * 4096, 320, 960),
        linear_case("out_320", b * 4096, 320, 320),
        linear_case("qkv_640", b * 1024, 640, 1920),
        linear_case("qkv_1280", b * 256, 1280, 3840),
        linear_case("ffn_320_geglu", b * 4096, 320, 2560),
        linear_case("ffn_back_320", b * 4096, 1280, 320),
        # cross-attention K/V from the (77, 1024) null embedding
        linear_case("xattn_kv_320", 77, 1024, 640),
    ]
    for name, shape, f, x, w, flops, cap in cases:
        try:
            s = PC.timeit(f, x, w, vary=0)
        except Exception as e:  # one failed case must not kill the sweep
            print(json.dumps({"op": name, "shape": shape,
                              "error": str(e)[-200:]}), flush=True)
            continue
        tfs = flops / s / 1e12
        mfu = tfs / PEAK_TFLOPS
        print(json.dumps({
            "op": name, "shape": shape, "ms": round(s * 1e3, 3),
            "tflops": round(tfs, 1),
            "mfu": round(mfu, 3),
            # pad-to-tile ceiling for this shape and how much of it we get
            "tile_cap": round(cap, 3),
            "of_cap": round(mfu / cap, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
