"""Isolated per-shape MFU microbenchmarks for the model's hot matmuls/convs.

PERF.md attributes the exact-mode gap to UNet convs at 76% MXU and
linears at 69%. This tool measures what XLA achieves on the SAME shapes
in isolation (no surrounding graph), which separates
"the shape's practical cap on this hardware" from "fusion/scheduling
slack in our pipeline": if an isolated op matches its in-situ MFU, the
pipeline is AT the per-shape cap and the remaining gap is physical.

Each op runs ITERS times inside one lax.scan (dispatch amortized; the
carry threads the output back as input so iterations cannot be elided),
synced by a host scalar read (platform gotcha: block_until_ready is not
reliable here).

Usage: python tools/microbench_shapes.py [--iters 50] [--batch 8]
Prints one JSON line per op: {"op", "shape", "ms", "tflops", "mfu"}.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def _time_scan(f, x, w, iters):
    """Run y=f(x,w) iters times inside one jit; returns seconds/iter."""

    @jax.jit
    def run(x, w):
        def body(carry, _):
            y = f(carry, w)
            # renormalize so the carry keeps x's scale/shape lineage:
            # cast back to input dtype and rescale to unit RMS (avoids
            # overflow across iters while keeping every iter live)
            y = y.astype(x.dtype)
            y = y * jax.lax.rsqrt(jnp.mean(jnp.square(
                y.astype(jnp.float32))) + 1e-6).astype(x.dtype)
            return y, ()
        y, _ = jax.lax.scan(body, x, None, length=iters)
        return y

    y = run(x, w)
    np.asarray(jax.tree.leaves(y)[0].ravel()[0])  # warmup sync
    t0 = time.perf_counter()
    y = run(x, w)
    np.asarray(jax.tree.leaves(y)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters


def _fold_to(y, cin):
    """Fold the op output back to cin channels CONSUMING every output
    element — slicing would let XLA dead-code-eliminate the unused
    output columns and narrow the measured matmul."""
    cout = y.shape[-1]
    if cout == cin:
        return y
    if cout % cin == 0:  # e.g. qkv (3x) / GEGLU (8x) expansions
        return y.reshape(*y.shape[:-1], cout // cin, cin).sum(-2)
    # contraction (cout < cin): every output is used; zero-pad back
    pad = [(0, 0)] * (y.ndim - 1) + [(0, cin - cout)]
    return jnp.pad(y, pad)


def conv_case(name, b, hw, cin, cout, k=3):
    x = jax.random.normal(jax.random.PRNGKey(0), (b, hw, hw, cin),
                          jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (k, k, cin, cout),
                          jnp.bfloat16) / np.sqrt(k * k * cin)

    def f(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        return _fold_to(y, x.shape[-1])

    flops = 2 * b * hw * hw * k * k * cin * cout
    return name, f"{b}x{hw}^2x{cin}->{cout} k{k}", f, x, w, flops


def linear_case(name, rows, cin, cout):
    x = jax.random.normal(jax.random.PRNGKey(0), (rows, cin), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (cin, cout),
                          jnp.bfloat16) / np.sqrt(cin)

    def f(x, w):
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return _fold_to(y, x.shape[-1])

    flops = 2 * rows * cin * cout
    return name, f"({rows},{cin})@({cin},{cout})", f, x, w, flops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
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
    for name, shape, f, x, w, flops in cases:
        try:
            s = _time_scan(f, x, w, args.iters)
        except Exception as e:  # one failed case must not kill the sweep
            print(json.dumps({"op": name, "shape": shape,
                              "error": str(e)[-200:]}), flush=True)
            continue
        tfs = flops / s / 1e12
        print(json.dumps({
            "op": name, "shape": shape, "ms": round(s * 1e3, 3),
            "tflops": round(tfs, 1),
            "mfu": round(tfs / PEAK_TFLOPS, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
