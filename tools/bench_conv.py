"""Conv-scheduling experiment: localize the ~3.5 ms/step UNet conv slack.

PERF.md's roofline attributes ~3.5 ms/step of exact-mode gap to "conv
scheduling slack": device traces show the UNet's k3 convs at 76% MXU
in situ vs their ~90% FLOP-weighted pad-to-tile cap. Isolated per-op
microbenchmarks (tools/microbench_shapes.py) are floor-dominated below
~1 ms, so this harness measures CHAINS of back-to-back convs (resblock
density) per UNet level — enough work per scan iteration to sit well
above the ~0.5 ms dispatch floor — and A/Bs candidate lowerings:

  conv      N back-to-back k3 convs (the pure-MXU shape cap in practice)
  resblock  N x (GroupNorm + SiLU + k3 conv) — the production density;
            the delta vs `conv` is the cost XLA's scheduling adds around
            each conv (the "slack" bucket, if it reproduces in isolation)
  im2col    N x (patches -> (BHW, 9*cin) @ (9*cin, cout) matmul): the
            320-channel level pads 320->384 lanes per tap (83.3% cap)
            but 2880->2944 (97.8%) when the taps are folded into one
            contraction — wins iff XLA's conv lowering contracts per tap
            AND the 9x activation blow-up stays VMEM-resident.

Usage: python tools/bench_conv.py            (all levels, all variants)
       CONV_LEVELS=lvl0 python tools/bench_conv.py

Prints one line per (level, variant): ms/chain, ms/conv, effective MFU
against the k3 conv FLOPs (im2col included — same math, different
lowering). Results belong in PERF.md "Conv experiment log".
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

import profile_components as PC
from unirestore_tpu.nn import layers as L

PEAK_TFLOPS = 197.0  # v5e bf16
N_CHAIN = 6  # convs per scan iteration: lvl0 ~6 ms of work, above floor

# (name, hw, c): 512px batch-8 UNet levels (SD2.1 320/640/1280)
LEVELS = [("lvl0", 64, 320), ("lvl1", 32, 640), ("lvl2", 16, 1280)]


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def chain_conv(x, ws, gn):
    for w in ws:
        x = _conv(x, w)
    return x


def chain_resblock(x, ws, gn):
    for w in ws:
        x = L.group_norm(gn, x, groups=32)
        x = jax.nn.silu(x)
        x = _conv(x, w)
    return x


def _im2col_conv(x, w):
    b, h, wd, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    # patches: (B, H, W, k*k*cin) with SAME padding — one big contraction
    p = jax.lax.conv_general_dilated_patches(
        x, filter_shape=(k, k), window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    # patches emits channel-major (cin*k*k) feature order: (cin, kh, kw)
    wm = jnp.transpose(w, (2, 0, 1, 3)).reshape(cin * k * k, cout)
    return (p.reshape(b * h * wd, cin * k * k) @ wm).reshape(b, h, wd, cout)


def chain_im2col(x, ws, gn):
    for w in ws:
        x = _im2col_conv(x, w)
    return x


def _taps_conv(x, w):
    """Conv as 9 accumulated shifted matmuls: each tap is a full-width
    (BHW, cin) @ (cin, cout) GEMM — tests whether 9 independent
    128-lane-friendly GEMMs beat XLA's native conv lowering, without
    im2col's 9x patch materialization."""
    b, h, wd, cin = x.shape
    k = w.shape[0]
    cout = w.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(k):
        for dx in range(k):
            xs = xp[:, dy:dy + h, dx:dx + wd, :].reshape(b * h * wd, cin)
            y = xs @ w[dy, dx]
            out = y if out is None else out + y
    return out.reshape(b, h, wd, cout)


def chain_taps(x, ws, gn):
    for w in ws:
        x = _taps_conv(x, w)
    return x


VARIANTS = {"conv": chain_conv, "resblock": chain_resblock,
            "im2col": chain_im2col, "taps": chain_taps}


def main():
    only = os.environ.get("CONV_LEVELS")
    batch = int(os.environ.get("CONV_BATCH", "8"))
    rng = np.random.default_rng(0)
    for name, hw, c in LEVELS:
        if only and name not in only.split(","):
            continue
        x = jnp.asarray(rng.normal(size=(batch, hw, hw, c)) * 0.3,
                        jnp.bfloat16)
        ws = [jnp.asarray(rng.normal(size=(3, 3, c, c)) * (9 * c) ** -0.5,
                          jnp.bfloat16) for _ in range(N_CHAIN)]
        gn = {"scale": jnp.ones((c,), jnp.bfloat16),
              "bias": jnp.zeros((c,), jnp.bfloat16)}
        flops = 2 * batch * hw * hw * 9 * c * c * N_CHAIN  # conv math only
        print(f"== {name}: {batch}x{hw}^2x{c}, chain of {N_CHAIN} k3 convs "
              f"({flops / 1e9:.1f} GF)", flush=True)
        ref = None
        for vname, f in VARIANTS.items():
            try:
                sec = PC.timeit(functools.partial(f, gn=gn), x, ws, vary=0)
            except Exception as e:  # VMEM OOM at deep levels is expected
                print(f"  {vname:10s}  FAILED: {str(e)[:90]}", flush=True)
                continue
            got = np.asarray(jax.jit(functools.partial(f, gn=gn))(x, ws),
                             np.float32)
            if vname == "conv":
                ref, err = got, 0.0
            elif vname in ("im2col", "taps") and ref is not None:
                err = float(np.abs(got - ref).max()
                            / max(np.abs(ref).max(), 1e-6))
            else:
                err = float("nan")  # resblock computes different math
            mfu = flops / sec / 1e12 / PEAK_TFLOPS
            print(f"  {vname:10s}  {sec * 1e3:7.3f} ms/chain  "
                  f"{sec * 1e3 / N_CHAIN:6.3f} ms/conv  MFU {mfu * 100:5.1f}%"
                  f"  relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
