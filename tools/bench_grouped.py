"""Grouped-conv lowering experiment for the CFRM AdaNAFV2 3x3 (groups=16).

Production (models/cfrm.py:_dense_grouped_conv) expands the grouped kernel
to a dense block-diagonal one because XLA's feature_group_count=16
lowering measured ~11% MXU + ~10 ms of relayout copies — but the dense
form pays 16x the FLOPs (2.47 TF per AdaNAF stage at 512px). This
harness measures every intermediate lowering at the three CFRM stage
shapes to find the cheapest CORRECT one:

  dense     block-diagonal dense conv (current production; 16x FLOPs)
  native    feature_group_count=16 (true FLOPs, known-bad lowering)
  dense4    feature_group_count=4 with 4-group block-diag kernels
            (4x FLOPs; grouped lowering with 4x wider per-group channels)
  loop16    16 separate dense convs, concatenated (true FLOPs; per-group
            cin/cout of 32/64/128 pad the 128-lane tile at stages 1/2)
  bgc       group-to-batch reshape + batch_group_count=16 conv (true
            FLOPs, one conv op, per-group kernels ride the batch dim)

MFU is computed against the TRUE grouped FLOPs for every variant, so the
dense rows show effective utilization (98% MXU / 16 = ~6% effective).

Usage: python tools/bench_grouped.py  [GROUPED_STAGES=s1,s2,s3]
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
from unirestore_tpu.models.cfrm import (GROUPS, _block_diag_kernel,
                                        _super_block_kernel)

PEAK_TFLOPS = 197.0

# CFRM AdaNAFV2 stage shapes at 512px batch 8: dw = 4*c on the /2, /4, /8
# feature maps (reference autoencoder.py:92-98, channels 128/256/512)
STAGES = [("s1", 256, 512), ("s2", 128, 1024), ("s3", 64, 2048)]


def _conv(x, w, groups=1, batch_groups=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, batch_group_count=batch_groups)


def v_dense(x, w):
    return _conv(x, w)  # w pre-expanded to block-diagonal in main()


def v_native(x, w):
    return _conv(x, w, groups=GROUPS)


def v_dense4(x, w):
    return _conv(x, w, groups=4)  # w pre-expanded in main()


def v_dense8(x, w):
    return _conv(x, w, groups=8)  # 2x-FLOPs fold


def v_dense2(x, w):
    return _conv(x, w, groups=2)  # 8x-FLOPs fold


def v_loop16(x, w):
    b, h, wd, c = x.shape
    cg = c // GROUPS
    cgo = w.shape[-1] // GROUPS
    outs = [
        _conv(x[..., g * cg:(g + 1) * cg],
              w[:, :, :, g * cgo:(g + 1) * cgo])
        for g in range(GROUPS)
    ]
    return jnp.concatenate(outs, axis=-1)


def _v_loop_sg(x, w, sg: int):
    """``sg`` supergroup slices of 128*? channels, each a PLAIN DENSE conv
    (no feature_group_count at all): the per-slice kernel is the
    block-diagonal expansion of GROUPS/sg real groups, so FLOPs are
    (GROUPS/sg)x true — but each conv is a dense 128-aligned-channel conv,
    the shape class the microbenchmarks measure at 85% MFU
    (vae_conv_512_128 et al.) while XLA's feature_group_count emitter
    runs the same math at ~26%. Slices/concat are layout-clean channel
    splits that XLA fuses into the convs' input/output."""
    c = x.shape[-1]
    cs = c // sg  # channels per slice
    cgo = w.shape[-1] // GROUPS
    fold = GROUPS // sg
    outs = []
    for s in range(sg):
        ws = _block_diag_kernel(
            w[:, :, :, s * fold * cgo:(s + 1) * fold * cgo], fold)
        outs.append(_conv(x[..., s * cs:(s + 1) * cs], ws))
    return jnp.concatenate(outs, axis=-1)


def v_loop128(x, w):
    """Supergroup slices sized to exactly 128 channels (the MXU lane
    width): s1 -> 4 slices of 128 (4x FLOPs), s2 -> 8 slices (2x),
    s3 -> 16 slices (1x, true FLOPs)."""
    sg = x.shape[-1] // 128
    return _v_loop_sg(x, w, sg)


def v_loop256(x, w):
    """256-channel supergroup slices (half the per-conv op count of
    loop128 at 2x its FLOPs): probes whether per-conv overhead or FLOPs
    dominate."""
    sg = max(1, x.shape[-1] // 256)
    return _v_loop_sg(x, w, sg)


def v_bgc128(x, w):
    """batch_group_count at 128-channel supergroup granularity: one conv
    op (no concat), supergroups ride the batch dim, per-supergroup
    kernels are dense 128->cout block-diag expansions."""
    b, h, wd, c = x.shape
    sg = c // 128
    fold = GROUPS // sg
    cgo = w.shape[-1] // GROUPS
    xg = (x.reshape(b, h, wd, sg, 128)
           .transpose(3, 0, 1, 2, 4)
           .reshape(sg * b, h, wd, 128))
    ws = jnp.concatenate(
        [_block_diag_kernel(
            w[:, :, :, s * fold * cgo:(s + 1) * fold * cgo], fold)
         for s in range(sg)], axis=-1)
    return _conv(xg, ws, batch_groups=sg)


def v_bgc(x, w):
    """Groups -> batch: x (B,H,W,G*cg) -> (G*B,H,W,cg); per-group kernels
    stacked on the output-channel dim with batch_group_count=G."""
    b, h, wd, c = x.shape
    cg = c // GROUPS
    cgo = w.shape[-1] // GROUPS
    xg = (x.reshape(b, h, wd, GROUPS, cg)
           .transpose(3, 0, 1, 2, 4)
           .reshape(GROUPS * b, h, wd, cg))
    # batch_group_count semantics: the (G*B) batch is split into G
    # consecutive groups and output-channel group g convolves ONLY batch
    # group g — the output comes back as (B, H, W, G*cgo), which is
    # already the grouped-conv result in group-major channel order.
    return _conv(xg, w, batch_groups=GROUPS)


def v_pallas(x, w):
    """Pallas supergroup kernel v2 (nn/pallas_grouped_conv.py): in-VMEM
    im2col patch + one deep (RB*W, 1152) @ (1152, 128) matmul per cell —
    bypasses XLA's conv emitter entirely."""
    from unirestore_tpu.nn.pallas_grouped_conv import grouped_conv3_pallas
    return grouped_conv3_pallas(x, w, GROUPS, False, "v2")


def v_pallas3(x, w):
    """Pallas kernel v3: dx shift commuted to the output side — aligned
    dy-only patch copies, three (RB*Wp, 384) @ (384, 128) matmuls, two
    shifted VPU adds."""
    from unirestore_tpu.nn.pallas_grouped_conv import grouped_conv3_pallas
    return grouped_conv3_pallas(x, w, GROUPS, False, "v3")


VARIANTS = {"dense": v_dense, "native": v_native, "dense4": v_dense4,
            "dense8": v_dense8, "dense2": v_dense2,
            "loop16": v_loop16, "bgc": v_bgc,
            "loop128": v_loop128, "loop256": v_loop256,
            "bgc128": v_bgc128, "pallas": v_pallas, "pallas3": v_pallas3}


def main():
    only = os.environ.get("GROUPED_STAGES")
    batch = int(os.environ.get("GROUPED_BATCH", "8"))
    rng = np.random.default_rng(0)
    for name, hw, dw in STAGES:
        if only and name not in only.split(","):
            continue
        cg = dw // GROUPS
        x = jnp.asarray(rng.normal(size=(batch, hw, hw, dw)) * 0.3,
                        jnp.bfloat16)
        w = jnp.asarray(rng.normal(size=(3, 3, cg, dw)) * (9 * cg) ** -0.5,
                        jnp.bfloat16)
        flops = 2 * batch * hw * hw * 9 * cg * dw  # TRUE grouped FLOPs
        print(f"== {name}: {batch}x{hw}^2x{dw} g{GROUPS} "
              f"({flops / 1e9:.1f} GF true)", flush=True)
        # kernel expansions precomputed OUTSIDE the timed fn (in production
        # they are loop-invariant; in-scan scatter chains also choke this
        # platform's remote compiler)
        wforms = {"dense": jax.jit(lambda w_: _block_diag_kernel(
                      w_, GROUPS))(w),
                  "dense4": jax.jit(lambda w_: _super_block_kernel(
                      w_, GROUPS, 4))(w),
                  "dense8": jax.jit(lambda w_: _super_block_kernel(
                      w_, GROUPS, 8))(w),
                  "dense2": jax.jit(lambda w_: _super_block_kernel(
                      w_, GROUPS, 2))(w)}
        ref = None
        sel = os.environ.get("GROUPED_VARIANTS")
        for vname, f in VARIANTS.items():
            if sel and vname not in sel.split(",") and vname != "native":
                continue  # native always runs: it is the relerr reference
            wv = wforms.get(vname, w)
            try:
                sec = PC.timeit(f, x, wv, vary=0)
                got = np.asarray(jax.jit(f)(x, wv), np.float32)
            except Exception as e:
                print(f"  {vname:8s}  FAILED: {str(e)[:90]}", flush=True)
                continue
            if ref is None:
                ref, err = got, 0.0
            else:
                err = float(np.abs(got - ref).max()
                            / max(np.abs(ref).max(), 1e-6))
            mfu = flops / sec / 1e12 / PEAK_TFLOPS
            print(f"  {vname:8s}  {sec * 1e3:7.3f} ms  eff-MFU {mfu * 100:5.1f}%"
                  f"  relerr {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
