"""Pallas TPU kernel for the CFRM AdaNAFV2 grouped 3x3 convolution.

Reference op: cfrm.py:30 (nn.Conv2d(dw, dw, 3, padding=1, groups=16)).
XLA's conv emitter runs this shape class at 4-12% effective MFU no matter
how it is lowered (grouped, dense block-diagonal, supergroup folds,
batch-group — every variant measured in tools/bench_grouped.py and
PERF.md's grouped-conv log), because the per-group channel widths
(32/64/128) under-fill the 128-lane MXU tiles and the conv emitter adds
relayout copies around them. The op's TRUE cost is tiny: 154.6 GF per
stage at 512px (0.8 ms of MXU) against ~0.5 GB of activation traffic
(~0.7 ms of HBM) — it should be near memory-bound, not 7-19 ms.

Kernel design (v2 — v1's per-row (W, 128) @ (128, 128) tap matmuls were
too shallow to fill the MXU pipeline and measured 13.1 ms at s1, WORSE
than the best XLA lowering; the numbers live in PERF.md's grouped log):

- grid (SG, B, H/RB): one cell = RB output rows x one 128-channel
  "supergroup" (fold = 128/cg groups, block-diagonal inside 128x128
  weight tiles built once outside the kernel; fold pays 128/cg x FLOPs —
  4x at cg=32, 1x at cg=128 — but keeps full lane occupancy).
- the +-1 row halo rides plain BlockSpecs: the padded input is passed
  RB+2 times with single-row blocks at index maps rb*RB + j (a block
  index may be any function of the grid), so each padded row is DMA'd
  ~(RB+2)/RB x, not 3x, and never round-trips HBM again.
- in-kernel im2col into a VMEM patch buffer: 9 strided VPU copies build
  (RB*W, 9*128), then ONE deep MXU matmul (RB*W, 1152) @ (1152, 128)
  per cell — K=1152 amortizes the systolic fill that throttled v1.
- f32 accumulation inside the dot; output written back as one
  layout-compatible (RB, W, 128) block (W is a sublane-tile multiple).

Training differentiates through the CFRM branch and Pallas has no
automatic reverse rule: ``grouped_conv3_pallas`` carries a custom VJP
whose backward differentiates the mathematically identical XLA grouped
conv (same pattern as pallas_attention.py's kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SG_CH = 128  # supergroup width = one MXU lane tile
_RB = 8      # output rows per grid cell


def supported(x_shape, w_shape, groups: int) -> bool:
    """Shapes the kernel handles: SAME-padded stride-1 3x3 grouped conv,
    NHWC, channels a multiple of 128 with cin == cout (the AdaNAF shape;
    cfrm.py:30), H divisible by the row block, sublane-tile-aligned W."""
    b, h, w, c = x_shape
    kh, kw, cg, cout = w_shape
    return (kh == 3 and kw == 3 and cout == c and c % SG_CH == 0
            and cg * groups == c and SG_CH % cg == 0
            and h % _RB == 0 and w % 16 == 0 and w >= 16)


def _pack_weights(w, groups: int):
    """(3, 3, cg, C) grouped HWIO -> (SG, 9*128, 128): per supergroup,
    the 9 taps' block-diagonal 128x128 tiles stacked on the contraction
    dim (matching the kernel's (RB*W, 9*128) patch buffer)."""
    kh, kw, cg, c = w.shape
    sg = c // SG_CH
    fold = SG_CH // cg
    wp = jnp.zeros((sg, kh * kw, SG_CH, SG_CH), w.dtype)
    for s in range(sg):
        for f in range(fold):
            g = s * fold + f
            blk = w[:, :, :, g * cg:(g + 1) * cg]          # (3, 3, cg, cg)
            blk = blk.reshape(kh * kw, cg, cg)
            wp = wp.at[s, :, f * cg:(f + 1) * cg,
                       f * cg:(f + 1) * cg].set(blk)
    return wp.reshape(sg, kh * kw * SG_CH, SG_CH)


def _kernel(*refs, rb: int, width: int):
    rows, wk_ref, o_ref, slab, patch = (
        refs[:rb + 2], refs[rb + 2], refs[rb + 3], refs[rb + 4],
        refs[rb + 5])
    for j in range(rb + 2):
        slab[j] = rows[j][0, 0]                            # (W+2, 128)
    for dy in range(3):
        for dx in range(3):
            t = dy * 3 + dx
            patch[:, t * SG_CH:(t + 1) * SG_CH] = (
                slab[dy:dy + rb, dx:dx + width, :]
                .reshape(rb * width, SG_CH))
    acc = lax.dot_general(patch[...], wk_ref[0],
                          (((1,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
    o_ref[0] = acc.reshape(rb, width, SG_CH).astype(o_ref.dtype)


def _kernel_v3(*refs, rb: int, width: int, wpad: int):
    """dx commuted to the OUTPUT side: shifts are linear, so
    out = sum_dx shift_W(sum_dy x[r+dy] @ W[dy,dx], dx). The patch
    buffer K-concats only the 3 dy rows (every copy lane/sublane
    ALIGNED — no dx offsets on the input side), three
    (RB*Wp, 384) @ (384, 128) matmuls produce z_dx over the padded
    width, and the dx shift becomes two shifted VPU adds of the z
    maps. Replaces v2's nine (two-thirds misaligned) patch copies."""
    rows, wk_ref, o_ref, slab, patch = (
        refs[:rb + 2], refs[rb + 2], refs[rb + 3], refs[rb + 4],
        refs[rb + 5])
    for j in range(rb + 2):
        slab[j] = rows[j][0, 0]                            # (Wp, 128)
    for dy in range(3):
        patch[:, dy * SG_CH:(dy + 1) * SG_CH] = (
            slab[dy:dy + rb, :, :].reshape(rb * wpad, SG_CH))
    z = []
    for dx in range(3):
        zf = lax.dot_general(patch[...], wk_ref[0, dx],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
        z.append(zf.reshape(rb, wpad, SG_CH))
    acc = (z[0][:, 0:width, :] + z[1][:, 1:1 + width, :]
           + z[2][:, 2:2 + width, :])
    o_ref[0] = acc.astype(o_ref.dtype)


def _pack_weights_v3(w, groups: int):
    """(3, 3, cg, C) -> (SG, 3, 3*128, 128): per (supergroup, dx), the 3
    dy taps' block-diagonal tiles stacked on the contraction dim."""
    wp = _pack_weights(w, groups)            # (sg, 9*128, 128)
    sg = wp.shape[0]
    wp = wp.reshape(sg, 3, 3, SG_CH, SG_CH)  # (sg, dy, dx, 128, 128)
    wp = wp.transpose(0, 2, 1, 3, 4)         # (sg, dx, dy, 128, 128)
    return wp.reshape(sg, 3, 3 * SG_CH, SG_CH)


@functools.partial(jax.jit,
                   static_argnames=("groups", "interpret", "variant"))
def _forward(x, w, groups: int, interpret: bool = False,
             variant: str = "v3"):
    b, h, width, c = x.shape
    sg = c // SG_CH
    rb = _RB
    # v3 pads the width so RIGHT-padded rows stay one sublane-tile-
    # compatible block: 1 real SAME-pad col left, 15 right (cols beyond
    # width+1 are zero and never read by the output windows)
    wpad = width + 16 if variant == "v3" else width + 2
    if variant == "v3":
        wk = _pack_weights_v3(w.astype(x.dtype), groups)
        kern = functools.partial(_kernel_v3, rb=rb, width=width,
                                 wpad=wpad)
        wk_spec = pl.BlockSpec((1, 3, 3 * SG_CH, SG_CH),
                               lambda s, bi, ri: (s, 0, 0, 0))
        patch_shape = (rb * wpad, 3 * SG_CH)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 15), (0, 0)))
    else:
        wk = _pack_weights(w.astype(x.dtype), groups)
        kern = functools.partial(_kernel, rb=rb, width=width)
        wk_spec = pl.BlockSpec((1, 9 * SG_CH, SG_CH),
                               lambda s, bi, ri: (s, 0, 0))
        patch_shape = (rb * width, 9 * SG_CH)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # rb+2 shifted single-row views of the padded array: the row halo as
    # plain BlockSpec index offsets (block row-size 1 => block index ==
    # row index, so rb*RB + j is expressible)
    row_spec = lambda j: pl.BlockSpec(
        (1, 1, wpad, SG_CH),
        lambda s, bi, ri, j=j: (bi, ri * rb + j, 0, s))
    return pl.pallas_call(
        kern,
        grid=(sg, b, h // rb),
        in_specs=[row_spec(j) for j in range(rb + 2)] + [wk_spec],
        out_specs=pl.BlockSpec((1, rb, width, SG_CH),
                               lambda s, bi, ri: (bi, ri, 0, s)),
        out_shape=jax.ShapeDtypeStruct((b, h, width, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((rb + 2, wpad, SG_CH), x.dtype),
                        pltpu.VMEM(patch_shape, x.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "parallel", "arbitrary")),
        interpret=interpret,
    )(*([xp] * (rb + 2) + [wk]))


def _xla_reference(x, w, groups: int):
    return lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def grouped_conv3_pallas(x, w, groups: int, interpret: bool = False,
                         variant: str = "v3"):
    """SAME-padded stride-1 grouped 3x3 conv (NHWC x HWIO), Pallas
    forward, XLA-graph backward. Check ``supported`` first."""
    return _forward(x, w, groups, interpret, variant)


def _fwd(x, w, groups: int, interpret: bool, variant: str):
    return _forward(x, w, groups, interpret, variant), (x, w)


def _bwd(groups: int, interpret: bool, variant: str, res, g):
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _xla_reference(xx, ww, groups), x, w)
    return vjp(g)


grouped_conv3_pallas.defvjp(_fwd, _bwd)
