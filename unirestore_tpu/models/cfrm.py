"""CFRM — Controllable Feature Restoration Modules (NHWC, functional).

A CFRM stage is N NAFBlocks followed by one AdaNAFV2 block, spliced after the
first three VAE-encoder down blocks to restore degraded features at three
scales (reference: cfrm.py:12-54, instantiated at autoencoder.py:92-98 with
stage depths (1, 1, 9) on channels (128, 256, 512)).

AdaNAFV2 structure: 1x1 expand x4 -> GroupNorm(16) -> grouped 3x3 -> GELU ->
intra-group SE attention (grouped 1x1 on GAP) -> inter-group attention
(GAP -> 1x1 -> per-group scalar) -> 1x1 project -> residual -> NAFBlock.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from .nafnet import naf_block, naf_block_init

GROUPS = 16
EXPAND = 4


def _block_diag_kernel(w, groups: int):
    """Expand a grouped-conv HWIO kernel (kh, kw, cin/g, cout) to the
    mathematically identical dense block-diagonal kernel (kh, kw, cin,
    cout).

    The r1-era lowering for every AdaNAF stage; as of r3 only a fallback
    (UNIRESTORE_GROUPED_CONV=dense) — per-stage measurements showed the
    16x-FLOPs dense form loses to native grouped at the wide stages and
    to a 4-group fold at the narrow one (see _grouped_conv3). Gradients
    flow through the slice-scatter back to the grouped parameter."""
    kh, kw, cgi, cout = w.shape
    cgo = cout // groups
    dense = jnp.zeros((kh, kw, cgi * groups, cout), w.dtype)
    for g in range(groups):
        dense = dense.at[:, :, g * cgi:(g + 1) * cgi,
                         g * cgo:(g + 1) * cgo].set(
            w[:, :, :, g * cgo:(g + 1) * cgo])
    return dense


def _super_block_kernel(w, groups: int, super_g: int):
    """Fold a grouped-``groups`` HWIO kernel into a grouped-``super_g``
    one by block-diag-expanding within each supergroup (pays
    groups/super_g x FLOPs instead of the full dense groups x)."""
    kh, kw, cg, cout = w.shape
    fold = groups // super_g
    cgo = cout // groups
    dense = jnp.zeros((kh, kw, cg * fold, cout), w.dtype)
    for g in range(groups):
        lo = (g % fold) * cg
        dense = dense.at[:, :, lo:lo + cg, g * cgo:(g + 1) * cgo].set(
            w[:, :, :, g * cgo:(g + 1) * cgo])
    return dense


def _dense_grouped_conv(p, x, groups: int, padding: int):
    return L.conv2d({"w": _block_diag_kernel(p["w"], groups),
                     **({"b": p["b"]} if "b" in p else {})},
                    x, padding=padding)


def _loop128_grouped_conv(p, x, padding: int):
    """Supergroup channel slices of exactly 128 lanes (the MXU lane
    width), each lowered as a PLAIN DENSE conv — no
    ``feature_group_count`` anywhere.

    Per-slice kernels are the block-diagonal expansion of
    ``GROUPS/(dw/128)`` real groups, so the lowering pays
    ``(16*128/dw)``x true FLOPs (4x at dw=512, 2x at 1024, 1x at
    2048) — but every conv is a 128-aligned dense conv, the shape class
    XLA's emitter runs at ~85% MFU (microbench ``vae_conv_512_128``)
    while its grouped emitter runs the same math at ~26%. The channel
    slice/concat splits are layout-clean and fuse into the convs'
    input/output (measured: tools/bench_grouped.py ``loop128``,
    PERF.md round-4 grouped-conv log)."""
    c = x.shape[-1]
    sg = c // 128
    fold = GROUPS // sg
    cgo = p["w"].shape[-1] // GROUPS
    outs = []
    for s in range(sg):
        ws = _block_diag_kernel(
            p["w"][:, :, :, s * fold * cgo:(s + 1) * fold * cgo], fold)
        ps = {"w": ws}
        if "b" in p:
            ps["b"] = p["b"][s * fold * cgo:(s + 1) * fold * cgo]
        outs.append(L.conv2d(ps, x[..., s * 128:(s + 1) * 128],
                             padding=padding))
    return jnp.concatenate(outs, axis=-1)


def _grouped_conv3(p, x, padding: int):
    """The AdaNAF grouped 3x3, lowered per stage width.

    Per-lowering cost measured isolated on v5e at the 512px stage shapes
    (tools/bench_grouped.py, 2026-08-19/20, ms per conv; eight lowering
    families total — full log in PERF.md "Grouped-conv lowering log"):

    | stage (dw) | dense-16x | native g16 | dense4 (4x) | loop128 |
    |---|---:|---:|---:|---:|
    | s1 (512 @ 256 sq)  | 18.6 | 19.8 | 12.1 | **10.9** |
    | s2 (1024 @ 128 sq) | 18.1 | 9.7  | 10.1 | **7.7**  |
    | s3 (2048 @ 64 sq)  | 18.6 | **6.4** | 9.8 | 6.2-7.3 |

    auto (default): 512 <= dw <= 1024 (and 128-aligned, square) ->
    loop128 (_loop128_grouped_conv: per-128-lane dense conv slices),
    wider -> native, narrower -> the r3 routing (dense4). The dw >= 512
    gate keeps loop128 off unmeasured narrow widths where its
    supergroup-dense slices degenerate toward the full 16x-FLOPs dense
    conv (dw=128 -> sg=1). Microbench deltas above; the 2026-08-20
    end-to-end in-situ A/B vs autor3 (PERF.md grouped-conv log) is a
    wash (<1%, opposite signs per mode) — loop128 stays default on the
    headline-mode result (deep 8.161 vs 8.096). Override with
    UNIRESTORE_GROUPED_CONV=dense|native|dense4|loop128|auto (autor3
    restores the r3 routing — dense4 narrow / native wide — for A/Bs).
    Non-TPU backends always use the native grouped lowering."""
    import os
    if jax.default_backend() not in ("tpu", "axon"):
        return L.conv2d(p, x, padding=padding, groups=GROUPS)
    mode = os.environ.get("UNIRESTORE_GROUPED_CONV", "auto")
    dw = p["w"].shape[-1]
    # loop128 assumes a square grouped conv (cin == cout == dw) whose
    # input actually has dw channels; a mismatched conv must fall
    # through to the native lowering rather than slice wrong channels
    loop_ok = (dw % 128 == 0 and 0 < dw // 128 <= GROUPS
               and GROUPS % (dw // 128) == 0
               and p["w"].shape[2] * GROUPS == dw
               and x.shape[-1] == dw)
    if mode == "autor3":
        mode = "dense4" if dw <= 512 else "native"
    if mode == "auto":
        if 512 <= dw <= 1024 and loop_ok:
            mode = "loop128"
        elif dw <= 512:
            mode = "dense4"
        else:
            mode = "native"
    if mode == "loop128" and loop_ok:
        return _loop128_grouped_conv(p, x, padding)
    if mode == "native" or mode == "loop128":
        return L.conv2d(p, x, padding=padding, groups=GROUPS)
    if mode == "dense4":
        return L.conv2d({"w": _super_block_kernel(p["w"], GROUPS, 4),
                         **({"b": p["b"]} if "b" in p else {})},
                        x, padding=padding, groups=4)
    return _dense_grouped_conv(p, x, GROUPS, padding)


def ada_naf_v2_init(key, c: int, dtype=jnp.float32):
    dw = c * EXPAND
    keys = jax.random.split(key, 6)
    return {
        "conv_in": L.conv2d_init(keys[0], c, dw, 1, dtype=dtype),
        "group_norm": L.norm_init(dw, dtype),
        "group_conv": L.conv2d_init(keys[1], dw, dw, 3, groups=GROUPS, dtype=dtype),
        "intra_attn": L.conv2d_init(keys[2], dw, dw, 1, groups=GROUPS, dtype=dtype),
        "inter_attn": L.conv2d_init(keys[3], dw, GROUPS, 1, dtype=dtype),
        "pwconv": L.conv2d_init(keys[4], dw, c, 1, dtype=dtype),
        "nafblock": naf_block_init(keys[5], c, dtype=dtype),
    }


def ada_naf_v2(p, x):
    inp = x
    dw = p["conv_in"]["w"].shape[-1]
    h = L.conv2d(p["conv_in"], x, padding=0)
    h = L.group_norm(p["group_norm"], h, groups=GROUPS, eps=1e-5)
    h = _grouped_conv3(p["group_conv"], h, padding=1)
    h = L.gelu(h)
    # intra-group SE: grouped 1x1 on the global-average-pooled vector
    h = h * L.conv2d(p["intra_attn"], L.global_avg_pool(h), padding=0,
                     groups=GROUPS)
    # inter-group attention: one scalar per channel-group
    iga = L.conv2d(p["inter_attn"], L.global_avg_pool(h), padding=0)  # (B,1,1,G)
    b = h.shape[0]
    hg = h.reshape(b, h.shape[1], h.shape[2], GROUPS, dw // GROUPS)
    hg = hg * iga[..., None]
    h = hg.reshape(h.shape)
    h = L.conv2d(p["pwconv"], h, padding=0)
    x = inp + h
    return naf_block(p["nafblock"], x)


def cfrm_stage_init(key, c: int, num_naf: int, dtype=jnp.float32):
    keys = jax.random.split(key, num_naf + 1)
    return {
        "naf": [naf_block_init(keys[i], c, dtype=dtype) for i in range(num_naf)],
        "ada": ada_naf_v2_init(keys[-1], c, dtype=dtype),
    }


def cfrm_stage(p, x, remat: bool = False):
    """With ``remat`` each NAF/AdaNAF block is rematerialized in the
    backward pass (the deep /8 stage otherwise keeps ~6 intermediates per
    block live; see VAEConfig.remat)."""
    nb = jax.checkpoint(naf_block) if remat else naf_block
    ada = jax.checkpoint(ada_naf_v2) if remat else ada_naf_v2
    for blk in p["naf"]:
        x = nb(blk, x)
    return ada(p["ada"], x)


def cfrm_init(key, channels=(128, 256, 512), depths=(1, 1, 9), dtype=jnp.float32):
    keys = jax.random.split(key, len(channels))
    return [cfrm_stage_init(k, c, d, dtype=dtype)
            for k, c, d in zip(keys, channels, depths)]
