"""NAFNet primitives (NHWC, functional): SimpleGate, NAFBlock, NAFNet.

TPU-native re-design of the NAFNet blocks the reference CFRM builds on
(reference: src/modules/diffuie/nafnet_arch.py:22-221; "Simple Baselines for
Image Restoration", arXiv:2204.04676). Depthwise convs map to grouped
`lax.conv_general_dilated`; channel attention is a GAP + 1x1 (a matmul on the
MXU); LayerNorm2d becomes a last-axis LayerNorm in NHWC.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L


def naf_block_init(key, c: int, dw_expand: int = 2, ffn_expand: int = 2,
                   dtype=jnp.float32):
    dw = c * dw_expand
    ffn = c * ffn_expand
    keys = jax.random.split(key, 6)
    return {
        "norm1": L.norm_init(c, dtype),
        "conv1": L.conv2d_init(keys[0], c, dw, 1, dtype=dtype),
        "conv2": L.conv2d_init(keys[1], dw, dw, 3, groups=dw, dtype=dtype),
        "sca": L.conv2d_init(keys[2], dw // 2, dw // 2, 1, dtype=dtype),
        "conv3": L.conv2d_init(keys[3], dw // 2, c, 1, dtype=dtype),
        "norm2": L.norm_init(c, dtype),
        "conv4": L.conv2d_init(keys[4], c, ffn, 1, dtype=dtype),
        "conv5": L.conv2d_init(keys[5], ffn // 2, c, 1, dtype=dtype),
        "beta": jnp.zeros((c,), dtype),
        "gamma": jnp.zeros((c,), dtype),
    }


def naf_block(p, x, dw_groups: int | None = None):
    """LN -> 1x1 expand -> dw3x3 -> SimpleGate -> SCA -> 1x1; LN -> FFN gate.

    Residual branches scaled by zero-initialized per-channel beta/gamma, so a
    fresh block is the identity (matching the reference's training dynamics).
    """
    inp = x
    h = L.layer_norm(p["norm1"], x, eps=1e-6)
    h = L.conv2d(p["conv1"], h, padding=0)
    dw = p["conv2"]["w"].shape[-1]
    h = L.conv2d(p["conv2"], h, padding=1, groups=dw_groups or dw)
    h = L.simple_gate(h)
    h = h * L.conv2d(p["sca"], L.global_avg_pool(h), padding=0)
    h = L.conv2d(p["conv3"], h, padding=0)
    y = inp + h * p["beta"].astype(h.dtype)

    h = L.conv2d(p["conv4"], L.layer_norm(p["norm2"], y, eps=1e-6), padding=0)
    h = L.simple_gate(h)
    h = L.conv2d(p["conv5"], h, padding=0)
    return y + h * p["gamma"].astype(h.dtype)


def nafnet_init(key, img_channels: int = 3, width: int = 16,
                middle_blk_num: int = 1, enc_blk_nums=(), dec_blk_nums=(),
                dtype=jnp.float32):
    """Full NAFNet UNet (reference nafnet_arch.py:134-221; unused by the
    restoration model but part of the component inventory)."""
    n_keys = (2 + sum(enc_blk_nums) + len(enc_blk_nums) + middle_blk_num
              + sum(dec_blk_nums) + len(dec_blk_nums))
    keys = iter(jax.random.split(key, n_keys))
    p = {
        "intro": L.conv2d_init(next(keys), img_channels, width, 3, dtype=dtype),
        "encoders": [], "downs": [], "middle": [], "ups": [], "decoders": [],
    }
    chan = width
    for num in enc_blk_nums:
        p["encoders"].append([naf_block_init(next(keys), chan, dtype=dtype)
                              for _ in range(num)])
        p["downs"].append(L.conv2d_init(next(keys), chan, 2 * chan, 2, dtype=dtype))
        chan *= 2
    p["middle"] = [naf_block_init(next(keys), chan, dtype=dtype)
                   for _ in range(middle_blk_num)]
    for num in dec_blk_nums:
        p["ups"].append(L.conv2d_init(next(keys), chan, chan * 2, 1, bias=False,
                                      dtype=dtype))
        chan //= 2
        p["decoders"].append([naf_block_init(next(keys), chan, dtype=dtype)
                              for _ in range(num)])
    p["ending"] = L.conv2d_init(next(keys), width, img_channels, 3, dtype=dtype)
    return p


def nafnet(p, x):
    inp = x
    h = L.conv2d(p["intro"], x, padding=1)
    skips = []
    for enc, down in zip(p["encoders"], p["downs"]):
        for blk in enc:
            h = naf_block(blk, h)
        skips.append(h)
        h = L.conv2d(down, h, stride=2, padding="VALID")
    for blk in p["middle"]:
        h = naf_block(blk, h)
    for up, dec, skip in zip(p["ups"], p["decoders"], skips[::-1]):
        h = L.pixel_shuffle(L.conv2d(up, h, padding=0), 2)
        h = h + skip
        for blk in dec:
            h = naf_block(blk, h)
    return inp + L.conv2d(p["ending"], h, padding=1)
