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
    h = L.conv2d(p["group_conv"], h, padding=1, groups=GROUPS)
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


def cfrm_stage(p, x):
    for blk in p["naf"]:
        x = naf_block(blk, x)
    return ada_naf_v2(p["ada"], x)


def cfrm_init(key, channels=(128, 256, 512), depths=(1, 1, 9), dtype=jnp.float32):
    keys = jax.random.split(key, len(channels))
    return [cfrm_stage_init(k, c, d, dtype=dtype)
            for k, c, d in zip(keys, channels, depths)]
