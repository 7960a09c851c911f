"""RVT — Robust Vision Transformer classifier probe (rvt_base_plus).

Reference: src/modules/rvt/robust_models.py:283-535, used in the "all"
classification eval set (eval_classification.py). rvt_base_plus: conv patch
stem (7x7/2 -> BN -> maxpool3/2 -> 4x4/4), a single 12-block stage with
embed 768 (base_dims [64] x heads [12]), qkv bias, learned sigmoid attention
masks on the first 5 blocks ((heads, 196, 196), multiplied on the logits
BEFORE softmax), GAP -> LayerNorm -> linear head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

EMBED = 768
HEADS = 12
DEPTH = 12
MASKED_BLOCKS = 5
TOKENS = 196  # 224 input -> 14x14


def _block_init(key, dim, mlp_ratio=4, use_mask=False):
    ks = jax.random.split(key, 5)
    p = {
        "norm1": L.norm_init(dim),
        "qkv": L.linear_init(ks[0], dim, dim * 3),
        "proj": L.linear_init(ks[1], dim, dim),
        "norm2": L.norm_init(dim),
        "fc1": L.linear_init(ks[2], dim, dim * mlp_ratio),
        "fc2": L.linear_init(ks[3], dim * mlp_ratio, dim),
    }
    if use_mask:
        p["att_mask"] = jax.random.normal(ks[4], (HEADS, TOKENS, TOKENS)) \
            * 0.02
    return p


def rvt_base_plus_init(key, num_classes: int = 1000):
    ks = iter(jax.random.split(key, DEPTH + 8))
    p = {
        "stem_conv1": L.conv2d_init(next(ks), 3, 32, 7),
        "stem_bn": RN.bn_init(32),
        "stem_conv2": L.conv2d_init(next(ks), 32, EMBED, 4),
        "blocks": [_block_init(next(ks), EMBED, use_mask=(i < MASKED_BLOCKS))
                   for i in range(DEPTH)],
        "norm": L.norm_init(EMBED),
        "head": L.linear_init(next(ks), EMBED, num_classes),
    }
    return p


def _attention(p, x):
    b, n, c = x.shape
    qkv = L.linear(p["qkv"], x).reshape(b, n, 3, HEADS, c // HEADS)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (b, n, h, d)
    scale = (c // HEADS) ** -0.5
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * scale
    if "att_mask" in p:
        logits = logits * jax.nn.sigmoid(p["att_mask"].astype(logits.dtype))
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
    return L.linear(p["proj"], o)


def rvt_base_plus_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> logits. Input is resized to 224^2 internally."""
    x = RN.preprocess(images) if preprocess_input else images
    # conv stem: 7x7/2 pad 2 -> BN -> maxpool 3/2 pad 1 -> 4x4/4
    h = L.conv2d(p["stem_conv1"], x, stride=2, padding=2)
    h = RN.batch_norm(p["stem_bn"], h)
    h = RN.max_pool_3x3_s2(h)
    h = L.conv2d(p["stem_conv2"], h, stride=4, padding="VALID")
    b, hh, ww, c = h.shape
    t = h.reshape(b, hh * ww, c)
    for blk in p["blocks"]:
        t = t + _attention(blk, L.layer_norm(blk["norm1"], t, eps=1e-6))
        m = L.layer_norm(blk["norm2"], t, eps=1e-6)
        m = L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
        t = t + m
    pooled = t.mean(axis=1)
    pooled = L.layer_norm(p["norm"], pooled, eps=1e-6)
    return L.linear(p["head"], pooled)
