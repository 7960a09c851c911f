"""ViT-B/16 classifier probe (torchvision ``vit_b_16`` / timm
``vit_base_patch16_224``), NHWC.

Used by the reference's classification "all"/"all_ft" eval sets
(eval_classification.py:258 ``vit_b_16(weights="IMAGENET1K_V1")``) and the
CUB set (``cub_vitb`` timm ViT-B fine-tuned on CUB-200,
eval_classification.py:229). Standard pre-norm ViT: 16x16 conv patchify,
class token + learned position embedding, 12 encoder blocks
(LN -> MHA(12 heads) -> residual; LN -> MLP(3072, GELU) -> residual),
final LN, linear head on the class token.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

EMBED = 768
HEADS = 12
DEPTH = 12
MLP = 3072
PATCH = 16
TOKENS = (224 // PATCH) ** 2 + 1  # 197 with class token


def _block_init(key, dim):
    ks = jax.random.split(key, 4)
    return {
        "norm1": L.norm_init(dim),
        "qkv": L.linear_init(ks[0], dim, dim * 3),
        "proj": L.linear_init(ks[1], dim, dim),
        "norm2": L.norm_init(dim),
        "fc1": L.linear_init(ks[2], dim, MLP),
        "fc2": L.linear_init(ks[3], MLP, dim),
    }


def vit_b16_init(key, num_classes: int = 1000):
    ks = iter(jax.random.split(key, DEPTH + 8))
    return {
        "patch": L.conv2d_init(next(ks), 3, EMBED, PATCH),
        "cls_token": jnp.zeros((1, 1, EMBED)),
        "pos_embed": jax.random.normal(next(ks), (1, TOKENS, EMBED)) * 0.02,
        "blocks": [_block_init(next(ks), EMBED) for _ in range(DEPTH)],
        "norm": L.norm_init(EMBED),
        "head": L.linear_init(next(ks), EMBED, num_classes),
    }


def _attention(p, x, heads: int = HEADS):
    b, n, c = x.shape
    d = c // heads
    qkv = L.linear(p["qkv"], x).reshape(b, n, 3, heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
    return L.linear(p["proj"], o)


def vit_b16_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> logits. Internally resizes to 224^2."""
    x = RN.preprocess(images) if preprocess_input else images
    h = L.conv2d(p["patch"], x, stride=PATCH, padding="VALID")
    b, hh, ww, c = h.shape
    t = h.reshape(b, hh * ww, c)
    cls = jnp.broadcast_to(p["cls_token"].astype(t.dtype), (b, 1, c))
    t = jnp.concatenate([cls, t], axis=1) + p["pos_embed"].astype(t.dtype)
    for blk in p["blocks"]:
        t = t + _attention(blk, L.layer_norm(blk["norm1"], t, eps=1e-6))
        m = L.layer_norm(blk["norm2"], t, eps=1e-6)
        t = t + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
    t = L.layer_norm(p["norm"], t, eps=1e-6)
    return L.linear(p["head"], t[:, 0])
