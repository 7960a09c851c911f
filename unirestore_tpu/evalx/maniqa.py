"""MANIQA no-reference metric (reference: eval_image_restoration.py:198
``PyNRMetric('maniqa')``).

MANIQA (Yang et al., CVPRW 2022 NTIRE winner): ViT-B/8 features from four
intermediate blocks are concatenated (4x768) over the 28x28 token grid,
passed through transposed-attention blocks (attention across channels),
a 1x1 conv to 768, a 2-block Swin stage, another TA+conv to 384 and Swin
stage, then per-patch score and weight MLP heads; the final score is the
weight-averaged patch score.

Weights come offline from the official/pyiqa checkpoint via
tools/convert_iqa.py. Input: NHWC in [0, 1]; ImageNet-normalized 224^2
resize inside (pyiqa averages random crops; we use the deterministic
resize).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..tasks import resnet as RN
from ..tasks import swin as SW
from ..tasks import vit as VIT

EMBED = 768
DEPTH = 12
HEADS = 12
PATCH = 8
GRID = 224 // PATCH  # 28
# 0-indexed block outputs concatenated by the official MANIQA
# (IIGROUP/MANIQA models/maniqa.py extract_feature: save_output.outputs
# [6][7][8][9] — the paper's 1-indexed blocks 7-10)
FEAT_LAYERS = (6, 7, 8, 9)
SWIN_HEADS = 4
WINDOW = 4


def _vit_b8_init(key):
    ks = iter(jax.random.split(key, DEPTH + 8))
    return {
        "patch": L.conv2d_init(next(ks), 3, EMBED, PATCH),
        "cls_token": jnp.zeros((1, 1, EMBED)),
        "pos_embed": jax.random.normal(next(ks),
                                       (1, GRID * GRID + 1, EMBED)) * 0.02,
        "blocks": [VIT._block_init(next(ks), EMBED) for _ in range(DEPTH)],
    }


def _ta_block_init(key, dim):
    ks = jax.random.split(key, 4)
    return {
        "q": L.linear_init(ks[0], dim, dim, bias=False),
        "k": L.linear_init(ks[1], dim, dim, bias=False),
        "v": L.linear_init(ks[2], dim, dim, bias=False),
        "proj": L.linear_init(ks[3], dim, dim),
    }


def _swin_block_init(key, dim, heads):
    return SW._block_init(key, dim, heads, WINDOW, v2=False)


def maniqa_init(key):
    ks = iter(jax.random.split(key, 32))
    dim_spatial = GRID * GRID  # TA blocks attend over channels; "dim" = HW
    return {
        "vit": _vit_b8_init(next(ks)),
        "ta1": [_ta_block_init(next(ks), dim_spatial) for _ in range(2)],
        "conv1": L.conv2d_init(next(ks), EMBED * len(FEAT_LAYERS), EMBED, 1),
        "swin1": [_swin_block_init(next(ks), EMBED, SWIN_HEADS)
                  for _ in range(2)],
        "ta2": [_ta_block_init(next(ks), dim_spatial) for _ in range(2)],
        "conv2": L.conv2d_init(next(ks), EMBED, EMBED // 2, 1),
        "swin2": [_swin_block_init(next(ks), EMBED // 2, SWIN_HEADS)
                  for _ in range(2)],
        "score_fc1": L.linear_init(next(ks), EMBED // 2, EMBED // 2),
        "score_fc2": L.linear_init(next(ks), EMBED // 2, 1),
        "weight_fc1": L.linear_init(next(ks), EMBED // 2, EMBED // 2),
        "weight_fc2": L.linear_init(next(ks), EMBED // 2, 1),
    }


def _vit_features(p, x):
    """Concatenated token features from FEAT_LAYERS, (B, 28, 28, 4*768)."""
    h = L.conv2d(p["patch"], x, stride=PATCH, padding="VALID")
    b, hh, ww, c = h.shape
    t = h.reshape(b, hh * ww, c)
    cls = jnp.broadcast_to(p["cls_token"].astype(t.dtype), (b, 1, c))
    t = jnp.concatenate([cls, t], axis=1) + p["pos_embed"].astype(t.dtype)
    feats = []
    for i, blk in enumerate(p["blocks"]):
        t = t + VIT._attention(blk, L.layer_norm(blk["norm1"], t, eps=1e-6))
        m = L.layer_norm(blk["norm2"], t, eps=1e-6)
        t = t + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
        if i in FEAT_LAYERS:
            feats.append(t[:, 1:])  # drop cls
    f = jnp.concatenate(feats, axis=-1)
    return f.reshape(b, hh, ww, -1)


def _ta(p, x):
    """Transposed attention: tokens=channels, dim=spatial (B, C, HW)."""
    q = L.linear(p["q"], x)
    k = L.linear(p["k"], x)
    v = L.linear(p["v"], x)
    scale = x.shape[-1] ** -0.5
    logits = jnp.einsum("bcd,bed->bce", q, k) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
    o = jnp.einsum("bce,bed->bcd", attn, v)
    return x + L.linear(p["proj"], o)


def _ta_stage(blocks, x):
    """x: (B, H, W, C) -> TA over channels -> same shape."""
    b, h, w, c = x.shape
    t = x.reshape(b, h * w, c).transpose(0, 2, 1)  # (B, C, HW)
    for blk in blocks:
        t = _ta(blk, t)
    return t.transpose(0, 2, 1).reshape(b, h, w, c)


def _swin_stage(blocks, x):
    for j, blk in enumerate(blocks):
        shift = 0 if j % 2 == 0 else WINDOW // 2
        a = SW._window_attention(blk, L.layer_norm(blk["norm1"], x,
                                                   eps=1e-5),
                                 WINDOW, shift, SWIN_HEADS, v2=False)
        x = x + a
        m = L.layer_norm(blk["norm2"], x, eps=1e-5)
        x = x + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
    return x


def maniqa_score(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> quality score per image (~[0, 1])."""
    x = RN.preprocess(images) if preprocess_input else images
    f = _vit_features(p["vit"], x)  # (B, 28, 28, 3072)
    f = _ta_stage(p["ta1"], f)
    f = L.conv2d(p["conv1"], f)
    f = _swin_stage(p["swin1"], f)
    f = _ta_stage(p["ta2"], f)
    f = L.conv2d(p["conv2"], f)
    f = _swin_stage(p["swin2"], f)  # (B, 28, 28, 384)
    b = f.shape[0]
    t = f.reshape(b, -1, f.shape[-1]).astype(jnp.float32)
    score = jax.nn.relu(L.linear(
        p["score_fc2"], jax.nn.relu(L.linear(p["score_fc1"], t))))[..., 0]
    weight = jax.nn.sigmoid(L.linear(
        p["weight_fc2"], jax.nn.relu(L.linear(p["weight_fc1"], t))))[..., 0]
    return (score * weight).sum(-1) / jnp.maximum(weight.sum(-1), 1e-8)
