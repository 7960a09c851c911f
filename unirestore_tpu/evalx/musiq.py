"""MUSIQ no-reference metric family (reference:
eval_image_restoration.py:193-196 ``PyNRMetric('musiq')``, 'musiq-ava',
'musiq-paq2piq', 'musiq-spaq' — one architecture, four checkpoints).

MUSIQ (Ke et al., ICCV 2021): a multi-scale image quality transformer.
The image is represented at 3 scales — native resolution plus two
aspect-ratio-preserving resizes with longer side 384 and 224 — each cut
into 32x32 patches that are linearly projected to a 384-d hidden space.
Each token gets (a) a hash-based 2D spatial embedding from a 10x10 learned
grid (patches map to grid cells by normalized position, shared across
scales) and (b) a learned per-scale embedding. A CLS token is prepended
and a 14-layer / 6-head / MLP-1152 transformer encodes the multi-scale
sequence; the head maps CLS to a single score (KonIQ / PaQ-2-PiQ / SPAQ)
or a 10-bin distribution whose expectation is the score (AVA).

Shapes are static per input resolution under jit (the scale geometry is
computed at trace time). Weights come offline via tools/convert_iqa.py.
Input: NHWC in [0, 1] at native resolution (no normalization — MUSIQ
consumes raw RGB in [0, 1], matching pyiqa's preprocessing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import layers as L
from ..ops.resize import resize_bilinear

HIDDEN = 384
LAYERS = 14
HEADS = 6
MLP = 1152
PATCH = 32
GRID = 10  # hash-based spatial embedding grid
SCALES = (0, 384, 224)  # 0 = native resolution


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


def musiq_init(key, num_classes: int = 1):
    ks = iter(jax.random.split(key, LAYERS + 8))
    return {
        "patch_proj": L.linear_init(next(ks), PATCH * PATCH * 3, HIDDEN),
        "cls_token": jnp.zeros((1, 1, HIDDEN)),
        "hse": jax.random.normal(next(ks), (GRID, GRID, HIDDEN)) * 0.02,
        "scale_emb": jax.random.normal(next(ks),
                                       (len(SCALES), HIDDEN)) * 0.02,
        "blocks": [_block_init(next(ks), HIDDEN) for _ in range(LAYERS)],
        "norm": L.norm_init(HIDDEN),
        "head": L.linear_init(next(ks), HIDDEN, num_classes),
    }


def _patchify(x):
    """(B, H, W, 3) -> (B, nh*nw, 32*32*3) + (nh, nw); pads to /32."""
    b, h, w, c = x.shape
    ph, pw = (-h) % PATCH, (-w) % PATCH
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    nh, nw = (h + ph) // PATCH, (w + pw) // PATCH
    x = x.reshape(b, nh, PATCH, nw, PATCH, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, PATCH * PATCH * c)
    return x, (nh, nw)


def _hse_lookup(hse, nh, nw):
    """Hash each patch's normalized grid position into the GxG table."""
    ri = np.floor(np.arange(nh) / max(nh - 1, 1) * (GRID - 1)
                  + 0.5).astype(np.int32) if nh > 1 else np.zeros(1, np.int32)
    ci = np.floor(np.arange(nw) / max(nw - 1, 1) * (GRID - 1)
                  + 0.5).astype(np.int32) if nw > 1 else np.zeros(1, np.int32)
    emb = hse[jnp.asarray(ri)][:, jnp.asarray(ci)]  # (nh, nw, HIDDEN)
    return emb.reshape(nh * nw, HIDDEN)


def _arp_size(h, w, longer):
    s = longer / max(h, w)
    return max(1, round(h * s)), max(1, round(w * s))


def musiq_score(p, images, num_classes: int = 1):
    """[0,1] NHWC -> score per image. num_classes=10 -> AVA expectation."""
    b, h, w, _ = images.shape
    tokens = []
    for si, longer in enumerate(SCALES):
        x = images
        if longer:
            nh, nw = _arp_size(h, w, longer)
            x = resize_bilinear(images, (nh, nw))
        t, (gh, gw) = _patchify(x)
        t = L.linear(p["patch_proj"], t)
        t = t + _hse_lookup(p["hse"], gh, gw).astype(t.dtype)[None]
        t = t + p["scale_emb"][si].astype(t.dtype)[None, None]
        tokens.append(t)
    t = jnp.concatenate(tokens, axis=1)
    cls = jnp.broadcast_to(p["cls_token"].astype(t.dtype), (b, 1, HIDDEN))
    t = jnp.concatenate([cls, t], axis=1)
    for blk in p["blocks"]:
        y = L.layer_norm(blk["norm1"], t, eps=1e-6)
        bq, n, c = y.shape
        d = c // HEADS
        qkv = L.linear(blk["qkv"], y).reshape(bq, n, 3, HEADS, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        attn = jax.nn.softmax(logits.astype(jnp.float32),
                              -1).astype(t.dtype)
        o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(bq, n, c)
        t = t + L.linear(blk["proj"], o)
        m = L.layer_norm(blk["norm2"], t, eps=1e-6)
        t = t + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
    t = L.layer_norm(p["norm"], t, eps=1e-6)
    out = L.linear(p["head"], t[:, 0]).astype(jnp.float32)
    if num_classes == 1:
        return out[:, 0]
    probs = jax.nn.softmax(out, axis=-1)
    bins = jnp.arange(1, num_classes + 1, dtype=jnp.float32)
    return (probs * bins).sum(axis=-1)
