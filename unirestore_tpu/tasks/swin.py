"""Swin Transformer classifier probes, NHWC.

Two variants used by the reference's classification eval zoo:
- ``swin_v2_b`` (torchvision, window 8, eval_classification.py:264): res-post-
  norm blocks, cosine attention with a learned per-head logit scale, and
  log-spaced continuous relative position bias (CPB MLP).
- ``swin_base_patch4_window7_224`` (timm, window 7, the ``cub_swin`` CUB-200
  probe, eval_classification.py:233): pre-norm blocks, scaled dot-product
  attention with a learned relative-position-bias table.

Both: patch 4 embed -> stages [2, 2, 18, 2] at dims [128, 256, 512, 1024],
heads [4, 8, 16, 32], shifted windows on odd blocks, patch merging between
stages, LN + GAP + linear head. Shapes are static under jit, so window
padding / shift masks are computed at trace time with numpy.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import layers as L
from . import resnet as RN

DEPTHS = (2, 2, 18, 2)
DIMS = (128, 256, 512, 1024)
HEADS = (4, 8, 16, 32)


@lru_cache(maxsize=None)
def _relative_position_index(window: int) -> np.ndarray:
    """(n, n) indices into the (2w-1)^2 relative bias table."""
    coords = np.stack(np.meshgrid(np.arange(window), np.arange(window),
                                  indexing="ij"))  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, n, n)
    rel = rel.transpose(1, 2, 0) + (window - 1)
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@lru_cache(maxsize=None)
def _cpb_coords_table(window: int) -> np.ndarray:
    """Log-spaced normalized relative coords, ((2w-1)^2, 2) — SwinV2 CPB."""
    r = np.arange(-(window - 1), window, dtype=np.float64)
    table = np.stack(np.meshgrid(r, r, indexing="ij"), axis=-1)
    table = table / (window - 1) * 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / 3.0
    return table.reshape(-1, 2).astype(np.float32)


@lru_cache(maxsize=None)
def _shift_mask(hp: int, wp: int, window: int, shift: int) -> np.ndarray:
    """(num_windows, n, n) additive mask (0 / -100) for shifted windows."""
    img = np.zeros((hp, wp))
    cnt = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift),
                   slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    nh, nw = hp // window, wp // window
    wins = img.reshape(nh, window, nw, window).transpose(0, 2, 1, 3)
    wins = wins.reshape(nh * nw, window * window)
    diff = wins[:, None, :] - wins[:, :, None]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def _block_init(key, dim, heads, window, v2: bool):
    ks = iter(jax.random.split(key, 8))
    p = {
        "norm1": L.norm_init(dim),
        "qkv": L.linear_init(next(ks), dim, dim * 3),
        "proj": L.linear_init(next(ks), dim, dim),
        "norm2": L.norm_init(dim),
        "fc1": L.linear_init(next(ks), dim, dim * 4),
        "fc2": L.linear_init(next(ks), dim * 4, dim),
    }
    if v2:
        p["logit_scale"] = jnp.full((heads, 1, 1), float(np.log(10.0)))
        p["cpb_fc1"] = L.linear_init(next(ks), 2, 512)
        p["cpb_fc2"] = L.linear_init(next(ks), 512, heads, bias=False)
    else:
        p["rel_bias"] = jax.random.normal(
            next(ks), ((2 * window - 1) ** 2, heads)) * 0.02
    return p


def swin_base_init(key, num_classes: int = 1000, v2: bool = True):
    window = 8 if v2 else 7
    ks = iter(jax.random.split(key, sum(DEPTHS) + 16))
    p = {
        "patch": L.conv2d_init(next(ks), 3, DIMS[0], 4),
        "patch_norm": L.norm_init(DIMS[0]),
        "stages": [],
        "merge": [],
        "norm": L.norm_init(DIMS[-1]),
        "head": L.linear_init(next(ks), DIMS[-1], num_classes),
    }
    for i, (depth, dim, heads) in enumerate(zip(DEPTHS, DIMS, HEADS)):
        if i > 0:
            p["merge"].append({
                # v2 norms after reduction (dim), v1 before (4x previous dim)
                "norm": L.norm_init(dim if v2 else DIMS[i - 1] * 4),
                "reduction": L.linear_init(next(ks), DIMS[i - 1] * 4, dim,
                                           bias=False),
            })
        p["stages"].append([
            _block_init(next(ks), dim, heads, window, v2)
            for _ in range(depth)])
    return p


def _window_attention(p, x, window: int, shift: int, heads: int, v2: bool):
    b, h, w, c = x.shape
    d = c // heads
    pad_b = (window - h % window) % window
    pad_r = (window - w % window) % window
    if pad_b or pad_r:
        x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
    hp, wp = h + pad_b, w + pad_r
    sh = shift if window < hp else 0
    sw = shift if window < wp else 0
    if sh or sw:
        x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
    nh, nw = hp // window, wp // window
    n = window * window
    xw = x.reshape(b, nh, window, nw, window, c)
    xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(b * nh * nw, n, c)

    qkv = L.linear(p["qkv"], xw).reshape(-1, n, 3, heads, d)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (bw, n, h, d)
    if v2:
        q = q / jnp.maximum(jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-12).astype(
                                                q.dtype)
        k = k / jnp.maximum(jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                            keepdims=True), 1e-12).astype(
                                                k.dtype)
        scale = jnp.exp(jnp.minimum(p["logit_scale"].astype(jnp.float32),
                                    float(np.log(100.0))))
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) \
            * scale.reshape(1, heads, 1, 1).astype(q.dtype)
        table = jnp.asarray(_cpb_coords_table(window))
        cpb = L.linear(p["cpb_fc2"],
                       jax.nn.relu(L.linear(p["cpb_fc1"], table)))
        bias = 16.0 * jax.nn.sigmoid(cpb)  # ((2w-1)^2, heads)
    else:
        attn = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
        bias = p["rel_bias"]
    idx = jnp.asarray(_relative_position_index(window))
    attn = attn + bias[idx].transpose(2, 0, 1).astype(attn.dtype)[None]
    if sh or sw:
        mask = jnp.asarray(_shift_mask(hp, wp, window, shift))
        attn = attn.reshape(b, nh * nw, heads, n, n) \
            + mask[None, :, None].astype(attn.dtype)
        attn = attn.reshape(b * nh * nw, heads, n, n)
    attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(xw.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(-1, n, c)
    o = L.linear(p["proj"], o)

    o = o.reshape(b, nh, nw, window, window, c)
    o = o.transpose(0, 1, 3, 2, 4, 5).reshape(b, hp, wp, c)
    if sh or sw:
        o = jnp.roll(o, (sh, sw), axis=(1, 2))
    return o[:, :h, :w]


def _patch_merge(p, x, v2: bool):
    b, h, w, c = x.shape
    if h % 2 or w % 2:  # torchvision pads odd dims before merging
        x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x0 = x[:, 0::2, 0::2]
    x1 = x[:, 1::2, 0::2]
    x2 = x[:, 0::2, 1::2]
    x3 = x[:, 1::2, 1::2]
    x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
    if v2:  # reduction then norm (PatchMergingV2)
        x = L.linear(p["reduction"], x)
        return L.layer_norm(p["norm"], x, eps=1e-5)
    x = L.layer_norm(p["norm"], x, eps=1e-5)
    return L.linear(p["reduction"], x)


def swin_base_apply(p, images, preprocess_input: bool = True,
                    v2: bool = True):
    """[0,1] NHWC -> logits. Internally resizes to 224^2."""
    window = 8 if v2 else 7
    x = RN.preprocess(images) if preprocess_input else images
    h = L.conv2d(p["patch"], x, stride=4, padding="VALID")
    h = L.layer_norm(p["patch_norm"], h, eps=1e-5)
    for i, (stage, heads) in enumerate(zip(p["stages"], HEADS)):
        if i > 0:
            h = _patch_merge(p["merge"][i - 1], h, v2)
        for j, blk in enumerate(stage):
            shift = 0 if j % 2 == 0 else window // 2
            if v2:  # res-post-norm
                a = _window_attention(blk, h, window, shift, heads, v2)
                h = h + L.layer_norm(blk["norm1"], a, eps=1e-5)
                m = L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], h)))
                h = h + L.layer_norm(blk["norm2"], m, eps=1e-5)
            else:  # pre-norm
                a = _window_attention(blk, L.layer_norm(blk["norm1"], h,
                                                        eps=1e-5),
                                      window, shift, heads, v2)
                h = h + a
                m = L.layer_norm(blk["norm2"], h, eps=1e-5)
                h = h + L.linear(blk["fc2"], L.gelu(L.linear(blk["fc1"], m)))
    h = L.layer_norm(p["norm"], h, eps=1e-5)
    return L.linear(p["head"], h.mean(axis=(1, 2)))
