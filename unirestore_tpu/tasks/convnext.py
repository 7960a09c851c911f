"""ConvNeXt-Base classifier probe (timm ``convnext_base.fb_in1k``), NHWC.

Used by the reference's CUB classification eval set (``cub_conv``: a timm
ConvNeXt-Base fine-tuned on CUB-200, eval_classification.py:231). Stages
[3, 3, 27, 3] at dims [128, 256, 512, 1024]; block = depthwise 7x7 -> LN ->
pointwise x4 -> GELU -> pointwise -> layer-scale gamma -> residual;
downsample = LN -> 2x2/2 conv; head = GAP -> LN -> linear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

DEPTHS = (3, 3, 27, 3)
DIMS = (128, 256, 512, 1024)


def _block_init(key, dim):
    ks = jax.random.split(key, 3)
    return {
        "dwconv": L.conv2d_init(ks[0], dim, dim, 7, groups=dim),
        "norm": L.norm_init(dim),
        "fc1": L.linear_init(ks[1], dim, dim * 4),
        "fc2": L.linear_init(ks[2], dim * 4, dim),
        "gamma": jnp.full((dim,), 1e-6),
    }


def convnext_base_init(key, num_classes: int = 1000):
    ks = iter(jax.random.split(key, sum(DEPTHS) + 16))
    p = {
        "stem": L.conv2d_init(next(ks), 3, DIMS[0], 4),
        "stem_norm": L.norm_init(DIMS[0]),
        "stages": [],
        "downsample": [],
        "norm": L.norm_init(DIMS[-1]),
        "head": L.linear_init(next(ks), DIMS[-1], num_classes),
    }
    for i, (depth, dim) in enumerate(zip(DEPTHS, DIMS)):
        if i > 0:
            p["downsample"].append({
                "norm": L.norm_init(DIMS[i - 1]),
                "conv": L.conv2d_init(next(ks), DIMS[i - 1], dim, 2),
            })
        p["stages"].append([_block_init(next(ks), dim) for _ in range(depth)])
    return p


def _block(p, x):
    h = L.conv2d(p["dwconv"], x, padding=3, groups=x.shape[-1])
    h = L.layer_norm(p["norm"], h, eps=1e-6)
    h = L.gelu(L.linear(p["fc1"], h))
    h = L.linear(p["fc2"], h)
    return x + h * p["gamma"].astype(h.dtype)


def convnext_base_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> logits. Internally resizes to 224^2."""
    x = RN.preprocess(images) if preprocess_input else images
    h = L.conv2d(p["stem"], x, stride=4, padding="VALID")
    h = L.layer_norm(p["stem_norm"], h, eps=1e-6)
    for i, stage in enumerate(p["stages"]):
        if i > 0:
            ds = p["downsample"][i - 1]
            h = L.layer_norm(ds["norm"], h, eps=1e-6)
            h = L.conv2d(ds["conv"], h, stride=2, padding="VALID")
        for blk in stage:
            h = _block(blk, h)
    pooled = h.mean(axis=(1, 2))
    pooled = L.layer_norm(p["norm"], pooled, eps=1e-6)
    return L.linear(p["head"], pooled)
