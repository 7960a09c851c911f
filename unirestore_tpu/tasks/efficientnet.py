"""EfficientNetV2-L classifier probe (torchvision ``efficientnet_v2_l``),
NHWC.

Used by the reference's classification eval zoo
(eval_classification.py:266 ``efficientnet_v2_l(weights="IMAGENET1K_V1")``).
Stage plan per the V2-L config: 3 FusedMBConv stages then 4 MBConv stages
with SE (squeeze ratio 0.25 of the block *input* channels), BN eps 1e-3,
SiLU activations, 1280-ch head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

# (fused, expand, kernel, stride, cin, cout, layers)
V2L_PLAN = (
    (True, 1, 3, 1, 32, 32, 4),
    (True, 4, 3, 2, 32, 64, 7),
    (True, 4, 3, 2, 64, 96, 7),
    (False, 4, 3, 2, 96, 192, 10),
    (False, 6, 3, 1, 192, 224, 19),
    (False, 6, 3, 2, 224, 384, 25),
    (False, 6, 3, 1, 384, 640, 7),
)
BN_EPS = 1e-3


def _cbn_init(key, cin, cout, k):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": RN.bn_init(cout)}


def _block_init(key, fused, expand, k, cin, cout):
    ks = iter(jax.random.split(key, 6))
    mid = cin * expand
    p = {}
    if fused:
        if expand != 1:
            p["expand"] = _cbn_init(next(ks), cin, mid, k)
            p["project"] = _cbn_init(next(ks), mid, cout, 1)
        else:
            p["single"] = _cbn_init(next(ks), cin, cout, k)
    else:
        p["expand"] = _cbn_init(next(ks), cin, mid, 1)
        p["dw"] = {"conv": L.conv2d_init(next(ks), mid, mid, k, groups=mid,
                                         bias=False),
                   "bn": RN.bn_init(mid)}
        se_c = max(1, cin // 4)
        p["se_reduce"] = L.conv2d_init(next(ks), mid, se_c, 1)
        p["se_expand"] = L.conv2d_init(next(ks), se_c, mid, 1)
        p["project"] = _cbn_init(next(ks), mid, cout, 1)
    return p


def efficientnet_v2_l_init(key, num_classes: int = 1000):
    ks = iter(jax.random.split(key, 96))
    p = {"stem": _cbn_init(next(ks), 3, 32, 3), "stages": []}
    for fused, expand, k, stride, cin, cout, layers in V2L_PLAN:
        stage = []
        for j in range(layers):
            stage.append(_block_init(next(ks), fused, expand, k,
                                     cin if j == 0 else cout, cout))
        p["stages"].append(stage)
    p["head"] = _cbn_init(next(ks), 640, 1280, 1)
    p["fc"] = L.linear_init(next(ks), 1280, num_classes)
    return p


def _cbn(p, x, stride=1, k=1, groups=1):
    pad = "SAME" if stride == 1 else (k - 1) // 2
    h = L.conv2d(p["conv"], x, stride=stride, padding=pad, groups=groups)
    return RN.batch_norm(p["bn"], h, eps=BN_EPS)


def _block(p, x, fused, k, stride):
    if fused:
        if "single" in p:
            h = jax.nn.silu(_cbn(p["single"], x, stride, k))
        else:
            h = jax.nn.silu(_cbn(p["expand"], x, stride, k))
            h = _cbn(p["project"], h)
    else:
        h = jax.nn.silu(_cbn(p["expand"], x))
        h = jax.nn.silu(_cbn(p["dw"], h, stride, k, groups=h.shape[-1]))
        s = h.mean(axis=(1, 2), keepdims=True)
        s = jax.nn.silu(L.conv2d(p["se_reduce"], s))
        s = jax.nn.sigmoid(L.conv2d(p["se_expand"], s))
        h = h * s
        h = _cbn(p["project"], h)
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


def efficientnet_v2_l_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> logits. Internally resizes to 224^2."""
    x = RN.preprocess(images) if preprocess_input else images
    h = jax.nn.silu(_cbn(p["stem"], x, stride=2, k=3))
    for (fused, expand, k, stride, cin, cout, layers), stage in zip(
            V2L_PLAN, p["stages"]):
        for j, blk in enumerate(stage):
            h = _block(blk, h, fused, k, stride if j == 0 else 1)
    h = jax.nn.silu(_cbn(p["head"], h))
    return L.linear(p["fc"], h.mean(axis=(1, 2)))
