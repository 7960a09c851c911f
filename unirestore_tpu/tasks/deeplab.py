"""DeepLabV3+ (ResNet-50 backbone, output stride 16) — frozen seg critic.

The reference's segmentation critic/probe is ``deeplabv3plus_resnet50
(num_classes=19, output_stride=16)`` (segmentation/__init__.py:11-32, full
implementation under src/modules/segmentation/deeplabv3/). Functional NHWC
port: ASPP with atrous rates (6, 12, 18) at os16, image-level pooling
branch, 48-channel low-level projection, 3x3 decoder head; bilinear logit
upsample to input size (the Stage-2 seg loss upsamples logits,
eval_semantic_segmentation.py:154-168).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops.resize import resize_bilinear
from . import resnet as RN

ASPP_RATES = (6, 12, 18)


def _conv_bn_init(key, cin, cout, k):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": RN.bn_init(cout)}


def deeplabv3plus_init(key, num_classes: int = 19, backbone: str = "resnet50"):
    keys = iter(jax.random.split(key, 16))
    p = {"backbone": RN.resnet_init(next(keys), backbone)}
    c_high, c_low = 2048, 256
    # ASPP: 1x1 + three atrous 3x3 + image pooling, all -> 256
    p["aspp"] = {
        "conv1x1": _conv_bn_init(next(keys), c_high, 256, 1),
        "atrous": [_conv_bn_init(next(keys), c_high, 256, 3)
                   for _ in ASPP_RATES],
        "pool": _conv_bn_init(next(keys), c_high, 256, 1),
        "project": _conv_bn_init(next(keys), 256 * (2 + len(ASPP_RATES)),
                                 256, 1),
    }
    p["low_proj"] = _conv_bn_init(next(keys), c_low, 48, 1)
    p["decoder"] = _conv_bn_init(next(keys), 256 + 48, 256, 3)
    p["classifier"] = L.conv2d_init(next(keys), 256, num_classes, 1)
    return p


def _cb(p, x, padding="SAME", dilation=1):
    x = L.conv2d(p["conv"], x, padding=padding, dilation=dilation)
    return jax.nn.relu(RN.batch_norm(p["bn"], x))


def deeplabv3plus_apply(p, images, preprocess_input: bool = True):
    """[0,1] NHWC images -> logits at input resolution (B, H, W, classes)."""
    h_in, w_in = images.shape[1:3]
    x = images
    if preprocess_input:
        mean = jnp.asarray(RN.IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(RN.IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    feats = RN.resnet_features(p["backbone"], x, output_stride=16)
    high, low = feats["c5"], feats["c2"]

    branches = [_cb(p["aspp"]["conv1x1"], high, padding=0)]
    for rate, bp in zip(ASPP_RATES, p["aspp"]["atrous"]):
        branches.append(_cb(bp, high, padding=rate, dilation=rate))
    pooled = high.mean(axis=(1, 2), keepdims=True)
    pooled = _cb(p["aspp"]["pool"], pooled, padding=0)
    pooled = jnp.broadcast_to(pooled, high.shape[:3] + (pooled.shape[-1],))
    branches.append(pooled)
    y = _cb(p["aspp"]["project"], jnp.concatenate(branches, axis=-1),
            padding=0)

    y = resize_bilinear(y, (low.shape[1], low.shape[2]))
    low = _cb(p["low_proj"], low, padding=0)
    y = _cb(p["decoder"], jnp.concatenate([y, low], axis=-1))
    logits = L.conv2d(p["classifier"], y, padding=0)
    return resize_bilinear(logits, (h_in, w_in))


def seg_cross_entropy_loss(logits, labels, ignore_index: int = 255):
    """CE(ignore 255) over NHWC logits and (B,H,W) int labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
