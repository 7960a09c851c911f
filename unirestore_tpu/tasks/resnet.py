"""ResNet classifier family (frozen critics / evaluation probes), NHWC.

The reference uses torchvision resnet50 (r50v1/r50v2 weights) as the frozen
classification critic for Stage-2 CE loss and as evaluation probes
(eval_classification.py:163-190, 248-265). This is a functional ResNet-v1
with inference-mode BatchNorm (running statistics folded as scale/shift);
weights come from the torch->npz converter (tools/convert_torchvision.py) or
random init for tests.

Inputs: NHWC in [0, 1]; ImageNet mean/std normalization happens inside
``preprocess`` (eval_classification.py resizes to 224^2 and normalizes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops.resize import resize_bilinear

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

BLOCKS = {"resnet18": (2, 2, 2, 2), "resnet50": (3, 4, 6, 3),
          "resnet101": (3, 4, 23, 3)}
BOTTLENECK = {"resnet18": False, "resnet50": True, "resnet101": True}


def preprocess(images, size: int = 224):
    """[0,1] NHWC -> ImageNet-normalized, resized to size^2."""
    x = resize_bilinear(images, (size, size))
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


def bn_init(c):
    return {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,)),
            "mean": jnp.zeros((c,)), "var": jnp.ones((c,))}


def batch_norm(p, x, eps: float = 1e-5):
    """Inference-mode BN with running stats (frozen critic semantics)."""
    inv = jax.lax.rsqrt(p["var"].astype(jnp.float32) + eps)
    scale = (p["scale"].astype(jnp.float32) * inv).astype(x.dtype)
    shift = (p["bias"].astype(jnp.float32)
             - p["mean"].astype(jnp.float32) * p["scale"].astype(jnp.float32)
             * inv).astype(x.dtype)
    return x * scale + shift


def _conv_bn_init(key, cin, cout, k, stride=1):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": bn_init(cout)}


def _bottleneck_init(key, cin, width, cout, stride):
    ks = jax.random.split(key, 4)
    p = {
        "conv1": _conv_bn_init(ks[0], cin, width, 1),
        "conv2": _conv_bn_init(ks[1], width, width, 3, stride),
        "conv3": _conv_bn_init(ks[2], width, cout, 1),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _conv_bn_init(ks[3], cin, cout, 1, stride)
    return p


def _basic_init(key, cin, cout, stride):
    ks = jax.random.split(key, 3)
    p = {
        "conv1": _conv_bn_init(ks[0], cin, cout, 3, stride),
        "conv2": _conv_bn_init(ks[1], cout, cout, 3),
    }
    if stride != 1 or cin != cout:
        p["downsample"] = _conv_bn_init(ks[2], cin, cout, 1, stride)
    return p


def resnet_init(key, arch: str = "resnet50", num_classes: int = 1000):
    blocks = BLOCKS[arch]
    bottleneck = BOTTLENECK[arch]
    keys = iter(jax.random.split(key, 64))
    p = {"stem": _conv_bn_init(next(keys), 3, 64, 7)}
    cin = 64
    layers = []
    for i, n in enumerate(blocks):
        width = 64 * (2 ** i)
        cout = width * 4 if bottleneck else width
        stage = []
        for j in range(n):
            stride = 2 if (i > 0 and j == 0) else 1
            if bottleneck:
                stage.append(_bottleneck_init(next(keys), cin, width, cout,
                                              stride))
            else:
                stage.append(_basic_init(next(keys), cin, cout, stride))
            cin = cout
        layers.append(stage)
    p["layers"] = layers
    p["fc"] = L.linear_init(next(keys), cin, num_classes)
    return p


def _conv_bn(p, x, stride=1, padding="SAME", dilation=1):
    x = L.conv2d(p["conv"], x, stride=stride, padding=padding,
                 dilation=dilation)
    return batch_norm(p["bn"], x)


def _bottleneck(p, x, stride, dilation=1):
    identity = x
    if "conv3" not in p:  # BasicBlock (resnet18/34)
        h = jax.nn.relu(_conv_bn(p["conv1"], x, stride=stride,
                                 padding=dilation, dilation=dilation))
        h = _conv_bn(p["conv2"], h, padding=dilation, dilation=dilation)
    else:
        h = jax.nn.relu(_conv_bn(p["conv1"], x))
        h = jax.nn.relu(_conv_bn(p["conv2"], h, stride=stride,
                                 padding=dilation, dilation=dilation))
        h = _conv_bn(p["conv3"], h)
    if "downsample" in p:
        identity = _conv_bn(p["downsample"], x, stride=stride, padding=0)
    return jax.nn.relu(identity + h)


def max_pool_3x3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))


def resnet_features(p, x, output_stride: int | None = None):
    """Returns dict of stage features: stem, c2 (/4), c3 (/8), c4 (/16),
    c5 (/32 or dilated /16 for output_stride=16)."""
    h = jax.nn.relu(_conv_bn(p["stem"], x, stride=2, padding=3))
    h = max_pool_3x3_s2(h)
    feats = {"stem": h}
    strides = [1, 2, 2, 2]
    dilations = [1, 1, 1, 1]
    if output_stride == 16:
        strides[3] = 1
        dilations[3] = 2
    elif output_stride == 8:
        strides[2] = strides[3] = 1
        dilations[2], dilations[3] = 2, 4
    for i, stage in enumerate(p["layers"]):
        for j, blk in enumerate(stage):
            h = _bottleneck(blk, h, strides[i] if j == 0 else 1, dilations[i])
        feats[f"c{i + 2}"] = h
    return feats


def resnet_apply(p, images, preprocess_input: bool = True):
    """Full classifier: [0,1] NHWC -> logits (B, num_classes)."""
    x = preprocess(images) if preprocess_input else images
    feats = resnet_features(p, x)
    pooled = feats["c5"].mean(axis=(1, 2))
    return L.linear(p["fc"], pooled)


def cross_entropy_loss(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
