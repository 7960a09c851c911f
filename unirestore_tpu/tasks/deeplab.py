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


# backbone -> (high-level channels, low-level channels)
BACKBONE_CHANNELS = {
    "resnet50": (2048, 256), "resnet101": (2048, 256),
    "mobilenetv2": (320, 24), "xception": (2048, 128),
    "hrnetv2_48": (720, 256), "hrnetv2_32": (480, 256),
}


def _backbone_init(key, backbone: str):
    if backbone in ("resnet50", "resnet101"):
        p = RN.resnet_init(key, backbone)
        del p["fc"]
        return p
    from . import backbones as BB
    if backbone == "mobilenetv2":
        return BB.mobilenet_v2_init(key)
    if backbone == "xception":
        return BB.xception_init(key)
    if backbone.startswith("hrnetv2"):
        return BB.hrnetv2_init(key, width=int(backbone.split("_")[-1]))
    raise ValueError(f"unknown deeplab backbone {backbone}")


def _backbone_features(p, backbone: str, x, output_stride: int):
    if backbone in ("resnet50", "resnet101"):
        f = RN.resnet_features(p, x, output_stride=output_stride)
        return {"low": f["c2"], "high": f["c5"]}
    from . import backbones as BB
    if backbone == "mobilenetv2":
        return BB.mobilenet_v2_features(p, x, output_stride)
    if backbone.startswith("hrnetv2"):
        return BB.hrnetv2_features(p, x, width=int(backbone.split("_")[-1]))
    return BB.xception_features(p, x, output_stride)


def deeplabv3plus_init(key, num_classes: int = 19,
                       backbone: str = "resnet50", plus: bool = True):
    keys = iter(jax.random.split(key, 16))
    p = {"backbone": _backbone_init(next(keys), backbone)}
    c_high, c_low = BACKBONE_CHANNELS[backbone]
    # ASPP: 1x1 + three atrous 3x3 + image pooling, all -> 256
    p["aspp"] = {
        "conv1x1": _conv_bn_init(next(keys), c_high, 256, 1),
        "atrous": [_conv_bn_init(next(keys), c_high, 256, 3)
                   for _ in ASPP_RATES],
        "pool": _conv_bn_init(next(keys), c_high, 256, 1),
        "project": _conv_bn_init(next(keys), 256 * (2 + len(ASPP_RATES)),
                                 256, 1),
    }
    if plus:  # DeepLabV3+: low-level fusion decoder (modeling.py:288-353)
        p["low_proj"] = _conv_bn_init(next(keys), c_low, 48, 1)
        p["decoder"] = _conv_bn_init(next(keys), 256 + 48, 256, 3)
    else:     # plain DeepLabV3 head (modeling.py:193-264)
        p["decoder"] = _conv_bn_init(next(keys), 256, 256, 3)
    p["classifier"] = L.conv2d_init(next(keys), 256, num_classes, 1)
    return p


def _cb(p, x, padding="SAME", dilation=1):
    x = L.conv2d(p["conv"], x, padding=padding, dilation=dilation)
    return jax.nn.relu(RN.batch_norm(p["bn"], x))


def deeplabv3plus_apply(p, images, preprocess_input: bool = True,
                        backbone: str = "resnet50",
                        output_stride: int = 16):
    """[0,1] NHWC images -> logits at input resolution (B, H, W, classes)."""
    h_in, w_in = images.shape[1:3]
    x = images
    if preprocess_input:
        mean = jnp.asarray(RN.IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(RN.IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    feats = _backbone_features(p["backbone"], backbone, x, output_stride)
    high, low = feats["high"], feats["low"]

    branches = [_cb(p["aspp"]["conv1x1"], high, padding=0)]
    for rate, bp in zip(ASPP_RATES, p["aspp"]["atrous"]):
        branches.append(_cb(bp, high, padding=rate, dilation=rate))
    pooled = high.mean(axis=(1, 2), keepdims=True)
    pooled = _cb(p["aspp"]["pool"], pooled, padding=0)
    pooled = jnp.broadcast_to(pooled, high.shape[:3] + (pooled.shape[-1],))
    branches.append(pooled)
    y = _cb(p["aspp"]["project"], jnp.concatenate(branches, axis=-1),
            padding=0)

    if "low_proj" in p:  # DeepLabV3+ decoder
        y = resize_bilinear(y, (low.shape[1], low.shape[2]))
        low = _cb(p["low_proj"], low, padding=0)
        y = _cb(p["decoder"], jnp.concatenate([y, low], axis=-1))
    else:  # plain DeepLabV3
        y = _cb(p["decoder"], y)
    logits = L.conv2d(p["classifier"], y, padding=0)
    return resize_bilinear(logits, (h_in, w_in))


# the reference factory surface (modeling.py:171-353)
def deeplab_factory(name: str, num_classes: int = 19,
                    output_stride: int = 16):
    """Returns (init_fn(key), apply_fn(p, images)) for a modeling.py name,
    e.g. 'deeplabv3plus_resnet50', 'deeplabv3_mobilenet',
    'deeplabv3plus_hrnetv2_48' (hrnet runs at output stride 4,
    modeling.py:171-191)."""
    plus = name.startswith("deeplabv3plus_")
    backbone = name.split("_", 1)[1]
    backbone = {"mobilenet": "mobilenetv2"}.get(backbone, backbone)
    if backbone not in BACKBONE_CHANNELS:
        raise ValueError(f"unknown deeplab variant {name}")
    if backbone.startswith("hrnetv2"):
        output_stride = 4

    def init_fn(key):
        return deeplabv3plus_init(key, num_classes, backbone, plus=plus)

    def apply_fn(p, images, preprocess_input: bool = True):
        return deeplabv3plus_apply(p, images, preprocess_input,
                                   backbone=backbone,
                                   output_stride=output_stride)

    return init_fn, apply_fn


def seg_cross_entropy_loss(logits, labels, ignore_index: int = 255):
    """CE(ignore 255) over NHWC logits and (B,H,W) int labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    valid = labels != ignore_index
    safe = jnp.where(valid, labels, 0)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    return (nll * valid).sum() / jnp.maximum(valid.sum(), 1)
