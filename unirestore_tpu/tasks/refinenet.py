"""Light-Weight RefineNet-101 (ResNet backbone + CRP blocks) — frozen seg
probe.

The reference's segmentation monitor is RefineNet-LW-101 (``rf_lw101``,
src/modules/segmentation/refinenetlw/refinenetlw.py:153-327; monitor
``val_lq/rflwr101``, eval_semantic_segmentation.py:102). Exact structural
port of its forward (refinenetlw.py:224-274): per-level 1x1 dimension
reductions, adapt 1x1 convs on the skip path before fusion
(adapt_stage{2,3,4}_b2_joint_varout_dimred), ReLU after the add, chained
residual pooling (CRP: 4 rounds of 5x5/1 max-pool + 1x1 conv accumulated
residually, layer_factory.py:77-101), per-level fuse convs
(mflow_conv_g{1-3}_b3_joint_varout_dimred), align_corners=True bilinear
top-down upsampling, and a 3x3 classifier head at /4 resolution. Dropout
layers are inference-identity. The reference returns /4 logits and
upsamples at the loss/eval; ``refinenet_lw_apply`` optionally resizes to
the input for evaluator convenience.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops.resize import resize_bilinear, resize_bilinear_ac
from . import resnet as RN

CRP_STAGES = 4


def _crp_init(key, c: int):
    keys = jax.random.split(key, CRP_STAGES)
    return [L.conv2d_init(k, c, c, 1, bias=False) for k in keys]


def _crp(p, x):
    top = x
    for conv in p:
        top = jax.lax.reduce_window(top, -jnp.inf, jax.lax.max,
                                    (1, 5, 5, 1), (1, 1, 1, 1),
                                    padding=((0, 0), (2, 2), (2, 2), (0, 0)))
        top = L.conv2d(conv, top, padding=0)
        x = x + top
    return x


def refinenet_lw_init(key, num_classes: int = 19, backbone: str = "resnet101"):
    keys = iter(jax.random.split(key, 32))
    p = {"backbone": RN.resnet_init(next(keys), backbone)}
    del p["backbone"]["fc"]  # ResNetLW has no classification head
    # level channels from the bottleneck resnet: c2..c5
    chans = {"c5": 2048, "c4": 1024, "c3": 512, "c2": 256}
    p["dimred"] = {
        "c5": L.conv2d_init(next(keys), chans["c5"], 512, 1, bias=False),
        "c4": L.conv2d_init(next(keys), chans["c4"], 256, 1, bias=False),
        "c3": L.conv2d_init(next(keys), chans["c3"], 256, 1, bias=False),
        "c2": L.conv2d_init(next(keys), chans["c2"], 256, 1, bias=False),
    }
    # adapt convs on the skip before fusion (stages 2-4)
    p["adapt"] = {
        lvl: L.conv2d_init(next(keys), 256, 256, 1, bias=False)
        for lvl in ("c4", "c3", "c2")
    }
    p["crp"] = {
        "c5": _crp_init(next(keys), 512),
        "c4": _crp_init(next(keys), 256),
        "c3": _crp_init(next(keys), 256),
        "c2": _crp_init(next(keys), 256),
    }
    p["fuse"] = {
        "c5": L.conv2d_init(next(keys), 512, 256, 1, bias=False),
        "c4": L.conv2d_init(next(keys), 256, 256, 1, bias=False),
        "c3": L.conv2d_init(next(keys), 256, 256, 1, bias=False),
    }
    p["clf"] = L.conv2d_init(next(keys), 256, num_classes, 3)
    return p


def refinenet_lw_apply(p, images, preprocess_input: bool = True,
                       upsample_to_input: bool = True):
    """[0,1] NHWC -> seg logits (at input resolution by default)."""
    h_in, w_in = images.shape[1:3]
    x = images
    if preprocess_input:
        mean = jnp.asarray(RN.IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(RN.IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    f = RN.resnet_features(p["backbone"], x)

    y = jax.nn.relu(L.conv2d(p["dimred"]["c5"], f["c5"], padding=0))
    y = _crp(p["crp"]["c5"], y)
    y = L.conv2d(p["fuse"]["c5"], y, padding=0)

    for lvl in ("c4", "c3", "c2"):
        skip = L.conv2d(p["dimred"][lvl], f[lvl], padding=0)
        skip = L.conv2d(p["adapt"][lvl], skip, padding=0)
        y = resize_bilinear_ac(y, (skip.shape[1], skip.shape[2]))
        y = jax.nn.relu(skip + y)
        y = _crp(p["crp"][lvl], y)
        if lvl != "c2":
            y = L.conv2d(p["fuse"][lvl], y, padding=0)

    logits = L.conv2d(p["clf"], y, padding=1)
    if upsample_to_input:
        logits = resize_bilinear(logits, (h_in, w_in))
    return logits
