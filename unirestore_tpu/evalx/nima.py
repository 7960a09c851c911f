"""NIMA no-reference aesthetic/quality metric (reference:
eval_image_restoration.py:197 ``PyNRMetric('nima-koniq')``).

NIMA (Talebi & Milanfar, TIP 2018) over an Inception-ResNet-V2 backbone:
GAP features -> dropout -> linear head. The AVA variant emits a 10-bin
score distribution whose expectation (1..10) is the score; the KonIQ-10k
variant regresses a single MOS. Weights come offline from the timm/pyiqa
checkpoints via tools/convert_iqa.py.

Input: NHWC in [0, 1]; ImageNet-normalized 224^2 resize inside (pyiqa NIMA
default test transform).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..tasks import resnet as RN

BN_EPS = 1e-3


def _cbn_init(key, cin, cout, k):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": RN.bn_init(cout)}


def _cbn(p, x, stride=1, padding="SAME"):
    h = L.conv2d(p["conv"], x, stride=stride, padding=padding)
    return jax.nn.relu(RN.batch_norm(p["bn"], h, eps=BN_EPS))


def _branch_init(ks, specs):
    """specs: list of (cin, cout, k) conv+bn stages."""
    return [_cbn_init(next(ks), cin, cout, k) for cin, cout, k in specs]


def _block35_init(ks):
    return {
        "b0": _branch_init(ks, [(320, 32, 1)]),
        "b1": _branch_init(ks, [(320, 32, 1), (32, 32, 3)]),
        "b2": _branch_init(ks, [(320, 32, 1), (32, 48, 3), (48, 64, 3)]),
        "conv": L.conv2d_init(next(ks), 128, 320, 1),
    }


def _block17_init(ks):
    return {
        "b0": _branch_init(ks, [(1088, 192, 1)]),
        "b1": _branch_init(ks, [(1088, 128, 1), (128, 160, (1, 7)),
                                (160, 192, (7, 1))]),
        "conv": L.conv2d_init(next(ks), 384, 1088, 1),
    }


def _block8_init(ks):
    return {
        "b0": _branch_init(ks, [(2080, 192, 1)]),
        "b1": _branch_init(ks, [(2080, 192, 1), (192, 224, (1, 3)),
                                (224, 256, (3, 1))]),
        "conv": L.conv2d_init(next(ks), 448, 2080, 1),
    }


def inception_resnet_v2_init(key, num_classes: int = 10):
    ks = iter(jax.random.split(key, 512))
    p = {
        "stem": [
            _cbn_init(next(ks), 3, 32, 3),    # conv2d_1a /2 VALID
            _cbn_init(next(ks), 32, 32, 3),   # conv2d_2a VALID
            _cbn_init(next(ks), 32, 64, 3),   # conv2d_2b SAME
            _cbn_init(next(ks), 64, 80, 1),   # conv2d_3b
            _cbn_init(next(ks), 80, 192, 3),  # conv2d_4a VALID
        ],
        "mixed_5b": {
            "b0": _branch_init(ks, [(192, 96, 1)]),
            "b1": _branch_init(ks, [(192, 48, 1), (48, 64, 5)]),
            "b2": _branch_init(ks, [(192, 64, 1), (64, 96, 3), (96, 96, 3)]),
            "bp": _branch_init(ks, [(192, 64, 1)]),
        },
        "repeat": [_block35_init(ks) for _ in range(10)],
        "mixed_6a": {
            "b0": _branch_init(ks, [(320, 384, 3)]),
            "b1": _branch_init(ks, [(320, 256, 1), (256, 256, 3),
                                    (256, 384, 3)]),
        },
        "repeat_1": [_block17_init(ks) for _ in range(20)],
        "mixed_7a": {
            "b0": _branch_init(ks, [(1088, 256, 1), (256, 384, 3)]),
            "b1": _branch_init(ks, [(1088, 256, 1), (256, 288, 3)]),
            "b2": _branch_init(ks, [(1088, 256, 1), (256, 288, 3),
                                    (288, 320, 3)]),
        },
        "repeat_2": [_block8_init(ks) for _ in range(9)],
        "block8": _block8_init(ks),
        "conv2d_7b": _cbn_init(next(ks), 2080, 1536, 1),
        "head": L.linear_init(next(ks), 1536, num_classes),
    }
    return p


def _branch(blocks, x, pads=None, strides=None):
    for i, blk in enumerate(blocks):
        pad = pads[i] if pads else "SAME"
        stride = strides[i] if strides else 1
        x = _cbn(blk, x, stride=stride, padding=pad)
    return x


def _residual_block(p, x, scale, branches, activate=True):
    outs = [
        _branch(p[name], x) for name in branches
    ]
    mix = jnp.concatenate(outs, axis=-1)
    up = L.conv2d(p["conv"], mix)
    x = x + scale * up
    return jax.nn.relu(x) if activate else x


def _maxpool3_s2(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID")


def _avgpool3_s1(x):
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    n = jax.lax.reduce_window(
        jnp.ones_like(x[..., :1]), 0.0, jax.lax.add, (1, 3, 3, 1),
        (1, 1, 1, 1), padding=((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / n


def inception_resnet_v2_features(p, x):
    st = p["stem"]
    h = _cbn(st[0], x, stride=2, padding="VALID")
    h = _cbn(st[1], h, padding="VALID")
    h = _cbn(st[2], h)
    h = _maxpool3_s2(h)
    h = _cbn(st[3], h)
    h = _cbn(st[4], h, padding="VALID")
    h = _maxpool3_s2(h)
    m = p["mixed_5b"]
    h = jnp.concatenate([
        _branch(m["b0"], h), _branch(m["b1"], h), _branch(m["b2"], h),
        _branch(m["bp"], _avgpool3_s1(h)),
    ], axis=-1)  # 320
    for blk in p["repeat"]:
        h = _residual_block(blk, h, 0.17, ("b0", "b1", "b2"))
    m = p["mixed_6a"]
    h = jnp.concatenate([
        _branch(m["b0"], h, pads=["VALID"], strides=[2]),
        _branch(m["b1"], h, pads=["SAME", "SAME", "VALID"],
                strides=[1, 1, 2]),
        _maxpool3_s2(h),
    ], axis=-1)  # 1088
    for blk in p["repeat_1"]:
        h = _residual_block(blk, h, 0.10, ("b0", "b1"))
    m = p["mixed_7a"]
    h = jnp.concatenate([
        _branch(m["b0"], h, pads=["SAME", "VALID"], strides=[1, 2]),
        _branch(m["b1"], h, pads=["SAME", "VALID"], strides=[1, 2]),
        _branch(m["b2"], h, pads=["SAME", "SAME", "VALID"],
                strides=[1, 1, 2]),
        _maxpool3_s2(h),
    ], axis=-1)  # 2080
    for blk in p["repeat_2"]:
        h = _residual_block(blk, h, 0.20, ("b0", "b1"))
    h = _residual_block(p["block8"], h, 1.0, ("b0", "b1"), activate=False)
    h = _cbn(p["conv2d_7b"], h)
    return h.mean(axis=(1, 2))  # GAP -> (B, 1536)


def nima_score(p, images, num_classes: int = 10,
               preprocess_input: bool = True):
    """[0,1] NHWC -> NIMA score per image.

    num_classes=10: softmax distribution, score = E[bin] in [1, 10];
    num_classes=1: direct regression output.
    """
    x = RN.preprocess(images) if preprocess_input else images
    feats = inception_resnet_v2_features(p, x)
    out = L.linear(p["head"], feats).astype(jnp.float32)
    if num_classes == 1:
        return out[:, 0]
    probs = jax.nn.softmax(out, axis=-1)
    bins = jnp.arange(1, num_classes + 1, dtype=jnp.float32)
    return (probs * bins).sum(axis=-1)
