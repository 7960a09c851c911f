"""HyperIQA no-reference metric (reference: eval_image_restoration.py:198
``PyNRMetric('hyperiqa')``).

HyperIQA (Su et al., CVPR 2020): a ResNet-50 backbone produces (a) a
224-d multi-scale "local distortion aware" content vector (LDA conv+pool
heads after stages 1-4) and (b) a 112-ch hyper feature map from stage 4;
a hyper network generates the weights/biases of a small 4-layer target
network (112-56-28-14-1, sigmoid activations) that scores the content
vector per image. Scores are on a ~[0, 100] MOS scale.

Weights come offline from the official/pyiqa checkpoint via
tools/convert_iqa.py. Input: NHWC in [0, 1]; ImageNet-normalized 224^2
resize inside (pyiqa averages 10 random 224 crops; we use the
deterministic resize for reproducibility).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..tasks import resnet as RN

LDA_OUT = 16
HYPER_CH = 112
TARGET_IN = 224
FCS = (112, 56, 28, 14)
FEAT = 7  # hyper feature spatial size


def hyperiqa_init(key):
    ks = iter(jax.random.split(key, 32))
    p = {
        # resnet50 features only (the hyperIQA backbone has no fc head)
        "backbone": RN.resnet_init(next(ks), "resnet50"),
        # LDA heads: 1x1 conv then 7-stride avg pool then fc -> 16 each;
        # stage-4 GAP fc -> 224 - 3*16 = 176
        "lda1_conv": L.conv2d_init(next(ks), 256, 16, 1),
        "lda1_fc": L.linear_init(next(ks), 16 * 64, LDA_OUT),
        "lda2_conv": L.conv2d_init(next(ks), 512, 32, 1),
        "lda2_fc": L.linear_init(next(ks), 32 * 16, LDA_OUT),
        "lda3_conv": L.conv2d_init(next(ks), 1024, 64, 1),
        "lda3_fc": L.linear_init(next(ks), 64 * 4, LDA_OUT),
        "lda4_fc": L.linear_init(next(ks), 2048, TARGET_IN - 3 * LDA_OUT),
        # hyper feature: 2048 -> 1024 -> 512 -> 112 (1x1 convs + relu)
        "hconv1": L.conv2d_init(next(ks), 2048, 1024, 1),
        "hconv2": L.conv2d_init(next(ks), 1024, 512, 1),
        "hconv3": L.conv2d_init(next(ks), 512, HYPER_CH, 1),
    }
    # weight-generating 3x3 convs (spatial 7x7 folds into the fan-in) and
    # bias-generating linears on the pooled hyper vector
    sizes = (TARGET_IN,) + FCS
    for i in range(4):
        fin, fout = sizes[i], sizes[i + 1]
        p[f"fc{i + 1}w_conv"] = L.conv2d_init(
            next(ks), HYPER_CH, fin * fout // (FEAT * FEAT), 3)
        p[f"fc{i + 1}b_fc"] = L.linear_init(next(ks), HYPER_CH, fout)
    p["fc5w_fc"] = L.linear_init(next(ks), HYPER_CH, FCS[-1])
    p["fc5b_fc"] = L.linear_init(next(ks), HYPER_CH, 1)
    return p


def _avgpool7(x):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 7, 7, 1), (1, 7, 7, 1), "VALID") / 49.0


def _lda(conv, fc, x):
    h = _avgpool7(L.conv2d(conv, x, padding=0))
    b = h.shape[0]
    # torch flattens NCHW (channel-major)
    flat = jnp.transpose(h, (0, 3, 1, 2)).reshape(b, -1)
    return L.linear(fc, flat)


def hyperiqa_score(p, images, preprocess_input: bool = True):
    """[0,1] NHWC -> quality score per image (~[0, 100] MOS scale)."""
    x = RN.preprocess(images) if preprocess_input else images
    feats = RN.resnet_features(p["backbone"], x)
    b = x.shape[0]

    content = jnp.concatenate([
        _lda(p["lda1_conv"], p["lda1_fc"], feats["c2"]),
        _lda(p["lda2_conv"], p["lda2_fc"], feats["c3"]),
        _lda(p["lda3_conv"], p["lda3_fc"], feats["c4"]),
        L.linear(p["lda4_fc"], _avgpool7(feats["c5"]).reshape(b, -1)),
    ], axis=-1)  # (B, 224)

    h = jax.nn.relu(L.conv2d(p["hconv1"], feats["c5"]))
    h = jax.nn.relu(L.conv2d(p["hconv2"], h))
    hyper = jax.nn.relu(L.conv2d(p["hconv3"], h))  # (B, 7, 7, 112)
    pooled = hyper.mean(axis=(1, 2))  # (B, 112)

    v = content.astype(jnp.float32)
    sizes = (TARGET_IN,) + FCS
    for i in range(4):
        fin, fout = sizes[i], sizes[i + 1]
        wmap = L.conv2d(p[f"fc{i + 1}w_conv"], hyper, padding=1)
        # (B, 7, 7, fin*fout/49) -> channel-major flatten -> (B, fout, fin)
        w = jnp.transpose(wmap, (0, 3, 1, 2)).reshape(b, fout, fin)
        bias = L.linear(p[f"fc{i + 1}b_fc"], pooled)
        v = jax.nn.sigmoid(
            jnp.einsum("boi,bi->bo", w.astype(jnp.float32), v)
            + bias.astype(jnp.float32))
    w5 = L.linear(p["fc5w_fc"], pooled).astype(jnp.float32)  # (B, 14)
    b5 = L.linear(p["fc5b_fc"], pooled).astype(jnp.float32)  # (B, 1)
    return (v * w5).sum(axis=-1) + b5[:, 0]
