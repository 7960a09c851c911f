"""CLIP-IQA no-reference metric (reference: eval_image_restoration.py:192
``PyNRMetric('clipiqa')``).

CLIP-IQA (Wang et al., AAAI 2023): score = softmax over the cosine
similarities between the CLIP RN50 image embedding and a frozen
antonym-prompt pair ("Good photo." / "Bad photo."); the "good" probability
is the quality score in [0, 1].

The image tower is CLIP's ModifiedResNet-50: 3-conv stem with blur-free
average-pool downsampling, 4 bottleneck stages, and attention pooling to a
1024-d joint embedding. The two text embeddings are data (precomputed
offline by tools/convert_clip.py with the CLIP text tower) and shipped as
part of the weight file — the text transformer never runs at eval time.

Input: NHWC in [0, 1]; CLIP preprocessing (resize 224, CLIP mean/std)
happens inside. In pyiqa, clipiqa keeps the full image (no center crop);
we ARP-resize the short side to 224 and center-crop like CLIP's default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops.resize import resize_bicubic
from ..tasks import resnet as RN

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)

BLOCKS = (3, 4, 6, 3)
WIDTH = 64
EMBED = 1024
HEADS = 32


# inference-mode BN shared with the frozen critic stack (same usage as
# evalx/inception.py and evalx/nima.py)
_bn_init = RN.bn_init
_bn = RN.batch_norm


def _cbn_init(key, cin, cout, k):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": _bn_init(cout)}


def _bottleneck_init(key, cin, cout, stride):
    ks = jax.random.split(key, 4)
    width = cout // 4
    p = {
        "conv1": _cbn_init(ks[0], cin, width, 1),
        "conv2": _cbn_init(ks[1], width, width, 3),
        "conv3": _cbn_init(ks[2], width, cout, 1),
    }
    if stride > 1 or cin != cout:
        p["down"] = _cbn_init(ks[3], cin, cout, 1)
    return p


def clip_rn50_init(key, embed: int = EMBED):
    ks = iter(jax.random.split(key, 32))
    p = {
        "stem1": _cbn_init(next(ks), 3, WIDTH // 2, 3),
        "stem2": _cbn_init(next(ks), WIDTH // 2, WIDTH // 2, 3),
        "stem3": _cbn_init(next(ks), WIDTH // 2, WIDTH, 3),
        "layers": [],
        # attention pool: learned pos emb over 7*7+1 tokens, separate
        # q/k/v/out projections
        "attnpool": {
            "pos": jax.random.normal(next(ks), (50, WIDTH * 32)) * 0.02,
            "q": L.linear_init(next(ks), WIDTH * 32, WIDTH * 32),
            "k": L.linear_init(next(ks), WIDTH * 32, WIDTH * 32),
            "v": L.linear_init(next(ks), WIDTH * 32, WIDTH * 32),
            "out": L.linear_init(next(ks), WIDTH * 32, embed),
        },
        # antonym prompt-pair text embeddings, precomputed offline
        "text_features": jax.random.normal(next(ks), (2, embed)) * 0.02,
    }
    cin = WIDTH
    for i, n in enumerate(BLOCKS):
        cout = WIDTH * 4 * (2 ** i)
        stage = []
        for j in range(n):
            stage.append(_bottleneck_init(next(ks), cin, cout,
                                          2 if (j == 0 and i > 0) else 1))
            cin = cout
        p["layers"].append(stage)
    return p


def _avg_pool2(x, stride=2):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, stride, stride, 1), (1, stride, stride, 1),
        "VALID") / (stride * stride)


def _bottleneck(p, x, stride=1):
    h = jax.nn.relu(_bn(p["conv1"]["bn"], L.conv2d(p["conv1"]["conv"], x)))
    h = jax.nn.relu(_bn(p["conv2"]["bn"], L.conv2d(p["conv2"]["conv"], h)))
    if stride > 1:  # CLIP: avgpool then stride-1 conv
        h = _avg_pool2(h, stride)
    h = _bn(p["conv3"]["bn"], L.conv2d(p["conv3"]["conv"], h))
    identity = x
    if "down" in p:
        if stride > 1:
            identity = _avg_pool2(identity, stride)
        identity = _bn(p["down"]["bn"],
                       L.conv2d(p["down"]["conv"], identity))
    return jax.nn.relu(identity + h)


def _attn_pool(p, x):
    b, h, w, c = x.shape
    t = x.reshape(b, h * w, c)
    mean = t.mean(axis=1, keepdims=True)
    t = jnp.concatenate([mean, t], axis=1) + p["pos"].astype(t.dtype)[None]
    q = L.linear(p["q"], t[:, :1])
    k = L.linear(p["k"], t)
    v = L.linear(p["v"], t)
    d = c // HEADS
    q = q.reshape(b, 1, HEADS, d)
    k = k.reshape(b, -1, HEADS, d)
    v = v.reshape(b, -1, HEADS, d)
    logits = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (d ** -0.5)
    attn = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(t.dtype)
    o = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, 1, c)
    return L.linear(p["out"], o)[:, 0]


def preprocess(images, size: int = 224):
    """ARP-resize short side to ``size`` then center-crop size^2."""
    b, h, w, c = images.shape
    s = size / min(h, w)
    nh, nw = max(size, round(h * s)), max(size, round(w * s))
    x = resize_bicubic(images, (nh, nw))
    top, left = (nh - size) // 2, (nw - size) // 2
    x = x[:, top:top + size, left:left + size]
    mean = jnp.asarray(CLIP_MEAN, x.dtype)
    std = jnp.asarray(CLIP_STD, x.dtype)
    return (jnp.clip(x, 0, 1) - mean) / std


def image_features(p, images, preprocess_input: bool = True):
    x = preprocess(images) if preprocess_input else images
    h = jax.nn.relu(_bn(p["stem1"]["bn"],
                        L.conv2d(p["stem1"]["conv"], x, stride=2)))
    h = jax.nn.relu(_bn(p["stem2"]["bn"], L.conv2d(p["stem2"]["conv"], h)))
    h = jax.nn.relu(_bn(p["stem3"]["bn"], L.conv2d(p["stem3"]["conv"], h)))
    h = _avg_pool2(h, 2)
    for i, stage in enumerate(p["layers"]):
        for j, blk in enumerate(stage):
            h = _bottleneck(blk, h, 2 if (j == 0 and i > 0) else 1)
    return _attn_pool(p["attnpool"], h)


def clipiqa_score(p, images):
    """[0,1] NHWC -> quality score in [0,1] per image."""
    feat = image_features(p, images).astype(jnp.float32)
    feat = feat / jnp.linalg.norm(feat, axis=-1, keepdims=True)
    txt = p["text_features"].astype(jnp.float32)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    logits = 100.0 * feat @ txt.T  # (B, 2): [good, bad]
    probs = jax.nn.softmax(logits, axis=-1)
    return probs[:, 0]
