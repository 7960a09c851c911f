"""InceptionV3 (pool3, 2048-d) feature extractor for FID.

The reference's FID uses torchmetrics' InceptionV3 features
(eval_image_restoration.py:186). Functional NHWC port of the torchvision
InceptionV3 topology (Conv-BN stem, InceptionA/B/C/D/E towers) up to the
global-average pool. Weights load from ``weights/inception_v3.npz``
(tools/convert_torchvision.py inception); random init otherwise (FID then
measures distributional distance under a random projection — pipeline
works, values not comparable).

FID preprocessing convention: inputs in [0, 1], resized to 299x299
bilinear, normalized to [-1, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from ..ops.resize import resize_bilinear
from ..tasks.resnet import bn_init, batch_norm


def _cbn_init(key, cin, cout, k, **kw):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": bn_init(cout)}


def _cbn(p, x, stride=1, padding="SAME"):
    x = L.conv2d(p["conv"], x, stride=stride, padding=padding)
    return jax.nn.relu(batch_norm(p["bn"], x, eps=1e-3))


def _pool(x, size=3, stride=1, padding=1, kind="max"):
    pad = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    if kind == "max":
        return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                     (1, size, size, 1), (1, stride, stride, 1),
                                     padding=pad)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, size, size, 1),
                              (1, stride, stride, 1), padding=pad)
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, size, size, 1),
                              (1, stride, stride, 1), padding=pad)
    return s / n


def inception_v3_init(key, dtype=jnp.float32):
    ks = iter(jax.random.split(key, 128))
    p = {
        "stem": [
            _cbn_init(next(ks), 3, 32, 3), _cbn_init(next(ks), 32, 32, 3),
            _cbn_init(next(ks), 32, 64, 3), _cbn_init(next(ks), 64, 80, 1),
            _cbn_init(next(ks), 80, 192, 3),
        ],
    }

    def incA(cin, pool_ch):
        return {
            "b1x1": _cbn_init(next(ks), cin, 64, 1),
            "b5_1": _cbn_init(next(ks), cin, 48, 1),
            "b5_2": _cbn_init(next(ks), 48, 64, 5),
            "b3_1": _cbn_init(next(ks), cin, 64, 1),
            "b3_2": _cbn_init(next(ks), 64, 96, 3),
            "b3_3": _cbn_init(next(ks), 96, 96, 3),
            "bp": _cbn_init(next(ks), cin, pool_ch, 1),
        }

    p["a"] = [incA(192, 32), incA(256, 64), incA(288, 64)]
    p["b"] = {
        "b3": _cbn_init(next(ks), 288, 384, 3),
        "d3_1": _cbn_init(next(ks), 288, 64, 1),
        "d3_2": _cbn_init(next(ks), 64, 96, 3),
        "d3_3": _cbn_init(next(ks), 96, 96, 3),
    }

    def incC(c7):
        return {
            "b1x1": _cbn_init(next(ks), 768, 192, 1),
            "b7_1": _cbn_init(next(ks), 768, c7, 1),
            "b7_2": _cbn_init(next(ks), c7, c7, (1, 7)),
            "b7_3": _cbn_init(next(ks), c7, 192, (7, 1)),
            "b7d_1": _cbn_init(next(ks), 768, c7, 1),
            "b7d_2": _cbn_init(next(ks), c7, c7, (7, 1)),
            "b7d_3": _cbn_init(next(ks), c7, c7, (1, 7)),
            "b7d_4": _cbn_init(next(ks), c7, c7, (7, 1)),
            "b7d_5": _cbn_init(next(ks), c7, 192, (1, 7)),
            "bp": _cbn_init(next(ks), 768, 192, 1),
        }

    p["c"] = [incC(128), incC(160), incC(160), incC(192)]
    p["d"] = {
        "b3_1": _cbn_init(next(ks), 768, 192, 1),
        "b3_2": _cbn_init(next(ks), 192, 320, 3),
        "b7_1": _cbn_init(next(ks), 768, 192, 1),
        "b7_2": _cbn_init(next(ks), 192, 192, (1, 7)),
        "b7_3": _cbn_init(next(ks), 192, 192, (7, 1)),
        "b7_4": _cbn_init(next(ks), 192, 192, 3),
    }

    def incE(cin):
        return {
            "b1x1": _cbn_init(next(ks), cin, 320, 1),
            "b3_1": _cbn_init(next(ks), cin, 384, 1),
            "b3_2a": _cbn_init(next(ks), 384, 384, (1, 3)),
            "b3_2b": _cbn_init(next(ks), 384, 384, (3, 1)),
            "bd_1": _cbn_init(next(ks), cin, 448, 1),
            "bd_2": _cbn_init(next(ks), 448, 384, 3),
            "bd_3a": _cbn_init(next(ks), 384, 384, (1, 3)),
            "bd_3b": _cbn_init(next(ks), 384, 384, (3, 1)),
            "bp": _cbn_init(next(ks), cin, 192, 1),
        }

    p["e"] = [incE(1280), incE(2048)]
    return p


def _inception_a(p, x):
    b1 = _cbn(p["b1x1"], x, padding=0)
    b5 = _cbn(p["b5_2"], _cbn(p["b5_1"], x, padding=0), padding=2)
    b3 = _cbn(p["b3_3"], _cbn(p["b3_2"], _cbn(p["b3_1"], x, padding=0),
                              padding=1), padding=1)
    bp = _cbn(p["bp"], _pool(x, kind="avg"), padding=0)
    return jnp.concatenate([b1, b5, b3, bp], -1)


def _inception_c(p, x):
    b1 = _cbn(p["b1x1"], x, padding=0)
    b7 = _cbn(p["b7_1"], x, padding=0)
    b7 = _cbn(p["b7_2"], b7, padding=((0, 0), (3, 3)))
    b7 = _cbn(p["b7_3"], b7, padding=((3, 3), (0, 0)))
    bd = _cbn(p["b7d_1"], x, padding=0)
    bd = _cbn(p["b7d_2"], bd, padding=((3, 3), (0, 0)))
    bd = _cbn(p["b7d_3"], bd, padding=((0, 0), (3, 3)))
    bd = _cbn(p["b7d_4"], bd, padding=((3, 3), (0, 0)))
    bd = _cbn(p["b7d_5"], bd, padding=((0, 0), (3, 3)))
    bp = _cbn(p["bp"], _pool(x, kind="avg"), padding=0)
    return jnp.concatenate([b1, b7, bd, bp], -1)


def _inception_e(p, x):
    b1 = _cbn(p["b1x1"], x, padding=0)
    b3 = _cbn(p["b3_1"], x, padding=0)
    b3 = jnp.concatenate([
        _cbn(p["b3_2a"], b3, padding=((0, 0), (1, 1))),
        _cbn(p["b3_2b"], b3, padding=((1, 1), (0, 0)))], -1)
    bd = _cbn(p["bd_2"], _cbn(p["bd_1"], x, padding=0), padding=1)
    bd = jnp.concatenate([
        _cbn(p["bd_3a"], bd, padding=((0, 0), (1, 1))),
        _cbn(p["bd_3b"], bd, padding=((1, 1), (0, 0)))], -1)
    bp = _cbn(p["bp"], _pool(x, kind="avg"), padding=0)
    return jnp.concatenate([b1, b3, bd, bp], -1)


def inception_v3_features(p, images):
    """images in [0,1] NHWC -> (B, 2048) pool3 features."""
    x = resize_bilinear(images, (299, 299))
    x = x * 2.0 - 1.0
    s = p["stem"]
    x = _cbn(s[0], x, stride=2, padding="VALID")
    x = _cbn(s[1], x, padding="VALID")
    x = _cbn(s[2], x, padding=1)
    x = _pool(x, 3, 2, 0)
    x = _cbn(s[3], x, padding="VALID")
    x = _cbn(s[4], x, padding="VALID")
    x = _pool(x, 3, 2, 0)
    for blk in p["a"]:
        x = _inception_a(blk, x)
    # reduction B
    b = p["b"]
    b3 = _cbn(b["b3"], x, stride=2, padding="VALID")
    d3 = _cbn(b["d3_3"], _cbn(b["d3_2"], _cbn(b["d3_1"], x, padding=0),
                              padding=1), stride=2, padding="VALID")
    x = jnp.concatenate([b3, d3, _pool(x, 3, 2, 0)], -1)
    for blk in p["c"]:
        x = _inception_c(blk, x)
    # reduction D
    d = p["d"]
    b3 = _cbn(d["b3_2"], _cbn(d["b3_1"], x, padding=0), stride=2,
              padding="VALID")
    b7 = _cbn(d["b7_2"], _cbn(d["b7_1"], x, padding=0),
              padding=((0, 0), (3, 3)))
    b7 = _cbn(d["b7_3"], b7, padding=((3, 3), (0, 0)))
    b7 = _cbn(d["b7_4"], b7, stride=2, padding="VALID")
    x = jnp.concatenate([b3, b7, _pool(x, 3, 2, 0)], -1)
    for blk in p["e"]:
        x = _inception_e(blk, x)
    return x.mean(axis=(1, 2))


def make_fid_extractor(params=None, key=None):
    """Returns (extractor_fn, dim) for evalx.fid.FID."""
    if params is None:
        from .. import zoo
        params = inception_v3_init(key or jax.random.PRNGKey(11))
        params, _ = zoo.load_npz_tree("inception_v3", params)
    fn = jax.jit(lambda imgs: inception_v3_features(params, imgs))

    def extract(images):
        import numpy as np
        return np.asarray(fn(jnp.asarray(images, jnp.float32)))

    return extract, 2048
