"""LPIPS (alex backbone) — learned perceptual metric.

The reference uses torchmetrics LPIPS(net_type="alex", normalize=True)
(eval_image_restoration.py:184). Functional port: AlexNet feature trunk, 5
tap points after each ReLU, per-position channel unit-normalization, learned
1x1 linear heads, spatial mean, layer sum. Pretrained weights load through
tools/convert_torchvision.py (AlexNet trunk + LPIPS lin heads); random init
otherwise (pipeline-complete, values then not comparable to the paper's).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L

# AlexNet feature config: (cout, kernel, stride, pad), M = maxpool 3x3/2
_ALEX_CFG = [(64, 11, 4, 2), "M", (192, 5, 1, 2), "M", (384, 3, 1, 1),
             (256, 3, 1, 1), (256, 3, 1, 1)]
_TAP_CHANNELS = (64, 192, 384, 256, 256)

# LPIPS input scaling (the official net expects [-1,1] then these shifts)
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def lpips_init(key):
    keys = iter(jax.random.split(key, 16))
    convs = []
    cin = 3
    for c in _ALEX_CFG:
        if c == "M":
            continue
        cout, k, s, p = c
        convs.append(L.conv2d_init(next(keys), cin, cout, k))
        cin = cout
    lins = [L.conv2d_init(next(keys), ch, 1, 1, bias=False)
            for ch in _TAP_CHANNELS]
    return {"convs": convs, "lins": lins}


def _maxpool(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 3, 3, 1),
                                 (1, 2, 2, 1), "VALID")


def _alex_feats(p, x):
    feats = []
    i = 0
    for c in _ALEX_CFG:
        if c == "M":
            x = _maxpool(x)
            continue
        _, k, s, pad = c
        x = L.conv2d(p["convs"][i], x, stride=s, padding=pad)
        x = jax.nn.relu(x)
        feats.append(x)
        i += 1
    return feats


def lpips_apply(p, x, y, normalize: bool = True):
    """x, y: NHWC; normalize=True means inputs are in [0,1]."""
    if normalize:
        x = 2.0 * x - 1.0
        y = 2.0 * y - 1.0
    shift = jnp.asarray(_SHIFT, x.dtype)
    scale = jnp.asarray(_SCALE, x.dtype)
    x = (x - shift) / scale
    y = (y - shift) / scale
    fx, fy = _alex_feats(p, x), _alex_feats(p, y)
    total = 0.0
    for lin, a, b in zip(p["lins"], fx, fy):
        na = a * jax.lax.rsqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
        nb = b * jax.lax.rsqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        total = total + L.conv2d(lin, d, padding=0).mean(axis=(1, 2, 3))
    return total


def make_lpips(params=None, key=None):
    """Returns fn(pred, target) -> per-image LPIPS distances (numpy), the
    ``lpips_fn`` the ImageRestorationEvaluator wires into the FR metric
    collection (reference eval_image_restoration.py:184). Weights load
    from weights/lpips_alex.npz (tools/convert_torchvision.py) with the
    usual random-init fallback."""
    if params is None:
        from .. import zoo
        params = lpips_init(key or jax.random.PRNGKey(13))
        params, _ = zoo.load_npz_tree("lpips_alex", params)
    fn = jax.jit(lambda x, y: lpips_apply(params, x, y, normalize=True))

    def distance(pred, target):
        import numpy as np
        return np.asarray(fn(jnp.asarray(pred, jnp.float32),
                             jnp.asarray(target, jnp.float32)))

    return distance
