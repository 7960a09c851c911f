"""SPADE — spatially-adaptive GroupNorm modulation (alternate control mode).

Reference: spade.py:29-71 ("spadegroup3x3"): GroupNorm(32) on x, control map
nearest-resized to x, shared 3x3+ReLU trunk, gamma/beta 3x3 heads, then
``norm(x) * (1 + gamma) + beta``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L

NHIDDEN = 128


def spade_init(key, norm_nc: int, label_nc: int = 128, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "norm": L.norm_init(norm_nc, dtype),
        "mlp_shared": L.conv2d_init(k1, label_nc, NHIDDEN, 3, dtype=dtype),
        "mlp_gamma": L.conv2d_init(k2, NHIDDEN, norm_nc, 3, dtype=dtype),
        "mlp_beta": L.conv2d_init(k3, NHIDDEN, norm_nc, 3, dtype=dtype),
    }


def spade(p, x, segmap):
    normalized = L.group_norm(p["norm"], x, groups=32, eps=1e-5)
    seg = L.resize_nearest(segmap, (x.shape[1], x.shape[2]))
    actv = jax.nn.relu(L.conv2d(p["mlp_shared"], seg, padding=1))
    gamma = L.conv2d(p["mlp_gamma"], actv, padding=1)
    beta = L.conv2d(p["mlp_beta"], actv, padding=1)
    return normalized * (1.0 + gamma) + beta
