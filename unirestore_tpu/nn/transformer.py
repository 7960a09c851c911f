"""Transformer2DModel port for the SD2.1 UNet cross-attention blocks (NHWC).

SD2.1/sd-turbo uses ``use_linear_projection=True``: GroupNorm -> Linear
proj_in -> N x BasicTransformerBlock (self-attn, cross-attn on the text
context, GEGLU feed-forward) -> Linear proj_out -> residual.
Reference data path: base_model.py:134-139 (attn applied after each resnet).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import attention as A
from . import layers as L


def basic_transformer_block_init(key, dim: int, heads: int, dim_head: int,
                                 context_dim: int, dtype=jnp.float32):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    return {
        "norm1": L.norm_init(dim, dtype),
        "attn1": A.mha_init(k1, dim, heads, dim_head, dtype=dtype),
        "norm2": L.norm_init(dim, dtype),
        "attn2": A.mha_init(k2, dim, heads, dim_head, context_dim=context_dim,
                            dtype=dtype),
        "norm3": L.norm_init(dim, dtype),
        "ff_in": L.linear_init(k3, dim, dim * 8, dtype=dtype),   # GEGLU proj
        "ff_out": L.linear_init(k4, dim * 4, dim, dtype=dtype),
    }


def basic_transformer_block(p, x, context, heads: int):
    h = L.layer_norm(p["norm1"], x)
    x = x + A.mha(p["attn1"], h, heads=heads)
    h = L.layer_norm(p["norm2"], x)
    x = x + A.mha(p["attn2"], h, context=context, heads=heads)
    h = L.layer_norm(p["norm3"], x)
    h = L.linear(p["ff_in"], h)
    val, gate = jnp.split(h, 2, axis=-1)
    h = val * L.gelu(gate)
    return x + L.linear(p["ff_out"], h)


def transformer_2d_init(key, channels: int, heads: int, context_dim: int,
                        depth: int = 1, dtype=jnp.float32):
    keys = jax.random.split(key, depth + 3)
    dim_head = channels // heads
    return {
        "norm": L.norm_init(channels, dtype),
        "proj_in": L.linear_init(keys[0], channels, channels, dtype=dtype),
        "blocks": [
            basic_transformer_block_init(keys[i + 1], channels, heads, dim_head,
                                         context_dim, dtype)
            for i in range(depth)
        ],
        "proj_out": L.linear_init(keys[depth + 1], channels, channels, dtype=dtype),
    }


def transformer_2d(p, x, context, heads: int, groups: int = 32, eps: float = 1e-6):
    """Spatial transformer over an NHWC map with (B, S, Cctx) text context."""
    b, h, w, c = x.shape
    residual = x
    y = L.group_norm(p["norm"], x, groups=groups, eps=eps)
    y = y.reshape(b, h * w, c)
    y = L.linear(p["proj_in"], y)
    for blk in p["blocks"]:
        y = basic_transformer_block(blk, y, context, heads)
    y = L.linear(p["proj_out"], y)
    return residual + y.reshape(b, h, w, c)
