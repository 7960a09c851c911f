"""Timestep embeddings (sinusoidal projection + MLP).

Matches diffusers ``Timesteps`` / ``TimestepEmbedding`` semantics used by the
reference UNet (base_model.py:104-106) and Controller (controller.py:86-89).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from . import layers as L


def sinusoidal_timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                                  downscale_freq_shift: float = 0.0,
                                  max_period: float = 10000.0):
    """Sinusoidal embedding of integer timesteps -> (B, dim), fp32."""
    t = timesteps.astype(jnp.float32)
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    freqs = jnp.exp(exponent)
    args = t[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def timestep_mlp_init(key, in_dim: int, embed_dim: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "linear_1": L.linear_init(k1, in_dim, embed_dim, dtype=dtype),
        "linear_2": L.linear_init(k2, embed_dim, embed_dim, dtype=dtype),
    }


def timestep_mlp(p, emb):
    """TimestepEmbedding: linear -> silu -> linear."""
    return L.linear(p["linear_2"], L.silu(L.linear(p["linear_1"], emb)))
