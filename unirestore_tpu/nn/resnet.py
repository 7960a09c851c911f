"""Stable-Diffusion ResNet blocks and up/down samplers (NHWC).

Functional port of the diffusers ``ResnetBlock2D`` / ``Downsample2D`` /
``Upsample2D`` behavior the reference backbone depends on
(base_model.py:56-92 documents the exact SD2.1 resnet data path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


def resnet_block_init(key, cin: int, cout: int, temb_dim: int | None = None,
                      dtype=jnp.float32):
    keys = jax.random.split(key, 4)
    p = {
        "norm1": L.norm_init(cin, dtype),
        "conv1": L.conv2d_init(keys[0], cin, cout, 3, dtype=dtype),
        "norm2": L.norm_init(cout, dtype),
        "conv2": L.conv2d_init(keys[1], cout, cout, 3, dtype=dtype),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = L.linear_init(keys[2], temb_dim, cout, dtype=dtype)
    if cin != cout:
        p["conv_shortcut"] = L.conv2d_init(keys[3], cin, cout, 1, dtype=dtype)
    return p


def resnet_block(p, x, temb=None, groups: int = 32, eps: float = 1e-5):
    """norm1 -> silu -> conv1 -> (+temb) -> norm2 -> silu -> conv2 -> +shortcut."""
    h = L.group_norm(p["norm1"], x, groups=groups, eps=eps)
    h = L.silu(h)
    h = L.conv2d(p["conv1"], h, padding=1)
    if temb is not None and "time_emb_proj" in p:
        t = L.linear(p["time_emb_proj"], L.silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
    h = L.group_norm(p["norm2"], h, groups=groups, eps=eps)
    h = L.silu(h)
    h = L.conv2d(p["conv2"], h, padding=1)
    if "conv_shortcut" in p:
        x = L.conv2d(p["conv_shortcut"], x, padding=0)
    return x + h


def downsample_init(key, channels: int, dtype=jnp.float32):
    return {"conv": L.conv2d_init(key, channels, channels, 3, dtype=dtype)}


def downsample(p, x, pad_mode: str = "sym"):
    """Stride-2 3x3 conv. ``pad_mode``: "sym" (UNet, padding=1) or
    "asym" (VAE encoder, zero-pad (0,1,0,1) then VALID conv)."""
    if pad_mode == "asym":
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return L.conv2d(p["conv"], x, stride=2, padding="VALID")
    return L.conv2d(p["conv"], x, stride=2, padding=1)


def upsample_init(key, channels: int, dtype=jnp.float32):
    return {"conv": L.conv2d_init(key, channels, channels, 3, dtype=dtype)}


def upsample(p, x):
    """Nearest 2x then 3x3 conv (diffusers Upsample2D with use_conv)."""
    return L.conv2d(p["conv"], L.upsample_nearest_2x(x), padding=1)
