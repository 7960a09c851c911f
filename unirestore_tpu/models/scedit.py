"""SC-Tuner — conditional skip-connection adapters for the UNet denoiser.

SCEdit-style tuners applied to the 12 ``down_block_res_samples`` skip tensors
(reference: scedit.py:24-38, wired at base_model.py:38-43 with channels
[320]x4 + [640]x3 + [1280]x5 and a 256-channel control condition).

``CSCEAdapter``: out = tuner(x + proj(cond)) + proj(cond) + x, with
tuner = 1x1 -> GELU -> 1x1. All convs are pointwise = batched matmuls (MXU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L


def sce_adapter_init(key, c_in: int, c_emb: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "tuner_in": L.conv2d_init(k1, c_in, c_emb, 1, dtype=dtype),
        "tuner_out": L.conv2d_init(k2, c_emb, c_in, 1, dtype=dtype),
    }


def sce_adapter(p, x):
    h = L.conv2d(p["tuner_in"], x, padding=0)
    h = L.conv2d(p["tuner_out"], L.gelu(h), padding=0)
    return h + x


def csce_adapter_init(key, c_in: int, c_emb: int, c_cond: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "proj": L.conv2d_init(k1, c_cond, c_in, 1, dtype=dtype),
        "tuner_in": L.conv2d_init(k2, c_in, c_emb, 1, dtype=dtype),
        "tuner_out": L.conv2d_init(k3, c_emb, c_in, 1, dtype=dtype),
    }


def csce_adapter(p, x, cond):
    proj = L.conv2d(p["proj"], cond, padding=0)
    h = L.conv2d(p["tuner_in"], x + proj, padding=0)
    h = L.conv2d(p["tuner_out"], L.gelu(h), padding=0)
    return h + proj + x


SD_SKIP_CHANNELS = [320] * 4 + [640] * 3 + [1280] * 5


def sc_tuner_init(key, skip_channels=None, c_cond: int = 256, dtype=jnp.float32):
    """One CSCEAdapter per UNet skip tensor (c_emb = c_in, base_model.py:41)."""
    chans = SD_SKIP_CHANNELS if skip_channels is None else list(skip_channels)
    keys = jax.random.split(key, len(chans))
    return [csce_adapter_init(k, c, c, c_cond, dtype=dtype)
            for k, c in zip(keys, chans)]
