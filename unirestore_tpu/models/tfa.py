"""TFA — Task Feature Adapters with learned per-task prompt vectors.

Spliced before the first three VAE-decoder up blocks; fuses encoder skip
features into the decode differently per downstream task, threading a prompt
condition 512 -> 256 -> 128 across levels (reference: taskeditor.py:10-108,
wired at autoencoder.py:117-126; prompts are zero-init (prompt_len, 512)).

Per level: three InstanceNorm->3x3->GELU->3x3->GAP towers over the skip
produce filter/info gates (softmax) and a content code (tanh); the prompt is
updated as ``cond' = f * cond + i * content``; an out-gate (linear+tanh)
modulates a 1x1-bottlenecked skip; fusion is ``x + conv_out(cat(x, skip'))``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L


def _tower_init(key, c_skip: int, hidden: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "conv1": L.conv2d_init(k1, c_skip, c_skip, 3, dtype=dtype),
        "conv2": L.conv2d_init(k2, c_skip, hidden, 3, dtype=dtype),
    }


def _tower(p, skip):
    h = L.instance_norm(skip)
    h = L.gelu(L.conv2d(p["conv1"], h, padding=1))
    h = L.conv2d(p["conv2"], h, padding=1)
    return L.global_avg_pool(h, keepdims=False)  # (B, hidden)


def task_feature_adapter_init(key, c_out: int = 512, c_skip: int = 256,
                              prompt_len: int = 1, last_layer: bool = False,
                              dtype=jnp.float32):
    c_emb = c_skip
    hidden = c_emb * prompt_len
    keys = jax.random.split(key, 8)
    p = {
        "t_gate1": L.conv2d_init(keys[0], c_skip, c_emb, 1, dtype=dtype),
        "t_gate2": L.conv2d_init(keys[1], c_emb, c_skip, 1, dtype=dtype),
        "conv_out": L.conv2d_init(keys[2], c_skip + c_out, c_out, 1, dtype=dtype),
        "filter_gate": _tower_init(keys[3], c_skip, hidden, dtype),
        "info_gate": _tower_init(keys[4], c_skip, hidden, dtype),
        "content_trans": _tower_init(keys[5], c_skip, hidden, dtype),
        "out_gate": L.linear_init(keys[6], hidden, c_emb, dtype=dtype),
    }
    if not last_layer:
        p["prompt_trans"] = L.linear_init(keys[7], c_emb, c_emb // 2, dtype=dtype)
    return p


def task_feature_adapter(p, x, skip, cond, prompt_len: int = 1):
    """Args: x (B,h,w,c_out), skip (B,h,w,c_skip), cond (B,T,D=c_skip).

    Returns (fused x, next condition or None)."""
    b = skip.shape[0]
    d = skip.shape[-1]

    f = jax.nn.softmax(_tower(p["filter_gate"], skip).reshape(b, prompt_len, d),
                       axis=-1)
    i = jax.nn.softmax(_tower(p["info_gate"], skip).reshape(b, prompt_len, d),
                       axis=-1)
    c = jnp.tanh(_tower(p["content_trans"], skip)).reshape(b, prompt_len, d)

    update_cond = f * cond + i * c                       # (B, T, D)
    o = jnp.tanh(L.linear(p["out_gate"], update_cond.reshape(b, prompt_len * d)))

    hidden = L.conv2d(p["t_gate1"], skip, padding=0)
    hidden = hidden * o[:, None, None, :]
    hidden = L.conv2d(p["t_gate2"], hidden, padding=0)
    skip = skip + hidden

    x = x + L.conv2d(p["conv_out"], jnp.concatenate([x, skip], axis=-1), padding=0)

    next_cond = None
    if "prompt_trans" in p:
        next_cond = L.gelu(L.linear(p["prompt_trans"], update_cond))
    return x, next_cond


def tfa_init(key, c_out: int = 512, skip_channels=(512, 256, 128),
             prompt_len: int = 1, dtype=jnp.float32):
    """The three decoder-level editors (autoencoder.py:122-126)."""
    keys = jax.random.split(key, len(skip_channels))
    return [
        task_feature_adapter_init(k, c_out, cs, prompt_len,
                                  last_layer=(i == len(skip_channels) - 1),
                                  dtype=dtype)
        for i, (k, cs) in enumerate(zip(keys, skip_channels))
    ]


def task_prompts_init(tasks, prompt_len: int = 1, dim: int = 512,
                      dtype=jnp.float32):
    """Zero-init per-task prompts (autoencoder.py:117-120)."""
    return {t: jnp.zeros((prompt_len, dim), dtype) for t in tasks}
