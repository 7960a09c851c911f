"""Weight initializers matching PyTorch layer defaults.

Random-init training dynamics should match the reference (which relies on
torch's default kaiming-uniform for convs/linears), so we reproduce those
distributions here. All shapes follow our TPU-native layouts:

- conv weights: HWIO, i.e. ``(kh, kw, cin // groups, cout)``
- linear weights: ``(cin, cout)`` (applied as ``x @ w``)
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def _fan_in_conv(shape: tuple[int, ...]) -> int:
    kh, kw, cin_g, _ = shape
    return kh * kw * cin_g


def kaiming_uniform(key, shape, fan_in: int, a: float = math.sqrt(5.0), dtype=jnp.float32):
    """torch.nn.init.kaiming_uniform_ with leaky-relu gain (torch conv/linear default)."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def conv_kernel(key, kh, kw, cin, cout, groups: int = 1, dtype=jnp.float32):
    shape = (kh, kw, cin // groups, cout)
    return kaiming_uniform(key, shape, _fan_in_conv(shape), dtype=dtype)


def conv_bias(key, shape_or_cout, fan_in: int, dtype=jnp.float32):
    shape = (shape_or_cout,) if isinstance(shape_or_cout, int) else shape_or_cout
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def linear_kernel(key, cin, cout, dtype=jnp.float32):
    return kaiming_uniform(key, (cin, cout), cin, dtype=dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
