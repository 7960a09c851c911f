"""Core functional layers over explicit parameter pytrees (NHWC).

Every layer is a pair of functions: ``<name>_init(key, ...) -> params`` and
``<name>(params, x, ...) -> y``. All tensors are NHWC (TPU conv-native) and
all functions are jit/vmap/grad-friendly pure functions.

Numerical conventions match the torch ops used by the reference
(`/root/reference/src/modules/diffuie/*`): exact (erf) GELU, eps defaults, and
GroupNorm/LayerNorm/InstanceNorm semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from . import init as winit

# ---------------------------------------------------------------------------
# activations
# ---------------------------------------------------------------------------


def silu(x):
    return jax.nn.silu(x)


def gelu(x):
    # torch.nn.GELU() default is the exact erf formulation.
    return jax.nn.gelu(x, approximate=False)


def simple_gate(x):
    """NAFNet SimpleGate: split channels in half, multiply.

    Reference: nafnet_arch.py:22-25 (channel dim); here NHWC so the last axis.
    """
    x1, x2 = jnp.split(x, 2, axis=-1)
    return x1 * x2


# ---------------------------------------------------------------------------
# conv2d
# ---------------------------------------------------------------------------


def conv2d_init(key, cin, cout, kernel_size=3, groups: int = 1, bias: bool = True,
                dtype=jnp.float32):
    kh = kw = kernel_size if isinstance(kernel_size, int) else None
    if kh is None:
        kh, kw = kernel_size
    kw_, kb = jax.random.split(key)
    p = {"w": winit.conv_kernel(kw_, kh, kw, cin, cout, groups, dtype)}
    if bias:
        p["b"] = winit.conv_bias(kb, cout, kh * kw * (cin // groups), dtype)
    return p


def conv2d(p, x, stride: int | tuple = 1, padding="SAME", groups: int = 1,
           dilation: int = 1):
    """2D convolution, NHWC x HWIO -> NHWC.

    ``padding`` may be "SAME", "VALID", an int (symmetric), or explicit
    ``((top, bottom), (left, right))``.
    """
    w = p["w"].astype(x.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=padding,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------


def linear_init(key, cin, cout, bias: bool = True, dtype=jnp.float32):
    kw_, kb = jax.random.split(key)
    p = {"w": winit.linear_kernel(kw_, cin, cout, dtype)}
    if bias:
        p["b"] = winit.conv_bias(kb, cout, cin, dtype)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def norm_init(c, dtype=jnp.float32):
    return {"scale": jnp.ones((c,), dtype), "bias": jnp.zeros((c,), dtype)}


def group_norm(p, x, groups: int = 32, eps: float = 1e-5):
    """GroupNorm over NHWC: stats over (H, W, C//G) per group.

    Statistics accumulate in fp32 via reduction dtype (no materialized fp32
    copy of the activation — halves HBM traffic in bf16); the normalization
    itself folds into a per-(batch, channel) scale/shift applied in the
    input dtype so XLA fuses it with neighbors.
    """
    b, h, w, c = x.shape
    sdt = jnp.promote_types(jnp.float32, x.dtype)  # >=fp32 statistics
    xg = x.reshape(b, h, w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 2, 4), dtype=sdt)  # (b, g)
    mean2 = jnp.mean(lax.square(xg.astype(sdt)), axis=(1, 2, 4))
    var = mean2 - lax.square(mean)
    inv = lax.rsqrt(var + eps)  # (b, g)
    # fold norm + affine into per-(b, c) scale/shift
    inv_c = jnp.repeat(inv, c // groups, axis=1)  # (b, c)
    mean_c = jnp.repeat(mean, c // groups, axis=1)
    scale = inv_c
    shift = -mean_c * inv_c
    if p is not None:
        g = p["scale"].astype(sdt)
        bta = p["bias"].astype(sdt)
        scale = scale * g
        shift = shift * g + bta
    scale = scale[:, None, None, :].astype(x.dtype)
    shift = shift[:, None, None, :].astype(x.dtype)
    return x * scale + shift


def layer_norm(p, x, eps: float = 1e-5):
    """LayerNorm over the last axis (torch nn.LayerNorm / timm LayerNorm2d
    in NHWC). fp32 accumulation without a materialized fp32 copy."""
    sdt = jnp.promote_types(jnp.float32, x.dtype)  # >=fp32 statistics
    mean = jnp.mean(x, axis=-1, keepdims=True, dtype=sdt)
    mean2 = jnp.mean(lax.square(x.astype(sdt)), axis=-1, keepdims=True)
    inv = lax.rsqrt(mean2 - lax.square(mean) + eps)
    scale = inv.astype(x.dtype)
    shift = (-mean * inv).astype(x.dtype)
    y = x * scale + shift
    if p is not None:
        y = y * p["scale"].astype(x.dtype) + p["bias"].astype(x.dtype)
    return y


def instance_norm(x, eps: float = 1e-5):
    """torch nn.InstanceNorm2d default: per-(sample, channel) over spatial, no affine.

    Reference: taskeditor.py:31 (InstanceNorm2d inside TFA gates).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.promote_types(jnp.float32, x.dtype))
    mean = xf.mean(axis=(1, 2), keepdims=True)
    var = xf.var(axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(orig_dtype)


# ---------------------------------------------------------------------------
# pooling / resize primitives
# ---------------------------------------------------------------------------


def global_avg_pool(x, keepdims: bool = True):
    """AdaptiveAvgPool2d(1) over NHWC."""
    return x.mean(axis=(1, 2), keepdims=keepdims)


def upsample_nearest_2x(x):
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def resize_nearest(x, size: tuple[int, int]):
    """Nearest-neighbor resize matching torch F.interpolate(mode='nearest')."""
    b, h, w, c = x.shape
    oh, ow = size
    rows = jnp.floor(jnp.arange(oh) * (h / oh)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(ow) * (w / ow)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def pixel_shuffle(x, factor: int = 2):
    """torch nn.PixelShuffle for NHWC: (B,H,W,C*r^2) -> (B,H*r,W*r,C).

    Channel ordering matches torch NCHW semantics (c-major, then r1, r2).
    """
    b, h, w, crr = x.shape
    r = factor
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(b, h * r, w * r, c)
