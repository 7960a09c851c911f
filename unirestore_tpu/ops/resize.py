"""Image resize ops matching torch.nn.functional.interpolate semantics.

The reference pipeline resizes with bicubic, ``align_corners=False``,
``antialias=False`` (unifie.py:124-129, 166-168). Torch's bicubic kernel uses
the Keys coefficient a = -0.75 with half-pixel centers and edge clamping;
``jax.image.resize`` uses a = -0.5, so we implement the torch kernel directly
as separable 4-tap gathers (static shapes, jit-friendly, NHWC).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _cubic_weights(frac: np.ndarray, a: float = -0.75) -> np.ndarray:
    """4-tap cubic convolution weights for taps at offsets (-1, 0, 1, 2)."""
    # distances from the sample point to each tap
    d = np.stack([frac + 1.0, frac, 1.0 - frac, 2.0 - frac], axis=-1)

    def k(x):
        x = np.abs(x)
        w = np.where(
            x <= 1.0,
            (a + 2.0) * x ** 3 - (a + 3.0) * x ** 2 + 1.0,
            np.where(x < 2.0, a * x ** 3 - 5.0 * a * x ** 2 + 8.0 * a * x - 4.0 * a,
                     0.0),
        )
        return w

    return k(d)


def _resize_axis(x, out_size: int, axis: int, kind: str,
                 align_corners: bool = False):
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if align_corners:
        scale = (in_size - 1) / max(out_size - 1, 1)
        pos = np.arange(out_size, dtype=np.float64) * scale
    else:
        scale = in_size / out_size
        pos = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(pos).astype(np.int64)
    frac = pos - base

    if kind == "cubic":
        offsets = np.array([-1, 0, 1, 2])
        weights = _cubic_weights(frac)  # (out, 4)
    elif kind == "linear":
        offsets = np.array([0, 1])
        weights = np.stack([1.0 - frac, frac], axis=-1)
    else:
        raise ValueError(kind)

    idx = np.clip(base[:, None] + offsets[None, :], 0, in_size - 1)  # (out, taps)
    w = jnp.asarray(weights.astype(np.float32))

    taken = jnp.take(x, jnp.asarray(idx.reshape(-1)), axis=axis)
    new_shape = list(x.shape)
    new_shape[axis:axis + 1] = [out_size, idx.shape[1]]
    taken = taken.reshape(new_shape)
    # contract the taps axis (axis+1) against weights
    w_shape = [1] * taken.ndim
    w_shape[axis], w_shape[axis + 1] = out_size, idx.shape[1]
    out = (taken.astype(jnp.float32) * w.reshape(w_shape)).sum(axis=axis + 1)
    return out.astype(x.dtype)


def resize_bicubic(x, size: tuple[int, int]):
    """Bicubic NHWC resize = torch interpolate(mode="bicubic",
    align_corners=False, antialias=False). Output is NOT range-clamped
    (torch's bicubic may overshoot, and the reference relies on later
    clamping at the metric stage)."""
    oh, ow = size
    x = _resize_axis(x, oh, axis=1, kind="cubic")
    x = _resize_axis(x, ow, axis=2, kind="cubic")
    return x


def resize_bilinear(x, size: tuple[int, int]):
    """Bilinear NHWC resize = torch interpolate(mode="bilinear",
    align_corners=False)."""
    oh, ow = size
    x = _resize_axis(x, oh, axis=1, kind="linear")
    x = _resize_axis(x, ow, axis=2, kind="linear")
    return x


def resize_bilinear_ac(x, size: tuple[int, int]):
    """Bilinear NHWC resize = torch interpolate(mode="bilinear",
    align_corners=True) — the RefineNet-LW top-down upsampling convention
    (refinenetlw.py:248, 256, 264)."""
    oh, ow = size
    x = _resize_axis(x, oh, axis=1, kind="linear", align_corners=True)
    x = _resize_axis(x, ow, axis=2, kind="linear", align_corners=True)
    return x


def reflect_pad_hw(x, pad_h: int, pad_w: int):
    """Reflect-pad bottom/right (reference pads (0, pad_w, 0, pad_h),
    unifie.py:130-134)."""
    if pad_h == 0 and pad_w == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)), mode="reflect")
