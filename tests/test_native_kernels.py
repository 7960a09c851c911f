"""Native C++ corruption kernels (native/corruption_kernels.cpp).

The ctypes fast path replaces the numpy reference implementations for
the three corruption hot spots (fog plasma fractal, glass-blur shuffle,
impulse noise — reference corruptions.py:~300/330/240). The two paths
use different RNG streams, so bit-parity is not expected; these tests
assert the invariants each kernel must share with the numpy fallback,
plus determinism and the env kill-switch.
"""

import os

import numpy as np
import pytest

from unirestore_tpu.data.corruption import native as N
from unirestore_tpu.data.corruption import imagenet_c as C

pytestmark = pytest.mark.skipif(
    not N.available(), reason="native kernels not built (no toolchain)")


def test_plasma_fractal_invariants():
    a = N.plasma_fractal(256, 2.0, seed=7)
    b = N.plasma_fractal(256, 2.0, seed=7)
    c = N.plasma_fractal(256, 2.0, seed=8)
    assert a.shape == (256, 256) and a.dtype == np.float64
    np.testing.assert_array_equal(a, b)  # deterministic per seed
    assert not np.array_equal(a, c)  # seed actually feeds the kernel
    assert np.isfinite(a).all()
    # numpy reference normalizes into [0, 1] with max 1 (heightmap used
    # as fog field); the kernel must match that contract
    assert 0.0 <= a.min() and a.max() <= 1.0 + 1e-9
    assert a.max() > 0.5  # normalized, not degenerate
    # fractal field, not white noise: strong local correlation
    corr = np.corrcoef(a[:-1].ravel(), a[1:].ravel())[0, 1]
    assert corr > 0.9


def test_glass_shuffle_is_a_local_gather():
    """Both the numpy fallback and the kernel implement the shuffle as a
    LOCAL GATHER (each output pixel copies some input pixel within
    max_delta, matching imagenet_c.glass_blur's vectorized `x[yy, xx]`),
    so the invariant is locality, not permutation."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    d = 2
    out = N.glass_shuffle(img.copy(), d, 1, seed=3)
    assert out.shape == img.shape
    assert not np.array_equal(out, img)
    # every output pixel is an input pixel from its (2d+1)^2 neighborhood
    h, w, _ = img.shape
    for y in range(0, h, 7):
        for x in range(0, w, 7):
            y0, y1 = max(0, y - d), min(h, y + d + 1)
            x0, x1 = max(0, x - d), min(w, x + d + 1)
            nb = img[y0:y1, x0:x1].reshape(-1, 3)
            assert (np.abs(nb - out[y, x]).sum(axis=1) < 1e-6).any(), (y, x)
    # deterministic per seed
    out2 = N.glass_shuffle(img.copy(), d, 1, seed=3)
    np.testing.assert_array_equal(out, out2)


def test_impulse_noise_fraction_matches_amount():
    rng = np.random.default_rng(1)
    img = rng.uniform(0.3, 0.7, (128, 128, 3)).astype(np.float32)
    for amount in (0.05, 0.3):
        out = N.impulse_noise(img.copy(), amount, seed=11)
        changed = np.mean(out != img)
        # salt-and-pepper: ~amount of pixels flipped to {0, 1}
        assert abs(changed - amount) < 0.05, (amount, changed)
        flipped = out[out != img]
        assert np.all((flipped == 0.0) | (flipped == 1.0))


def test_highlevel_corruptions_agree_with_numpy_fallback_statistically():
    """fog/glass_blur/impulse_noise through the public corrupt() API with
    the native path ON vs OFF: same output contract (shape/dtype/range)
    and the same corruption strength to loose statistical tolerance."""
    rng = np.random.default_rng(2)
    img = (rng.uniform(0, 1, (224, 224, 3)) * 255).astype(np.uint8)
    for name in ("fog", "glass_blur", "impulse_noise"):
        outs = {}
        for use_native in (True, False):
            C.set_rng(np.random.default_rng(123))
            old = C._USE_NATIVE
            C._USE_NATIVE = use_native and N.available()
            try:
                outs[use_native] = np.asarray(
                    C.corrupt(img, corruption_name=name, severity=3))
            finally:
                C._USE_NATIVE = old
                C.set_rng(None)
        a, b = outs[True].astype(np.float64), outs[False].astype(np.float64)
        assert a.shape == b.shape == img.shape
        # both paths corrupt with comparable strength (MSE vs clean
        # within 2x of each other) and stay in range
        for o in (a, b):
            assert o.min() >= 0 and o.max() <= 255
        ma = np.mean((a - img) ** 2) + 1e-9
        mb = np.mean((b - img) ** 2) + 1e-9
        assert 0.5 < ma / mb < 2.0, (name, ma, mb)
