"""NRQM (Ma et al. structure): feature pipeline, self-calibrated fit,
ranking behavior, persistence, and PI composition with a real NRQM."""

import os
import sys

import numpy as np
import pytest

from unirestore_tpu.evalx import nrqm as NQ

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


def _textured(rng, hw=(96, 96)):
    """Clean-ish test image: smooth base + edges + fine texture."""
    h, w = hw
    yy, xx = np.mgrid[0:h, 0:w] / max(h, w)
    img = 0.4 + 0.3 * np.sin(7 * xx) * np.cos(5 * yy)
    img += 0.25 * ((xx * 9).astype(int) % 2)  # hard edges
    img += 0.05 * rng.standard_normal((h, w))
    img = np.clip(img, 0, 1)
    return np.stack([img, img * 0.9, img * 0.8], axis=-1)


def _blur(img, k=9):
    import cv2
    return cv2.GaussianBlur(img.astype(np.float32), (k, k), 3.0)


def test_feature_groups_shapes_and_finiteness():
    rng = np.random.default_rng(0)
    img = _textured(rng)
    f_dct, f_pyr, f_pca = NQ.nrqm_features(img)
    assert f_dct.shape == (8,) and f_pyr.shape == (32,) \
        and f_pca.shape == (11,)
    for f in (f_dct, f_pyr, f_pca):
        assert np.isfinite(f).all()
    # blur moves the features (sanity that they respond to degradation)
    b_dct, b_pyr, b_pca = NQ.nrqm_features(_blur(img))
    assert not np.allclose(f_dct, b_dct)
    assert not np.allclose(f_pyr, b_pyr)


def test_fit_rank_and_roundtrip(tmp_path):
    pytest.importorskip("sklearn")
    from fit_nrqm import build_calibration_set

    rng = np.random.default_rng(1)
    clean = [_textured(rng) for _ in range(3)]
    images, labels = build_calibration_set(clean, seed=0)
    assert labels.count(10.0) == 3 and min(labels) == 1.0
    model = NQ.fit_nrqm(images, labels, n_estimators=20)

    # held-out: clean must outrank a heavy blur+noise degradation
    test = _textured(np.random.default_rng(2))
    bad = np.clip(_blur(test, 13)
                  + 0.15 * np.random.default_rng(3).standard_normal(
                      test.shape), 0, 1)
    s_clean, s_bad = model.score(test), model.score(bad)
    assert s_clean > s_bad, (s_clean, s_bad)
    assert 0.0 <= s_bad <= s_clean <= 10.0

    # persistence + metric wrapper
    path = tmp_path / "nrqm_model.npz"
    model.save(str(path))
    m = NQ.NRQMMetric(str(path))
    m.update(test[None])
    assert m.compute() == pytest.approx(s_clean, abs=1e-9)
    m.reset()
    assert m.count == 0


def test_pi_uses_fitted_nrqm(tmp_path):
    """PI = 0.5*((10-NRQM)+NIQE) with the REAL fitted NRQM when a model
    exists (eval_image_restoration.py:190-203)."""
    from unirestore_tpu.evalx.nr_suite import PIMetric

    class FakeNiqe:
        def update(self, x):
            pass

        def compute(self):
            return 4.0

        def reset(self):
            pass

    class FakeNrqm:
        def __init__(self):
            self.n = 0

        def update(self, x):
            self.n += len(x)

        def compute(self):
            return 7.0

        def reset(self):
            self.n = 0

    nrqm = FakeNrqm()
    pi = PIMetric(FakeNiqe(), nrqm_metric=nrqm)
    pi.update(np.zeros((2, 8, 8, 3)))
    assert nrqm.n == 2  # PI drives NRQM updates
    # 0.5 * ((10 - 7) + 4) = 3.5
    assert pi.compute() == pytest.approx(3.5)
    pi.reset()
    assert nrqm.n == 0
