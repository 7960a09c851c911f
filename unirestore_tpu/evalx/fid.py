"""FID — Frechet distance over deep features, with real-feature caching.

The reference uses torchmetrics FrechetInceptionDistance with
``reset_real_features`` control so real statistics persist across epochs
(eval_image_restoration.py:186-187, 243-253). This module implements the
statistics accumulation + Frechet distance with a pluggable feature
extractor; the InceptionV3-pool3 extractor port is loaded when converted
weights are available (tools/convert_torchvision.py), with a documented
fallback extractor otherwise.
"""

from __future__ import annotations

import numpy as np


class FIDStats:
    """Streaming mean/covariance accumulator over feature vectors."""

    def __init__(self, dim: int):
        self.dim = dim
        self.reset()

    def reset(self):
        self.n = 0
        self.sum = np.zeros(self.dim, np.float64)
        self.outer = np.zeros((self.dim, self.dim), np.float64)

    def update(self, feats: np.ndarray):
        f = np.asarray(feats, np.float64)
        self.n += f.shape[0]
        self.sum += f.sum(axis=0)
        self.outer += f.T @ f

    def finalize(self):
        mu = self.sum / max(self.n, 1)
        cov = (self.outer - self.n * np.outer(mu, mu)) / max(self.n - 1, 1)
        return mu, cov


def frechet_distance(mu1, cov1, mu2, cov2, eps: float = 1e-6):
    """||mu1-mu2||^2 + Tr(c1 + c2 - 2 sqrt(c1 c2))."""
    from scipy import linalg

    diff = mu1 - mu2
    covmean, _ = linalg.sqrtm(cov1 @ cov2, disp=False)
    if not np.isfinite(covmean).all():
        offset = np.eye(cov1.shape[0]) * eps
        covmean = linalg.sqrtm((cov1 + offset) @ (cov2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(cov1) + np.trace(cov2)
                 - 2.0 * np.trace(covmean))


class FID:
    """reset_real_features-aware FID metric (torchmetrics semantics)."""

    def __init__(self, extractor, dim: int):
        """``extractor(images_nhwc_float01) -> (B, dim) numpy features``."""
        self.extractor = extractor
        self.real = FIDStats(dim)
        self.fake = FIDStats(dim)
        # After the first epoch's reset(reset_real_features=False), real
        # stats are FROZEN: the FID objects are shared across validate()
        # epochs (config._eval_cache) while validation_step feeds targets
        # every epoch — without the freeze, each epoch re-adds a duplicate
        # copy of the val set's real features (n grows k-fold, covariance
        # rescales, FID drifts on an unchanged model). The reference gates
        # this with _update_fid_real (eval_image_restoration.py:235-253).
        self.real_frozen = False

    def update(self, images, real: bool):
        if real and self.real_frozen:
            return  # also skips the wasted Inception forward
        feats = np.asarray(self.extractor(images))
        (self.real if real else self.fake).update(feats)

    def compute(self):
        mu_r, cov_r = self.real.finalize()
        mu_f, cov_f = self.fake.finalize()
        return frechet_distance(mu_r, cov_r, mu_f, cov_f)

    def reset(self, reset_real_features: bool = True):
        self.fake.reset()
        if reset_real_features:
            self.real.reset()
            self.real_frozen = False
        else:
            self.real_frozen = True
