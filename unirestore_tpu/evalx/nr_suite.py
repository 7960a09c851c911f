"""No-reference IQA metric suite — the reference's NR eval protocol
(eval_image_restoration.py:190-203): clipiqa, musiq, musiq-ava,
musiq-paq2piq, musiq-spaq, nima-koniq, maniqa, hyperiqa, pi, niqe.

Each neural metric is a native JAX model from this package with weights
loaded from the offline converters (``$UNIRESTORE_WEIGHTS/<name>.npz``;
random init + warning when absent — scores then have the right shape and
protocol but arbitrary values). NIQE/PI are host-side numpy (classical
statistics over MSCN coefficients).

PI = 0.5 * ((10 - NRQM) + NIQE) (Blau et al., PIRM 2018). NRQM is the Ma
et al. three-feature-group + regression-forest pipeline (evalx/nrqm.py),
self-calibrated by tools/fit_nrqm.py; when no fitted model exists PI falls
back to the constant NRQM=5 with a warning (NIQE then drives the ranking).
"""

from __future__ import annotations

import warnings

import jax
import numpy as np

from .. import zoo
from . import clipiqa as CIQ
from . import hyperiqa as HIQ
from . import maniqa as MAN
from . import musiq as MUS
from . import nima as NIM

# the reference's full 10-metric NR protocol (eval_image_restoration.py:
# 190-203) — build_nr_suite's default; tests assert against this constant
DEFAULT_NR_METRICS = (
    "clipiqa", "musiq", "musiq-ava", "musiq-paq2piq", "musiq-spaq",
    "nima-koniq", "maniqa", "hyperiqa", "pi", "niqe")

_WARNED = set()


def _warn_once(msg):
    if msg not in _WARNED:
        _WARNED.add(msg)
        warnings.warn(msg)


class NeuralNR:
    """MeanMetric-style wrapper over a jitted batched score fn."""

    def __init__(self, fn):
        self.fn = fn
        self.total, self.count = 0.0, 0

    def update(self, images):
        scores = np.asarray(self.fn(images), np.float64)
        self.total += float(scores.sum())
        self.count += int(scores.shape[0])

    def compute(self):
        return self.total / max(self.count, 1)

    def reset(self):
        self.total, self.count = 0.0, 0


def _musiq_metric(weights_name: str, num_classes: int, seed: int):
    p = MUS.musiq_init(jax.random.PRNGKey(seed), num_classes)
    p, _ = zoo.load_npz_tree(weights_name, p)
    return NeuralNR(jax.jit(
        lambda imgs: MUS.musiq_score(p, imgs, num_classes)))


def _clipiqa_metric(seed: int):
    p = CIQ.clip_rn50_init(jax.random.PRNGKey(seed))
    p, _ = zoo.load_npz_tree("clipiqa_rn50", p)
    return NeuralNR(jax.jit(lambda imgs: CIQ.clipiqa_score(p, imgs)))


def _nima_metric(seed: int):
    # nima-koniq: Inception-ResNet-V2 regressor trained on KonIQ-10k
    p = NIM.inception_resnet_v2_init(jax.random.PRNGKey(seed),
                                     num_classes=1)
    p, _ = zoo.load_npz_tree("nima_koniq", p)
    return NeuralNR(jax.jit(
        lambda imgs: NIM.nima_score(p, imgs, num_classes=1)))


def _maniqa_metric(seed: int):
    p = MAN.maniqa_init(jax.random.PRNGKey(seed))
    p, _ = zoo.load_npz_tree("maniqa", p)
    return NeuralNR(jax.jit(lambda imgs: MAN.maniqa_score(p, imgs)))


def _hyperiqa_metric(seed: int):
    p = HIQ.hyperiqa_init(jax.random.PRNGKey(seed))
    p, _ = zoo.load_npz_tree("hyperiqa", p)
    return NeuralNR(jax.jit(lambda imgs: HIQ.hyperiqa_score(p, imgs)))


class PIMetric:
    """Perceptual Index: 0.5 * ((10 - NRQM) + NIQE).

    ``nrqm_metric`` is the fitted Ma et al. pipeline when available;
    otherwise the constant ``nrqm_const`` stands in (NIQE still ranks)."""

    def __init__(self, niqe_metric, nrqm_metric=None, nrqm_const: float = 5.0):
        self.niqe = niqe_metric
        self.nrqm = nrqm_metric
        self.nrqm_const = nrqm_const

    def update(self, images):
        self.niqe.update(images)
        if self.nrqm is not None:
            self.nrqm.update(images)

    def compute(self):
        nrqm = (self.nrqm.compute() if self.nrqm is not None
                else self.nrqm_const)
        return 0.5 * ((10.0 - nrqm) + self.niqe.compute())

    def reset(self):
        self.niqe.reset()
        if self.nrqm is not None:
            self.nrqm.reset()


def build_nr_suite(names=None, seed: int = 11) -> dict:
    """name -> MeanMetric-style object for the requested NR metrics.

    Default = the reference's full 10-metric NR set. NIQE (and hence PI)
    is skipped with a warning when no pristine model has been fitted.
    """
    names = list(names) if names is not None else list(DEFAULT_NR_METRICS)
    out = {}
    for name in names:
        if name == "clipiqa":
            out[name] = _clipiqa_metric(seed)
        elif name == "musiq":
            out[name] = _musiq_metric("musiq_koniq", 1, seed)
        elif name == "musiq-ava":
            out[name] = _musiq_metric("musiq_ava", 10, seed)
        elif name == "musiq-paq2piq":
            out[name] = _musiq_metric("musiq_paq2piq", 1, seed)
        elif name == "musiq-spaq":
            out[name] = _musiq_metric("musiq_spaq", 1, seed)
        elif name == "nima-koniq":
            out[name] = _nima_metric(seed)
        elif name == "maniqa":
            out[name] = _maniqa_metric(seed)
        elif name == "hyperiqa":
            out[name] = _hyperiqa_metric(seed)
        elif name in ("niqe", "pi"):
            from .niqe import NIQEMetric
            try:
                m = NIQEMetric()
            except FileNotFoundError:
                _warn_once(
                    f"NR metric '{name}' skipped: no NIQE pristine model "
                    "(fit one with tools/fit_niqe.py)")
                continue
            if name == "niqe":
                out[name] = m
            else:
                from .nrqm import NRQMMetric
                try:
                    nrqm = NRQMMetric()
                except FileNotFoundError:
                    nrqm = None
                    _warn_once(
                        "PI uses NRQM=5.0 (constant) — no fitted NRQM "
                        "model (fit one with tools/fit_nrqm.py); NIQE "
                        "drives the ranking signal")
                out[name] = PIMetric(m, nrqm_metric=nrqm)
        else:
            raise ValueError(f"unknown NR metric {name}")
    return out
