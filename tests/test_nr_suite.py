"""No-reference IQA suite: forward shapes/ranges, converter key coverage,
suite construction, PI composition, evaluator integration."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirestore_tpu.evalx import clipiqa as CIQ
from unirestore_tpu.evalx import hyperiqa as HIQ
from unirestore_tpu.evalx import maniqa as MAN
from unirestore_tpu.evalx import musiq as MUS
from unirestore_tpu.evalx import nima as NIM
from unirestore_tpu.evalx import nr_suite as NRS
from unirestore_tpu.train.checkpoints import tree_flatten_dict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_iqa as CI  # noqa: E402


def test_clipiqa_score_range():
    p = CIQ.clip_rn50_init(jax.random.PRNGKey(0))
    imgs = jnp.ones((2, 64, 80, 3)) * 0.4
    s = CIQ.clipiqa_score(p, imgs)
    assert s.shape == (2,)
    assert np.all((np.asarray(s) >= 0) & (np.asarray(s) <= 1))


def test_nima_score_distribution():
    p = NIM.inception_resnet_v2_init(jax.random.PRNGKey(0), num_classes=10)
    imgs = jnp.ones((1, 64, 64, 3)) * 0.4
    s = NIM.nima_score(p, imgs, num_classes=10)
    assert s.shape == (1,)
    assert 1.0 <= float(s[0]) <= 10.0


def test_hyperiqa_forward():
    p = HIQ.hyperiqa_init(jax.random.PRNGKey(0))
    imgs = jnp.ones((2, 48, 48, 3)) * 0.4
    s = HIQ.hyperiqa_score(p, imgs)
    assert s.shape == (2,)
    assert np.isfinite(np.asarray(s)).all()


def test_maniqa_forward():
    p = MAN.maniqa_init(jax.random.PRNGKey(0))
    imgs = jnp.ones((1, 48, 48, 3)) * 0.4
    s = MAN.maniqa_score(p, imgs)
    assert s.shape == (1,)
    assert np.isfinite(np.asarray(s)).all()


def test_musiq_forward_and_ava():
    p = MUS.musiq_init(jax.random.PRNGKey(0), num_classes=1)
    imgs = jnp.ones((1, 96, 128, 3)) * 0.4  # non-square exercises ARP
    s = MUS.musiq_score(p, imgs, num_classes=1)
    assert s.shape == (1,)
    p10 = MUS.musiq_init(jax.random.PRNGKey(0), num_classes=10)
    s10 = MUS.musiq_score(p10, imgs, num_classes=10)
    assert 1.0 <= float(s10[0]) <= 10.0


def test_build_nr_suite_neural_only():
    names = ["clipiqa", "hyperiqa"]
    suite = NRS.build_nr_suite(names)
    assert set(suite) == set(names)
    imgs = np.full((1, 48, 48, 3), 0.5, np.float32)
    for m in suite.values():
        m.update(imgs)
        assert np.isfinite(m.compute())
        m.reset()
        assert m.count == 0 if hasattr(m, "count") else True


def test_pi_metric_formula():
    class FakeNiqe:
        def update(self, x):
            pass

        def compute(self):
            return 4.0

        def reset(self):
            pass

    pi = NRS.PIMetric(FakeNiqe(), nrqm_const=6.0)
    # 0.5 * ((10 - 6) + 4) = 4.0
    assert pi.compute() == pytest.approx(4.0)


def test_nr_suite_skips_niqe_without_pristine_model(tmp_path, monkeypatch):
    monkeypatch.setenv("UNIRESTORE_WEIGHTS", str(tmp_path))
    suite = NRS.build_nr_suite(["niqe", "pi"])
    assert suite == {}


def test_evaluator_nr_mode():
    from unirestore_tpu.evalx.evaluators import ImageRestorationEvaluator

    class CheapNR:
        def __init__(self):
            self.v = []

        def update(self, imgs):
            self.v.extend(np.asarray(imgs).mean(axis=(1, 2, 3)).tolist())

        def compute(self):
            return float(np.mean(self.v))

        def reset(self):
            self.v = []

    ev = ImageRestorationEvaluator(
        lambda imgs, task: imgs, eval_mode="NR",
        nr_metrics={"cheap": CheapNR()})
    batch = {"lq": np.full((2, 16, 16, 3), 0.5, np.float32),
             "fname": ["a", "b"]}
    ev.validation_step(batch)
    out = ev.epoch_end()
    assert "val_lq/cheap" in out
    assert out["val_lq/cheap"] == pytest.approx(0.5, abs=1e-2)
    # NR mode computes no PSNR and monitors NIQE (0 when absent)
    assert "val_lq/psnr" not in out


# ---------------------------------------------------------------------------
# converter key coverage
# ---------------------------------------------------------------------------


def _fake(rule):
    class D(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return np.zeros(rule(k), np.float32)

    return D()


def _check(tree, out, optional=(), ignore_ours=()):
    ours = set(tree_flatten_dict(tree).keys())
    ours = {k for k in ours if not any(p in k for p in ignore_ours)}
    theirs = set(out.keys())
    missing = ours - theirs
    extra = [k for k in theirs - ours if not any(p in k for p in optional)]
    assert not missing, f"converter misses {sorted(missing)[:10]}"
    assert not extra, f"converter emits unknown {sorted(extra)[:10]}"


def test_convert_clipiqa_covers_tree():
    tree = CIQ.clip_rn50_init(jax.random.PRNGKey(0))

    def rule(k):
        if k.endswith("downsample.0.weight") or ("conv" in k
                                                 and k.endswith("weight")):
            return (2, 2, 3, 3)
        if "positional_embedding" in k or "text_features" in k:
            return (2, 2)
        if "proj" in k and k.endswith("weight"):
            return (2, 2)
        return (2,)

    out = CI.convert_clipiqa(_fake(rule), text_features=np.zeros((2, 4)))
    # FakeSD claims every downsample exists; real ckpts only at transitions
    _check(tree, out, optional=("down",))


def test_convert_nima_covers_tree():
    tree = NIM.inception_resnet_v2_init(jax.random.PRNGKey(0),
                                        num_classes=1)

    def rule(k):
        if k.endswith("conv.weight") or k.endswith("conv2d.weight"):
            return (2, 2, 3, 3)
        if "classifier.2" in k:
            return (2, 2) if k.endswith("weight") else (2,)
        return (2,)

    _check(tree, CI.convert_nima(_fake(rule)))


def test_convert_hyperiqa_covers_tree():
    tree = HIQ.hyperiqa_init(jax.random.PRNGKey(0))

    def rule(k):
        if "fc" in k and "conv" not in k:
            return (2, 2) if k.endswith("weight") else (2,)
        if k.endswith(".weight") and ("conv" in k or "pool.0" in k
                                      or k.endswith("downsample.0.weight")):
            return (2, 2, 3, 3)
        return (2,)

    out = CI.convert_hyperiqa(_fake(rule))
    _check(tree, out, optional=("downsample",),
           ignore_ours=(f"backbone//fc",))


def test_pi_clone_has_independent_nrqm_state():
    """_clone_metric must deep-ish copy BOTH PIMetric inner metrics: a
    shared NRQM instance would mix the hq/lq streams and be zeroed by
    the first clone's reset (evaluators run one clone per eval_type)."""
    import numpy as np
    from unirestore_tpu.evalx.evaluators import _clone_metric
    from unirestore_tpu.evalx.nrqm import NRQMMetric

    class FakeNiqe:
        def __init__(self):
            self.n = 0

        def update(self, x):
            self.n += 1

        def compute(self):
            return 4.0

        def reset(self):
            self.n = 0

    class FakeModel:
        def score(self, img):
            return 7.0

    nrqm = NRQMMetric.__new__(NRQMMetric)
    nrqm.model, nrqm.total, nrqm.count = FakeModel(), 0.0, 0
    pi = NRS.PIMetric(FakeNiqe(), nrqm)
    clone = _clone_metric(pi)
    pi.update(np.zeros((1, 8, 8, 3)))
    assert pi.nrqm.count == 1 and clone.nrqm.count == 0
    clone.reset()
    assert pi.nrqm.count == 1  # clone reset must not clear the original
    # empty NRQM falls back to the documented 5.0 stand-in, not 0.0
    assert clone.nrqm.compute() == 5.0


def test_committed_nr_artifacts_enable_full_protocol(monkeypatch):
    """A fresh clone computes the complete 10-metric NR protocol with no
    hand steps: the committed weights/niqe_params.npz + nrqm_model.npz
    (tools/fit_nr_artifacts.py) must keep NIQEMetric off its
    FileNotFoundError path and PI off its constant-NRQM fallback."""
    repo_weights = os.path.join(os.path.dirname(__file__), "..", "weights")
    monkeypatch.setenv("UNIRESTORE_WEIGHTS", repo_weights)
    # Presence on disk is not enough: r4 shipped a working tree where
    # nrqm_model.npz existed but was silently .gitignore'd, so fresh clones
    # lost the artifact. Assert the files are actually git-tracked.
    import subprocess
    repo_root = os.path.dirname(repo_weights)
    tracked = subprocess.run(
        ["git", "ls-files", "weights/niqe_params.npz", "weights/nrqm_model.npz"],
        cwd=repo_root, capture_output=True, text=True)
    if tracked.returncode == 0:  # skip the check outside a git checkout
        names = set(tracked.stdout.split())
        assert "weights/niqe_params.npz" in names, "niqe_params.npz not git-tracked"
        assert "weights/nrqm_model.npz" in names, "nrqm_model.npz not git-tracked"
    suite = NRS.build_nr_suite(["niqe", "pi"])
    assert set(suite) == {"niqe", "pi"}
    assert suite["pi"].nrqm is not None, "PI fell back to constant NRQM"

    rng = np.random.default_rng(3)
    sharp = np.clip(rng.uniform(0.2, 0.8, (1, 128, 128, 3))
                    + 0.2 * rng.normal(size=(1, 128, 128, 3)), 0, 1)
    for m in suite.values():
        m.update(sharp.astype(np.float32))
        assert np.isfinite(m.compute())
    # the full default name list stays the reference's 10-metric protocol
    full = ["clipiqa", "musiq", "musiq-ava", "musiq-paq2piq", "musiq-spaq",
            "nima-koniq", "maniqa", "hyperiqa", "pi", "niqe"]
    assert list(NRS.DEFAULT_NR_METRICS) == full
