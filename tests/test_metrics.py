import numpy as np
import pytest

from unirestore_tpu.evalx import metrics as M
from unirestore_tpu.evalx.evaluators import (ImageRestorationEvaluator,
                                             center_crop)
from unirestore_tpu.evalx.fid import FID, FIDStats, frechet_distance
from unirestore_tpu.evalx.task_metric import TaskMetric


def test_psnr_known_values():
    a = np.zeros((8, 8, 3))
    b = np.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(M.psnr(a, b), 20.0, atol=1e-6)
    assert M.psnr(a, a) == float("inf")


def test_ssim_identity_and_range():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(32, 32, 3))
    assert M.ssim(x, x) == pytest.approx(1.0)
    y = np.clip(x + rng.normal(scale=0.2, size=x.shape), 0, 1)
    s = M.ssim(y, x)
    assert 0.0 < s < 0.9


def test_ssim_matches_uniform_filter_formula_gray():
    # cross-check with a literal windowed implementation on a small image
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(16, 16))
    y = np.clip(x + rng.normal(scale=0.1, size=x.shape), 0, 1)
    got = M.ssim(y, x)
    # brute force with explicit 7x7 windows over the valid region
    k1, k2, L, w = 0.01, 0.03, 1.0, 7
    c1, c2 = (k1 * L) ** 2, (k2 * L) ** 2
    vals = []
    for i in range(16 - w + 1):
        for j in range(16 - w + 1):
            a = y[i:i + w, j:j + w].ravel()
            b = x[i:i + w, j:j + w].ravel()
            ua, ub = a.mean(), b.mean()
            va = a.var(ddof=1)
            vb = b.var(ddof=1)
            cov = ((a - ua) * (b - ub)).sum() / (a.size - 1)
            vals.append(((2 * ua * ub + c1) * (2 * cov + c2))
                        / ((ua ** 2 + ub ** 2 + c1) * (va + vb + c2)))
    assert got == pytest.approx(np.mean(vals), abs=1e-6)


def test_quantize_preds():
    x = np.array([0.0012, 0.5, 0.9999])
    q = M.quantize_preds(x)
    np.testing.assert_allclose(q * 255, np.round(x * 255))


def test_miou_perfect_and_ignore():
    iou = M.ConfusionIoU(num_classes=3)
    t = np.array([[0, 1, 2, 255]])
    p = np.array([[0, 1, 2, 1]])
    iou.update(p, t)
    assert iou.compute() == pytest.approx(1.0)
    iou.reset()
    iou.update(np.array([[0, 0]]), np.array([[0, 1]]))
    # class0: inter 1, union 2 -> 0.5; class1: 0/1 -> 0; class2 absent
    assert iou.compute() == pytest.approx(0.25)


def test_map_simple():
    m = M.MeanAveragePrecision(iou_thresholds=(0.5,))
    gt = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
          "labels": np.array([1, 1])}
    pred = {"boxes": np.array([[0, 0, 10, 10], [20, 20, 30, 30]]),
            "scores": np.array([0.9, 0.8]), "labels": np.array([1, 1])}
    m.update([pred], [gt])
    assert m.compute() == pytest.approx(1.0)
    m.reset()
    bad = {"boxes": np.array([[50, 50, 60, 60]]),
           "scores": np.array([0.9]), "labels": np.array([1])}
    m.update([bad], [gt])
    assert m.compute() == pytest.approx(0.0)


def test_fid_zero_for_same_distribution():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 8))
    a, b = FIDStats(8), FIDStats(8)
    a.update(feats)
    b.update(feats)
    mu1, c1 = a.finalize()
    mu2, c2 = b.finalize()
    assert frechet_distance(mu1, c1, mu2, c2) == pytest.approx(0.0, abs=1e-6)


def test_fid_real_feature_caching():
    rng = np.random.default_rng(0)
    fid = FID(extractor=lambda x: x.reshape(len(x), -1)[:, :8], dim=8)
    fid.update(rng.normal(size=(16, 8, 1, 1)), real=True)
    fid.update(rng.normal(size=(16, 8, 1, 1)), real=False)
    fid.reset(reset_real_features=False)
    assert fid.real.n == 16 and fid.fake.n == 0
    # real stats are FROZEN after a keep-real reset: the FID objects are
    # shared across validate() epochs while validation_step re-feeds the
    # targets each epoch — duplicates must not accumulate
    fid.update(rng.normal(size=(16, 8, 1, 1)), real=True)
    assert fid.real.n == 16
    fid.update(rng.normal(size=(16, 8, 1, 1)), real=False)
    assert fid.fake.n == 16  # fake path unaffected by the freeze
    fid.reset(reset_real_features=True)
    assert fid.real.n == 0 and not fid.real_frozen


def test_center_crop():
    x = np.zeros((1, 700, 600, 3))
    y = center_crop(x, 512, 512)
    assert y.shape == (1, 512, 512, 3)
    y2 = center_crop(np.zeros((1, 300, 400, 3)), 512, 512)
    assert y2.shape == (1, 300, 400, 3)


def test_ir_evaluator_with_identity_restore():
    ev = ImageRestorationEvaluator(lambda imgs, task: imgs, eval_mode="FR")
    rng = np.random.default_rng(0)
    hq = rng.uniform(size=(2, 64, 64, 3)).astype(np.float32)
    lq = np.clip(hq + rng.normal(scale=0.1, size=hq.shape), 0,
                 1).astype(np.float32)
    ev.validation_step({"hq": hq, "lq": lq})
    out = ev.epoch_end()
    # identity restore: hq branch ~ perfect (up to quantization)
    assert out["val_hq/psnr"] > 45
    assert out["val_lq/psnr"] < 30
    assert out["val_monitor"] == out["val_lq/psnr"]


def test_task_metric_flattening():
    tm = TaskMetric(["hq", "lq"])
    tm.add_metric("psnr", M.MeanMetric)
    tm.metrics["hq"]["psnr"].update(30.0)
    tm.metrics["lq"]["psnr"].update(20.0)
    out = tm.compute_metrics("val")
    assert out == {"val_hq/psnr": 30.0, "val_lq/psnr": 20.0}


def test_metric_merge_equals_single_rank():
    """Rank-merge (torchmetrics dist_reduce sync,
    eval_image_restoration.py:263) must equal single-process accumulation
    for every metric family used by the evaluators."""
    # MeanMetric
    a, b, ref = M.MeanMetric(), M.MeanMetric(), M.MeanMetric()
    for v in (1.0, 2.0):
        a.update(v)
        ref.update(v)
    for v in (5.0, 9.0, 3.0):
        b.update(v)
        ref.update(v)
    a.merge(b)
    assert a.compute() == pytest.approx(ref.compute())

    # ConfusionIoU
    rng = np.random.default_rng(0)
    t1 = rng.integers(0, 3, (2, 8, 8))
    p1 = rng.integers(0, 3, (2, 8, 8))
    t2 = rng.integers(0, 3, (3, 8, 8))
    p2 = rng.integers(0, 3, (3, 8, 8))
    ia, ib, iref = (M.ConfusionIoU(3) for _ in range(3))
    ia.update(p1, t1)
    ib.update(p2, t2)
    iref.update(p1, t1)
    iref.update(p2, t2)
    ia.merge(ib)
    assert ia.compute() == pytest.approx(iref.compute())

    # TopKAccuracy
    logits1 = rng.normal(size=(4, 10))
    labels1 = rng.integers(0, 10, 4)
    logits2 = rng.normal(size=(6, 10))
    labels2 = rng.integers(0, 10, 6)
    ka, kb, kref = (M.TopKAccuracy(1) for _ in range(3))
    ka.update(logits1, labels1)
    kb.update(logits2, labels2)
    kref.update(logits1, labels1)
    kref.update(logits2, labels2)
    ka.merge(kb)
    assert ka.compute() == pytest.approx(kref.compute())

    # MeanAveragePrecision
    def boxes(n):
        xy = rng.uniform(0, 50, (n, 2))
        return np.concatenate([xy, xy + rng.uniform(5, 20, (n, 2))], 1)

    def preds(n):
        return [{"boxes": boxes(n), "scores": rng.uniform(size=n),
                 "labels": rng.integers(0, 2, n)}]

    def tgts(n):
        return [{"boxes": boxes(n), "labels": rng.integers(0, 2, n)}]

    pa = [preds(3)[0], preds(2)[0]]
    ta = [tgts(2)[0], tgts(3)[0]]
    ma, mb, mref = (M.MeanAveragePrecision() for _ in range(3))
    ma.update([pa[0]], [ta[0]])
    mb.update([pa[1]], [ta[1]])
    mref.update(pa, ta)
    ma.merge(mb)
    assert ma.compute() == pytest.approx(mref.compute())


def test_task_metric_merge_metrics():
    tma, tmb = TaskMetric(["lq"]), TaskMetric(["lq"])
    for tm in (tma, tmb):
        tm.add_metric("psnr", M.MeanMetric)
    tma.metrics["lq"]["psnr"].update(30.0)
    tmb.metrics["lq"]["psnr"].update(20.0)
    tma.merge_metrics(tmb)
    assert tma.compute_metrics("val") == {"val_lq/psnr": 25.0}


def test_topk_accuracy_macro_semantics():
    """Reference protocol: torchmetrics MulticlassAccuracy(top_k=1) with
    its DEFAULT average="macro" — mean per-class recall over classes
    present in the targets (eval_classification.py:278)."""
    # class 0: 4/4 correct; class 1: 0/1 correct; classes 2..9 absent
    logits = np.zeros((5, 10))
    logits[:, 0] = 1.0  # argmax always predicts class 0
    labels = np.array([0, 0, 0, 0, 1])

    acc = M.TopKAccuracy(1)
    acc.update(logits, labels)
    assert acc.compute() == pytest.approx(0.5)  # (1.0 + 0.0) / 2
    micro = M.TopKAccuracy(1, average="micro")
    micro.update(logits, labels)
    assert micro.compute() == pytest.approx(0.8)  # 4 / 5
    acc.reset()
    assert acc.compute() == 0.0
