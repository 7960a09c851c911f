"""Segmentation probe zoo: eval_mode sets, RefineNet structural parity
(adapt convs, align-corners upsampling), converter coverage."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirestore_tpu.ops.resize import resize_bilinear_ac
from unirestore_tpu.tasks import refinenet as RFN
from unirestore_tpu.tasks import seg_zoo as SZ
from unirestore_tpu.train.checkpoints import tree_flatten_dict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_torchvision as CT  # noqa: E402


def test_eval_mode_sets_match_reference():
    assert SZ.model_types_for("single") == ["dlv3pr50", "rflwr101"]
    assert SZ.model_types_for("all") == [
        "dlv3pr50", "dlv3pr50_ft", "rflwr101", "rflwr101_ft",
        "rflwr101_fifo"]
    assert SZ.model_types_for("bare") == []
    with pytest.raises(ValueError):
        SZ.model_types_for("nope")


def test_resize_bilinear_ac_matches_torch():
    import torch
    import torch.nn.functional as F
    x = np.random.default_rng(0).uniform(size=(1, 5, 7, 3)).astype(
        np.float32)
    ours = np.asarray(resize_bilinear_ac(jnp.asarray(x), (11, 13)))
    theirs = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                           size=(11, 13), mode="bilinear",
                           align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_refinenet_has_adapt_convs_and_runs():
    p = RFN.refinenet_lw_init(jax.random.PRNGKey(0))
    assert set(p["adapt"]) == {"c4", "c3", "c2"}
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    logits = RFN.refinenet_lw_apply(p, x)
    assert logits.shape == (1, 64, 64, 19)
    quarter = RFN.refinenet_lw_apply(p, x, upsample_to_input=False)
    assert quarter.shape == (1, 16, 16, 19)


def test_build_seg_zoo_single():
    zoo = SZ.build_seg_zoo("single", jit=False)
    assert set(zoo) == {"dlv3pr50", "rflwr101"}
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    for fn in zoo.values():
        assert fn(x).shape == (1, 32, 32, 19)


def _fake(rule):
    class D(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return np.zeros(rule(k), np.float32)

    return D()


def test_convert_refinenet_covers_tree():
    tree = RFN.refinenet_lw_init(jax.random.PRNGKey(0))

    def rule(k):
        if k.startswith("fc"):
            return (2, 2) if k.endswith("weight") else (2,)
        if k.endswith(".weight") and (
                "conv" in k or "dimred" in k or "pool" in k
                or "adapt" in k or k.endswith("downsample.0.weight")):
            return (2, 2, 3, 3)
        return (2,)

    out = CT.convert_refinenet(_fake(rule))
    ours = set(tree_flatten_dict(tree).keys())
    theirs = set(out.keys())
    missing = ours - theirs
    extra = [k for k in theirs - ours if "downsample" not in k]
    assert not missing, f"converter misses {sorted(missing)[:10]}"
    assert not extra, f"converter emits unknown {sorted(extra)[:10]}"


# the head wiring under test is backbone-independent; the resnet50 pair
# stays in the fast tier, and the non-resnet backbones (whose feature
# contracts have their own fast tests below) pay their init+apply compile
# only in the slow tier on this 1-vCPU box
@pytest.mark.parametrize("names", [
    ("deeplabv3plus_resnet50", "deeplabv3_resnet50"),
    pytest.param(("deeplabv3plus_mobilenet", "deeplabv3_mobilenet"),
                 marks=pytest.mark.slow),
    pytest.param(("deeplabv3plus_xception", "deeplabv3_xception"),
                 marks=pytest.mark.slow),
    pytest.param(("deeplabv3plus_hrnetv2_32", "deeplabv3_hrnetv2_48"),
                 marks=pytest.mark.slow),
])
def test_deeplab_factory_variants(names):
    """modeling.py factory parity: plus/plain x {resnet50, mobilenet,
    xception, hrnetv2} all produce logits at input resolution."""
    from unirestore_tpu.tasks import deeplab as DLB
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    for name in names:
        init_fn, apply_fn = DLB.deeplab_factory(name)
        p = init_fn(jax.random.PRNGKey(0))
        logits = apply_fn(p, x)
        assert logits.shape == (1, 32, 32, 19), name
    with pytest.raises(ValueError):
        DLB.deeplab_factory("deeplabv3plus_vgg")


def test_mobilenet_xception_feature_contract():
    from unirestore_tpu.tasks import backbones as BB
    x = jnp.ones((1, 64, 64, 3))
    p = BB.mobilenet_v2_init(jax.random.PRNGKey(0))
    f = BB.mobilenet_v2_features(p, x, output_stride=16)
    assert f["low"].shape == (1, 16, 16, 24)
    assert f["high"].shape == (1, 4, 4, 320)
    p = BB.xception_init(jax.random.PRNGKey(0))
    f = BB.xception_features(p, x, output_stride=16)
    assert f["low"].shape == (1, 16, 16, 128)
    assert f["high"].shape == (1, 4, 4, 2048)


def test_hrnetv2_feature_contract():
    from unirestore_tpu.tasks import backbones as BB
    x = jnp.ones((1, 64, 64, 3))
    p = BB.hrnetv2_init(jax.random.PRNGKey(0), width=32)
    f = BB.hrnetv2_features(p, x, width=32)
    assert f["low"].shape == (1, 16, 16, 256)
    assert f["high"].shape == (1, 16, 16, 480)  # 32+64+128+256 at /4
