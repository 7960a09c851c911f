"""Classification probe zoo: forward shapes, converter key coverage, and
eval_mode set parity with the reference (eval_classification.py:36-48)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirestore_tpu.tasks import classifier_zoo as CZ
from unirestore_tpu.tasks import convnext as CNX
from unirestore_tpu.tasks import efficientnet as EFF
from unirestore_tpu.tasks import resnet as RN
from unirestore_tpu.tasks import swin as SW
from unirestore_tpu.tasks import vgg as VGG
from unirestore_tpu.tasks import vit as VIT
from unirestore_tpu.train.checkpoints import tree_flatten_dict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_classifiers as CC  # noqa: E402


def test_eval_mode_sets_match_reference():
    assert CZ.model_types_for("all") == ["r50v1", "r101v1", "vgg", "swin",
                                         "vit", "rvt"]
    assert CZ.model_types_for("all_ft") == ["r50v1_ft", "r50v2_ft", "vgg_ft",
                                            "swin_ft", "vit_ft", "rvt"]
    assert CZ.model_types_for("single") == ["r50v1", "r50v2"]
    assert CZ.model_types_for("CUB") == ["cub_r18", "cub_r50", "cub_conv",
                                         "cub_vitb", "cub_swin"]
    assert CZ.model_types_for("bare") == []
    with pytest.raises(ValueError):
        CZ.model_types_for("nope")


def test_resnet18_basic_block_forward():
    p = RN.resnet_init(jax.random.PRNGKey(0), "resnet18", num_classes=200)
    x = jnp.zeros((1, 64, 64, 3))
    logits = RN.resnet_apply(p, x, preprocess_input=False)
    assert logits.shape == (1, 200)


def test_vgg16_forward():
    p = VGG.vgg16_init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 32, 32, 3)) * 0.5
    logits = VGG.vgg16_apply(p, x)  # preprocess resizes to 224
    assert logits.shape == (1, 1000)
    assert np.isfinite(np.asarray(logits)).all()


def test_vit_b16_forward():
    p = VIT.vit_b16_init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 64, 64, 3)) * 0.5
    logits = VIT.vit_b16_apply(p, x)
    assert logits.shape == (2, 1000)


def test_convnext_forward():
    p = CNX.convnext_base_init(jax.random.PRNGKey(0), num_classes=200)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    logits = CNX.convnext_base_apply(p, x, preprocess_input=False)
    assert logits.shape == (1, 200)


def test_swin_v2_forward():
    p = SW.swin_base_init(jax.random.PRNGKey(0), v2=True)
    # 64px without preprocess exercises padding (16 -> 8 -> 4 < window)
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    logits = SW.swin_base_apply(p, x, preprocess_input=False, v2=True)
    assert logits.shape == (1, 1000)


def test_swin_v1_forward():
    p = SW.swin_base_init(jax.random.PRNGKey(0), num_classes=200, v2=False)
    x = jnp.ones((1, 56, 56, 3)) * 0.5
    logits = SW.swin_base_apply(p, x, preprocess_input=False, v2=False)
    assert logits.shape == (1, 200)


def test_efficientnet_v2_l_forward():
    p = EFF.efficientnet_v2_l_init(jax.random.PRNGKey(0))
    x = jnp.ones((1, 64, 64, 3)) * 0.5
    logits = EFF.efficientnet_v2_l_apply(p, x, preprocess_input=False)
    assert logits.shape == (1, 1000)


def test_swin_shift_mask_and_rel_index():
    idx = SW._relative_position_index(7)
    assert idx.shape == (49, 49)
    assert idx.max() == (2 * 7 - 1) ** 2 - 1 and idx.min() == 0
    # mask: zero for unshifted interior window, -100 across region borders
    mask = SW._shift_mask(16, 16, 8, 4)
    assert mask.shape == (4, 64, 64)
    assert (mask[0] == 0).all()  # top-left window is one contiguous region


def test_build_classifier_zoo_single():
    zoo = CZ.build_classifier_zoo("single", jit=False)
    assert set(zoo) == {"r50v1", "r50v2"}
    x = jnp.ones((1, 48, 48, 3)) * 0.5
    for fn in zoo.values():
        assert fn(x).shape == (1, 1000)


# ---------------------------------------------------------------------------
# converter key coverage (FakeSD pattern from test_converters.py)
# ---------------------------------------------------------------------------


def _fake(rule):
    class D(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return np.zeros(rule(k), np.float32)

    return D()


def _check(tree, out, optional=()):
    ours = set(tree_flatten_dict(tree).keys())
    theirs = set(out.keys())
    missing = ours - theirs
    extra = [k for k in theirs - ours if not any(p in k for p in optional)]
    assert not missing, f"converter misses {sorted(missing)[:10]}"
    assert not extra, f"converter emits unknown {sorted(extra)[:10]}"


def test_convert_vgg16_covers_tree():
    tree = VGG.vgg16_init(jax.random.PRNGKey(0))
    out = CC.convert_vgg16(_fake(
        lambda k: (2, 2) if k.startswith("classifier") else (2, 2, 3, 3)))
    _check(tree, out)


def test_convert_vit_covers_tree():
    tree = VIT.vit_b16_init(jax.random.PRNGKey(0))

    def rule(k):
        if "conv_proj" in k:
            return (2, 2, 3, 3) if k.endswith("weight") else (2,)
        if k in ("class_token", "encoder.pos_embedding"):
            return (1, 1, 2)
        if "ln" in k or k.endswith("bias"):
            return (2,)
        return (2, 2)

    _check(tree, CC.convert_vit_b16(_fake(rule)))


def test_convert_vit_timm_covers_tree():
    tree = VIT.vit_b16_init(jax.random.PRNGKey(0), num_classes=200)

    def rule(k):
        if k.startswith("patch_embed.proj"):
            return (2, 2, 3, 3) if k.endswith("weight") else (2,)
        if k in ("cls_token", "pos_embed"):
            return (1, 1, 2)
        if "norm" in k or k.endswith("bias"):
            return (2,)
        return (2, 2)

    _check(tree, CC.convert_vit_b16(_fake(rule), timm=True))


def test_convert_swin_v2_covers_tree():
    tree = SW.swin_base_init(jax.random.PRNGKey(0), v2=True)

    def rule(k):
        if k == "features.0.0.weight":
            return (2, 2, 3, 3)
        if "logit_scale" in k:
            return (2, 1, 1)
        if k.startswith("features.0.2") or "norm" in k or k.endswith("bias"):
            return (2,)
        return (2, 2)

    _check(tree, CC.convert_swin_v2_b(_fake(rule)))


def test_convert_swin_v1_timm_covers_tree():
    tree = SW.swin_base_init(jax.random.PRNGKey(0), num_classes=200, v2=False)

    def rule(k):
        if k == "patch_embed.proj.weight":
            return (2, 2, 3, 3)
        if "norm" in k or k.endswith("bias"):
            return (2,)
        return (2, 2)

    _check(tree, CC.convert_swin_b_v1_timm(_fake(rule)))


def test_convert_convnext_covers_tree():
    tree = CNX.convnext_base_init(jax.random.PRNGKey(0), num_classes=200)

    def rule(k):
        if k.startswith("stem.0") or "downsample.1" in k or "conv_dw" in k:
            return (2, 2, 3, 3) if k.endswith("weight") else (2,)
        if "norm" in k or "downsample.0" in k or k.endswith("bias") \
                or k.endswith("gamma"):
            return (2,)
        return (2, 2)

    _check(tree, CC.convert_convnext_base(_fake(rule)))


def test_convert_efficientnet_covers_tree():
    tree = EFF.efficientnet_v2_l_init(jax.random.PRNGKey(0))

    def rule(k):
        if k.startswith("classifier"):
            return (2, 2) if k.endswith("weight") else (2,)
        if ("fc1" in k or "fc2" in k) and k.endswith("weight"):
            return (2, 2, 3, 3)
        if k.endswith(".0.weight"):
            return (2, 2, 3, 3)
        return (2,)

    _check(tree, CC.convert_efficientnet_v2_l(_fake(rule)))


def test_convert_rvt_covers_tree():
    from unirestore_tpu.tasks import rvt as RVT
    tree = RVT.rvt_base_plus_init(jax.random.PRNGKey(0))

    def rule(k):
        if k.startswith(("patch_embed.proj.0", "patch_embed.proj.3")):
            return (2, 2, 3, 3) if k.endswith("weight") else (2,)
        if "att_mask" in k:
            return (2, 3, 3)
        if k.endswith("bias") or "norm" in k or "proj.1" in k:
            return (2,)
        return (2, 2)

    # FakeSD claims att_mask exists on every block; the real ckpt has it on
    # the first 5 masked blocks only
    _check(tree, CC.convert_rvt_base_plus(_fake(rule)),
           optional=("att_mask",))


def test_convert_resnet18_covers_tree():
    tree = RN.resnet_init(jax.random.PRNGKey(0), "resnet18")
    import convert_torchvision as CT

    def rule(k):
        if k.startswith("fc"):
            return (2, 2) if k.endswith("weight") else (2,)
        if k.endswith(".weight") and ("conv" in k
                                      or k.endswith("downsample.0.weight")):
            return (2, 2, 3, 3)
        return (2,)

    out = CT.convert_resnet(_fake(rule), "resnet18")
    # FakeSD claims every downsample exists; real ckpts only have them at
    # stage transitions
    _check(tree, out, optional=("downsample",))
