"""Faster R-CNN critic: shapes, proposals, ROIAlign, loss grads, detect,
converter coverage."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from unirestore_tpu.tasks import fasterrcnn as FRC
from unirestore_tpu.train.checkpoints import tree_flatten_dict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_torchvision as CT  # noqa: E402


def _tiny_inputs(b=1, hw=64):
    imgs = jnp.full((b, hw, hw, 3), 0.5, jnp.float32)
    boxes = np.zeros((b, 8, 4), np.float32)
    labels = np.zeros((b, 8), np.int64)
    mask = np.zeros((b, 8), bool)
    boxes[:, 0] = [4, 6, 40, 50]
    labels[:, 0] = 3
    mask[:, 0] = True
    return imgs, jnp.asarray(boxes), jnp.asarray(labels), jnp.asarray(mask)


def test_fpn_and_proposals_shapes():
    p = FRC.fasterrcnn_init(jax.random.PRNGKey(0))
    imgs, *_ = _tiny_inputs()
    feats = FRC.fpn_features(p, imgs)
    assert feats[2].shape == (1, 16, 16, 256)
    assert feats[5].shape == (1, 2, 2, 256)
    assert feats[6].shape == (1, 1, 1, 256)
    props, (obj, deltas, anchors) = FRC._proposals(p, feats, 64, 64)
    assert props.shape == (1, FRC.POST_NMS, 4)
    n = anchors.shape[0]
    assert obj.shape == (1, n) and deltas.shape == (1, n, 4)
    # proposals are clipped to the image
    pr = np.asarray(props)
    assert pr.min() >= 0 and pr.max() <= 64


def test_roi_align_constant_map():
    """ROIAlign over a constant feature map returns that constant."""
    feats = {lvl: jnp.full((64 // 2 ** lvl, 64 // 2 ** lvl, 8), 3.0)
             for lvl in FRC.LEVELS}
    boxes = jnp.asarray([[4.0, 4.0, 40.0, 40.0], [0.0, 0.0, 63.0, 63.0]])
    out = FRC._roi_align(feats, boxes)
    assert out.shape == (2, 7, 7, 8)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-5)


def test_loss_finite_and_grad_flows():
    p = FRC.fasterrcnn_init(jax.random.PRNGKey(0))
    imgs, boxes, labels, mask = _tiny_inputs()
    loss = FRC.fasterrcnn_loss(p, imgs, boxes, labels, mask)
    assert np.isfinite(float(loss))
    # the critic is frozen but grads must flow THROUGH it to the image
    g = jax.grad(lambda im: FRC.fasterrcnn_loss(p, im, boxes, labels,
                                                mask))(imgs)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_detect_returns_dicts():
    p = FRC.fasterrcnn_init(jax.random.PRNGKey(0))
    imgs, *_ = _tiny_inputs()
    dets = FRC.fasterrcnn_detect(p, imgs, score_threshold=0.0, max_det=10)
    assert len(dets) == 1
    d = dets[0]
    assert set(d) == {"boxes", "scores", "labels"}
    assert d["boxes"].shape[1] == 4 if len(d["boxes"]) else True


def _fake(rule):
    class D(dict):
        def __contains__(self, k):
            return True

        def __getitem__(self, k):
            return np.zeros(rule(k), np.float32)

    return D()


def test_convert_fasterrcnn_covers_tree():
    tree = FRC.fasterrcnn_init(jax.random.PRNGKey(0))

    def rule(k):
        if "box_predictor" in k or k == "roi_heads.box_head.5.weight" \
                or k == "backbone.body.fc.weight":
            return (2, 2)
        if k.endswith(".weight") and ("conv" in k or "blocks" in k
                                      or "rpn.head" in k
                                      or "box_head" in k and ".0.weight" in k
                                      or k.endswith("downsample.0.weight")):
            return (2, 2, 3, 3)
        return (2,)

    out = CT.convert_fasterrcnn(_fake(rule))
    ours = set(tree_flatten_dict(tree).keys())
    theirs = set(out.keys())
    missing = ours - theirs
    extra = [k for k in theirs - ours if "downsample" not in k]
    assert not missing, f"converter misses {sorted(missing)[:10]}"
    assert not extra, f"converter emits unknown {sorted(extra)[:10]}"
