import jax
import jax.numpy as jnp
import numpy as np

from unirestore_tpu.tasks import retinanet as RET


def _tiny_inputs(b=1, hw=64):
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, hw, hw, 3))
    gts = [{"boxes": np.array([[8.0, 8.0, 40.0, 48.0]]),
            "labels": np.array([3])} for _ in range(b)]
    return img, gts


def test_anchor_count_matches_heads():
    h = w = 64
    anchors = RET.anchors_for_shape(h, w)
    expect = sum(
        9 * int(np.ceil(h / 2 ** l)) * int(np.ceil(w / 2 ** l))
        for l in RET.LEVELS)
    assert anchors.shape == (expect, 4)


def test_box_encode_decode_roundtrip():
    anchors = jnp.asarray(RET.anchors_for_shape(64, 64)[:10])
    boxes = anchors + jnp.asarray([2.0, -3.0, 5.0, 1.0])
    deltas = RET.encode_boxes(anchors, boxes)
    rec = RET.decode_boxes(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), atol=1e-3)


def test_loss_and_grad_flow():
    p = RET.retinanet_init(jax.random.PRNGKey(0), num_classes=7)
    img, gts = _tiny_inputs()
    boxes, labels, mask = RET.pad_targets(gts, max_boxes=8)

    def loss_fn(images):
        return RET.retinanet_loss(p, images, jnp.asarray(boxes),
                                  jnp.asarray(labels), jnp.asarray(mask),
                                  num_classes=7)

    loss = loss_fn(img)
    assert np.isfinite(float(loss)) and float(loss) > 0
    # critic property: gradient flows into the INPUT image (stage-3 loss)
    g = jax.grad(loss_fn)(img)
    assert float(jnp.abs(g).sum()) > 0


def test_detect_returns_valid_boxes():
    p = RET.retinanet_init(jax.random.PRNGKey(0), num_classes=7)
    img, _ = _tiny_inputs()
    dets = RET.retinanet_detect(p, np.asarray(img), num_classes=7,
                                score_threshold=0.0, max_det=10)
    assert len(dets) == 1
    d = dets[0]
    assert d["boxes"].shape[1] == 4 and len(d["scores"]) <= 10
    assert (d["boxes"][:, 2] >= d["boxes"][:, 0]).all()


def test_nms():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]],
                     np.float64)
    scores = np.array([0.9, 0.8, 0.7])
    keep = RET.nms(boxes, scores, iou_thr=0.5)
    assert list(keep) == [0, 2]
