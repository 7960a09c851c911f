"""Faster R-CNN (ResNet-50 FPN v2) — the reference's alternate detection
critic/probe (eval_detection.py:173-177, 249-253: torchvision
``fasterrcnn_resnet50_fpn_v2``; selected via model_kwargs["downstream"] ==
"fastrcnn", engine_unifie.py:319-336).

Functional NHWC port, jit-friendly throughout:
- ResNet-50 + FPN over c2..c5 (P2..P5) + max-pool P6; RPN head v2
  (two 3x3 convs), 3 anchors/cell (one size per level x 3 ratios).
- Proposals: global top-K by objectness + in-graph greedy NMS over a
  fixed K (the reference does per-level top-2000 then NMS-0.7; we take
  the global top PRE_NMS and keep POST_NMS — a static-shape equivalent).
- MultiScale ROIAlign (7x7, sampling ratio 2, level k = 4 +
  log2(sqrt(area)/224) clamped to [2, 5]).
- Box head v2 (4x conv3x3+norm + fc1024) and 91-way predictor with
  per-class boxes; class-wise NMS at inference (host side).
- Training loss: sampled RPN BCE + smooth-L1 and sampled ROI CE +
  smooth-L1, torchvision matching thresholds and sampling fractions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..nn import layers as L
from . import resnet as RN
from .retinanet import (_pairwise_iou, decode_boxes, encode_boxes, nms)

LEVELS = (2, 3, 4, 5)        # P2..P5 (+pool P6 for RPN only)
ANCHOR_SIZES = (32, 64, 128, 256, 512)   # one per level P2..P6
RATIOS = (0.5, 1.0, 2.0)
A = len(RATIOS)
PRE_NMS = 1024               # global top-K proposals before NMS
POST_NMS = 256               # proposals kept after NMS
ROI_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


def _bn_conv_init(key, cin, cout, k):
    return {"conv": L.conv2d_init(key, cin, cout, k, bias=False),
            "bn": RN.bn_init(cout)}


def fasterrcnn_init(key, num_classes: int = 91, channels: int = 256):
    ks = iter(jax.random.split(key, 64))
    p = {"backbone": RN.resnet_init(next(ks), "resnet50")}
    del p["backbone"]["fc"]  # detection backbone has no classifier head
    p["lateral"] = {f"c{i}": L.conv2d_init(next(ks), c, channels, 1)
                    for i, c in ((2, 256), (3, 512), (4, 1024), (5, 2048))}
    p["smooth"] = {f"p{i}": L.conv2d_init(next(ks), channels, channels, 3)
                   for i in LEVELS}
    # RPN head v2: two 3x3 convs, then 1x1 objectness / 1x1 deltas
    p["rpn"] = {
        "convs": [L.conv2d_init(next(ks), channels, channels, 3)
                  for _ in range(2)],
        "cls": L.conv2d_init(next(ks), channels, A, 1),
        "box": L.conv2d_init(next(ks), channels, A * 4, 1),
    }
    # box head v2: 4x conv+BN then fc 1024
    p["box_head"] = {
        "convs": [_bn_conv_init(next(ks), channels, channels, 3)
                  for _ in range(4)],
        "fc": L.linear_init(next(ks), channels * 7 * 7, 1024),
    }
    p["cls_score"] = L.linear_init(next(ks), 1024, num_classes)
    p["bbox_pred"] = L.linear_init(next(ks), 1024, num_classes * 4)
    return p


def fpn_features(p, images, preprocess_input: bool = True):
    """P2..P5 (+P6 pool) feature maps."""
    x = images
    if preprocess_input:
        mean = jnp.asarray(RN.IMAGENET_MEAN, x.dtype)
        std = jnp.asarray(RN.IMAGENET_STD, x.dtype)
        x = (x - mean) / std
    f = RN.resnet_features(p["backbone"], x)
    laterals = {i: L.conv2d(p["lateral"][f"c{i}"], f[f"c{i}"], padding=0)
                for i in LEVELS}
    feats = {}
    top = laterals[5]
    feats[5] = top
    for i in (4, 3, 2):
        # nearest-resize to the exact lateral size (torchvision FPN
        # interpolates; plain 2x breaks on odd feature dims)
        top = laterals[i] + L.resize_nearest(
            top, laterals[i].shape[1:3])
        feats[i] = top
    for i in LEVELS:
        feats[i] = L.conv2d(p["smooth"][f"p{i}"], feats[i], padding=1)
    feats[6] = jax.lax.reduce_window(
        feats[5], -jnp.inf, jax.lax.max, (1, 1, 1, 1), (1, 2, 2, 1),
        "VALID")
    return feats


def rpn_anchors_for_shape(h: int, w: int) -> np.ndarray:
    out = []
    for li, lvl in enumerate((2, 3, 4, 5, 6)):
        stride = 2 ** lvl
        size = ANCHOR_SIZES[li]
        fh, fw = math.ceil(h / stride), math.ceil(w / stride)
        cy = (np.arange(fh) + 0.5) * stride
        cx = (np.arange(fw) + 0.5) * stride
        yy, xx = np.meshgrid(cy, cx, indexing="ij")
        for r in RATIOS:
            aw = size * math.sqrt(1.0 / r)
            ah = size * math.sqrt(r)
            out.append(np.stack([xx - aw / 2, yy - ah / 2, xx + aw / 2,
                                 yy + ah / 2], -1).reshape(-1, 4))
    return np.concatenate(out).astype(np.float32)


def _rpn_outputs(p, feats):
    """Flat (B, N) objectness and (B, N, 4) deltas matching
    rpn_anchors_for_shape ordering (ratio-major per level)."""
    obj, box = [], []
    for lvl in (2, 3, 4, 5, 6):
        x = feats[lvl]
        for conv in p["rpn"]["convs"]:
            x = jax.nn.relu(L.conv2d(conv, x, padding=1))
        o = L.conv2d(p["rpn"]["cls"], x, padding=0)
        b = L.conv2d(p["rpn"]["box"], x, padding=0)
        B, fh, fw, _ = o.shape
        o = o.reshape(B, fh * fw, A).transpose(0, 2, 1).reshape(B, -1)
        b = b.reshape(B, fh * fw, A, 4).transpose(0, 2, 1, 3).reshape(
            B, -1, 4)
        obj.append(o)
        box.append(b)
    return jnp.concatenate(obj, 1), jnp.concatenate(box, 1)


def _greedy_nms_mask(boxes, scores, iou_thr: float, keep: int):
    """In-graph greedy NMS over a fixed candidate set.

    boxes: (K, 4) sorted by score desc; returns (keep,) indices into K.
    """
    k = boxes.shape[0]
    iou = _pairwise_iou(boxes, boxes)

    def body(i, state):
        alive, out = state
        # highest-scoring still-alive candidate
        idx = jnp.argmax(alive * (scores + 1e3))  # scores sorted anyway
        out = out.at[i].set(idx)
        suppress = iou[idx] > iou_thr
        alive = alive * (~suppress)
        alive = alive.at[idx].set(False)
        return alive, out

    alive = jnp.ones((k,), bool)
    out = jnp.zeros((keep,), jnp.int32)
    alive, out = jax.lax.fori_loop(0, keep, body, (alive, out))
    return out


def _proposals(p, feats, h, w):
    """(B, post, 4) proposal boxes (post = POST_NMS clamped to anchors)."""
    obj, deltas = _rpn_outputs(p, feats)
    anchors = jnp.asarray(rpn_anchors_for_shape(h, w))
    pre = min(PRE_NMS, anchors.shape[0])
    post = min(POST_NMS, pre)

    def per_image(o, d):
        scores, idx = jax.lax.top_k(o, pre)
        boxes = decode_boxes(anchors[idx], d[idx].astype(jnp.float32))
        boxes = jnp.stack([
            jnp.clip(boxes[:, 0], 0, w), jnp.clip(boxes[:, 1], 0, h),
            jnp.clip(boxes[:, 2], 0, w), jnp.clip(boxes[:, 3], 0, h)],
            axis=-1)
        keep = _greedy_nms_mask(boxes, jax.nn.sigmoid(
            scores.astype(jnp.float32)), 0.7, post)
        return boxes[keep]

    return jax.vmap(per_image)(obj, deltas), (obj, deltas, anchors)


def _roi_align(feats, boxes, out_size: int = 7, sampling: int = 2):
    """MultiScale ROIAlign over P2..P5 for one image.

    feats: {lvl: (H_l, W_l, C)}; boxes: (R, 4) xyxy. Returns (R, 7, 7, C).
    """
    areas = jnp.maximum(boxes[:, 2] - boxes[:, 0], 1e-6) * \
        jnp.maximum(boxes[:, 3] - boxes[:, 1], 1e-6)
    k = jnp.floor(4 + jnp.log2(jnp.sqrt(areas) / 224.0 + 1e-9))
    k = jnp.clip(k, 2, 5).astype(jnp.int32)

    def align_level(fmap, lvl):
        scale = 1.0 / (2 ** lvl)
        fh, fw = fmap.shape[0], fmap.shape[1]

        def one(box):
            x0, y0, x1, y1 = box * scale
            bw = jnp.maximum(x1 - x0, 1e-6)
            bh = jnp.maximum(y1 - y0, 1e-6)
            n = out_size * sampling
            ys = y0 + (jnp.arange(n) + 0.5) * bh / n
            xs = x0 + (jnp.arange(n) + 0.5) * bw / n

            def bil(y, x):
                y = jnp.clip(y - 0.5, 0, fh - 1)
                x = jnp.clip(x - 0.5, 0, fw - 1)
                y0i = jnp.floor(y).astype(jnp.int32)
                x0i = jnp.floor(x).astype(jnp.int32)
                y1i = jnp.minimum(y0i + 1, fh - 1)
                x1i = jnp.minimum(x0i + 1, fw - 1)
                wy = y - y0i
                wx = x - x0i
                v = (fmap[y0i, x0i] * (1 - wy) * (1 - wx)
                     + fmap[y1i, x0i] * wy * (1 - wx)
                     + fmap[y0i, x1i] * (1 - wy) * wx
                     + fmap[y1i, x1i] * wy * wx)
                return v

            grid = jax.vmap(lambda y: jax.vmap(lambda x: bil(y, x))(xs))(ys)
            # average sampling^2 samples per output cell
            c = grid.shape[-1]
            grid = grid.reshape(out_size, sampling, out_size, sampling, c)
            return grid.mean(axis=(1, 3))

        return jax.vmap(one)(boxes)

    per_level = {lvl: align_level(feats[lvl], lvl) for lvl in LEVELS}
    out = per_level[2]
    for lvl in (3, 4, 5):
        out = jnp.where((k == lvl)[:, None, None, None], per_level[lvl],
                        out)
    return out


def _box_head(p, rois):
    """(R, 7, 7, C) -> (R, 1024)."""
    x = rois
    for cb in p["box_head"]["convs"]:
        x = jax.nn.relu(RN.batch_norm(cb["bn"],
                                      L.conv2d(cb["conv"], x, padding=1)))
    r = x.shape[0]
    flat = jnp.transpose(x, (0, 3, 1, 2)).reshape(r, -1)  # torch flatten
    return jax.nn.relu(L.linear(p["box_head"]["fc"], flat))


def fasterrcnn_detect(p, images, num_classes: int = 91,
                      score_threshold: float = 0.05, nms_thr: float = 0.5,
                      max_det: int = 100):
    """Inference: list of {boxes, scores, labels} per image."""
    imgs = jnp.asarray(images)
    h, w = imgs.shape[1:3]
    feats = fpn_features(p, imgs)
    proposals, _ = _proposals(p, feats, h, w)

    def per_image(feat_list, props):
        fdict = dict(zip(LEVELS, feat_list))
        rois = _roi_align(fdict, props)
        emb = _box_head(p, rois)
        scores = jax.nn.softmax(
            L.linear(p["cls_score"], emb).astype(jnp.float32), -1)
        deltas = L.linear(p["bbox_pred"], emb).astype(jnp.float32)
        return scores, deltas

    feat_list = [feats[lv] for lv in LEVELS]
    scores, deltas = jax.vmap(per_image)(feat_list, proposals)
    scores = np.asarray(scores)
    deltas = np.asarray(deltas)
    props = np.asarray(proposals)
    results = []
    wts = np.asarray(ROI_WEIGHTS, np.float32)
    for b in range(imgs.shape[0]):
        keep_boxes, keep_scores, keep_labels = [], [], []
        for c in range(1, num_classes):  # skip background 0
            sc = scores[b, :, c]
            sel = sc > score_threshold
            if not sel.any():
                continue
            d = deltas[b, sel, c * 4:(c + 1) * 4] / wts
            bx = np.array(decode_boxes(jnp.asarray(props[b][sel]),
                                       jnp.asarray(d)))
            bx[:, 0::2] = np.clip(bx[:, 0::2], 0, w)
            bx[:, 1::2] = np.clip(bx[:, 1::2], 0, h)
            keep = nms(bx, sc[sel], nms_thr, max_det)
            keep_boxes.append(bx[keep])
            keep_scores.append(sc[sel][keep])
            keep_labels.append(np.full(len(keep), c, np.int64))
        if keep_boxes:
            bx = np.concatenate(keep_boxes)
            sc = np.concatenate(keep_scores)
            lb = np.concatenate(keep_labels)
            order = np.argsort(-sc)[:max_det]
            results.append({"boxes": bx[order], "scores": sc[order],
                            "labels": lb[order]})
        else:
            results.append({"boxes": np.zeros((0, 4), np.float32),
                            "scores": np.zeros((0,), np.float32),
                            "labels": np.zeros((0,), np.int64)})
    return results


def _smooth_l1(x, beta):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def fasterrcnn_loss(p, images, gt_boxes, gt_labels, gt_mask,
                    num_classes: int = 91, rng=None):
    """RPN + ROI-head training loss on padded targets (torchvision
    matching/sampling: RPN 0.7/0.3 match, 256 samples @ 0.5 pos; ROI
    0.5 match, 512 samples @ 0.25 pos). ``rng`` drives the sampling."""
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    h, w = images.shape[1:3]
    feats = fpn_features(p, images)
    proposals, (obj, rpn_deltas, anchors) = _proposals(p, feats, h, w)

    def rpn_loss(o, d, boxes, labels, mask, key):
        iou = _pairwise_iou(anchors, boxes)
        iou = jnp.where(mask[None, :], iou, -1.0)
        best = iou.max(axis=1)
        best_idx = iou.argmax(axis=1)
        pos = best >= 0.7
        neg = best < 0.3
        # sample 256 with pos fraction 0.5 via random scores
        r = jax.random.uniform(key, best.shape)
        pos_rank = jnp.where(pos, r, -1.0)
        neg_rank = jnp.where(neg, r, -1.0)
        pos_sel = pos_rank >= jnp.sort(pos_rank)[-128]
        pos_sel = pos_sel & pos
        n_pos = jnp.maximum(pos_sel.sum(), 1)
        neg_sel = neg_rank >= jnp.sort(neg_rank)[-(256 - 128)]
        neg_sel = neg_sel & neg
        sel = pos_sel | neg_sel
        logits = o.astype(jnp.float32)
        bce = jnp.where(
            pos_sel, -jax.nn.log_sigmoid(logits),
            -jax.nn.log_sigmoid(-logits))
        cls = jnp.where(sel, bce, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        tgt = encode_boxes(anchors, boxes[best_idx])
        l1 = _smooth_l1(d.astype(jnp.float32) - tgt, 1.0 / 9).sum(-1)
        box = jnp.where(pos_sel, l1, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        return cls + box

    def roi_loss(feat_list, props, boxes, labels, mask, key):
        iou = _pairwise_iou(props, boxes)
        iou = jnp.where(mask[None, :], iou, -1.0)
        best = iou.max(axis=1)
        best_idx = iou.argmax(axis=1)
        fg = best >= 0.5
        tgt_label = jnp.where(fg, labels[best_idx], 0)
        r = jax.random.uniform(key, best.shape)
        n_keep = min(POST_NMS, 512)
        pos_quota = n_keep // 4
        pos_rank = jnp.where(fg, r, -1.0)
        pos_sel = (pos_rank >= jnp.sort(pos_rank)[-pos_quota]) & fg
        neg_rank = jnp.where(~fg, r, -1.0)
        neg_sel = (neg_rank >= jnp.sort(neg_rank)[-(n_keep - pos_quota)]) \
            & (~fg)
        sel = pos_sel | neg_sel
        fdict = dict(zip(LEVELS, feat_list))
        rois = _roi_align(fdict, props)
        emb = _box_head(p, rois)
        logits = L.linear(p["cls_score"], emb).astype(jnp.float32)
        deltas = L.linear(p["bbox_pred"], emb).astype(jnp.float32)
        logp = jax.nn.log_softmax(logits, -1)
        ce = -jnp.take_along_axis(logp, tgt_label[:, None], 1)[:, 0]
        cls = jnp.where(sel, ce, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        wts = jnp.asarray(ROI_WEIGHTS)
        tgt_d = encode_boxes(props, boxes[best_idx]) * wts
        dsel = jax.vmap(
            lambda dd, lab: jax.lax.dynamic_slice(dd, (lab * 4,), (4,)))(
                deltas, tgt_label)
        l1 = _smooth_l1(dsel - tgt_d, 1.0).sum(-1)
        box = jnp.where(pos_sel, l1, 0.0).sum() / jnp.maximum(sel.sum(), 1)
        return cls + box

    k1, k2 = jax.random.split(rng)
    feat_list = [feats[lv] for lv in LEVELS]
    rpn = jax.vmap(rpn_loss)(obj, rpn_deltas, gt_boxes, gt_labels, gt_mask,
                             jax.random.split(k1, images.shape[0]))
    roi = jax.vmap(roi_loss)(feat_list, proposals, gt_boxes, gt_labels,
                             gt_mask, jax.random.split(k2, images.shape[0]))
    return rpn.mean() + roi.mean()
