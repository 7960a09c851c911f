"""Additional DeepLab backbones: MobileNetV2 and (aligned) Xception.

The reference vendors these under src/modules/segmentation/deeplabv3/backbone/
(mobilenetv2.py, xception.py) for the deeplabv3(+)_mobilenet / _xception
factory entries (modeling.py:227-264, 322-353). Only the ResNet-50 variant
is exercised at runtime (segmentation/__init__.py:11-32), so these exist
for factory parity. Both support output_stride 16 via dilation in the last
stride-2 stage.

Feature contract (matches deeplab.py): returns {"low": (B,H/4,W/4,C_low),
"high": (B,H/16,W/16,C_high)}; channel pairs are (24, 320) for MobileNetV2
and (128, 2048) for Xception, the reference's ASPP/low-proj inputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..nn import layers as L
from . import resnet as RN

# MobileNetV2 inverted-residual plan: (expand, cout, repeats, stride)
MBV2_PLAN = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
             (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))


def _cbn_init(key, cin, cout, k, groups=1):
    return {"conv": L.conv2d_init(key, cin, cout, k, groups=groups,
                                  bias=False),
            "bn": RN.bn_init(cout)}


def _cbn(p, x, stride=1, groups=1, dilation=1, relu6=True):
    h = L.conv2d(p["conv"], x, stride=stride, groups=groups,
                 dilation=dilation,
                 padding="SAME" if stride == 1 else
                 (p["conv"]["w"].shape[0] - 1) // 2 * dilation)
    h = RN.batch_norm(p["bn"], h)
    return jnp.clip(h, 0, 6) if relu6 else h


def _invres_init(key, cin, cout, expand):
    ks = iter(jax.random.split(key, 3))
    mid = cin * expand
    p = {}
    if expand != 1:
        p["expand"] = _cbn_init(next(ks), cin, mid, 1)
    p["dw"] = _cbn_init(next(ks), mid, mid, 3, groups=mid)
    p["project"] = _cbn_init(next(ks), mid, cout, 1)
    return p


def mobilenet_v2_init(key):
    ks = iter(jax.random.split(key, 64))
    p = {"stem": _cbn_init(next(ks), 3, 32, 3), "stages": []}
    cin = 32
    for expand, cout, n, stride in MBV2_PLAN:
        stage = [_invres_init(next(ks), cin if j == 0 else cout, cout,
                              expand) for j in range(n)]
        p["stages"].append(stage)
        cin = cout
    return p


def _invres(p, x, stride, dilation):
    h = x
    if "expand" in p:
        h = _cbn(p["expand"], h)
    h = _cbn(p["dw"], h, stride=stride, groups=h.shape[-1],
             dilation=dilation)
    h = _cbn(p["project"], h, relu6=False)
    if stride == 1 and x.shape[-1] == h.shape[-1]:
        h = h + x
    return h


def mobilenet_v2_features(p, x, output_stride: int = 16):
    h = _cbn(p["stem"], x, stride=2)
    low = None
    cur_stride, dilation = 2, 1
    for stage, (expand, cout, n, stride) in zip(p["stages"], MBV2_PLAN):
        for j, blk in enumerate(stage):
            s = stride if j == 0 else 1
            d = dilation
            if s == 2 and cur_stride >= output_stride:
                s, d, dil_next = 1, dilation, dilation * 2
            else:
                dil_next = dilation
                if s == 2:
                    cur_stride *= 2
            h = _invres(blk, h, s, d)
            dilation = dil_next
        if cout == 24:
            low = h
    return {"low": low, "high": h}


# ---------------------------------------------------------------------------
# Aligned Xception (deeplabv3 variant)
# ---------------------------------------------------------------------------


def _sep_init(key, cin, cout):
    """Separable conv: depthwise 3x3 + BN + pointwise 1x1 + BN."""
    kd, kp = jax.random.split(key)
    return {"dw": _cbn_init(kd, cin, cin, 3, groups=cin),
            "pw": _cbn_init(kp, cin, cout, 1)}


def _sep(p, x, stride=1, dilation=1, relu_first=True):
    h = jax.nn.relu(x) if relu_first else x
    h = _cbn(p["dw"], h, stride=stride, groups=h.shape[-1],
             dilation=dilation, relu6=False)
    return _cbn(p["pw"], h, relu6=False)


def _xblock_init(key, cin, cout, n=3):
    ks = iter(jax.random.split(key, n + 1))
    p = {"seps": []}
    c = cin
    for _ in range(n):
        p["seps"].append(_sep_init(next(ks), c, cout))
        c = cout
    if cin != cout:
        p["skip"] = _cbn_init(next(ks), cin, cout, 1)
    return p


def _xblock(p, x, stride=1, dilation=1):
    h = x
    for i, sep in enumerate(p["seps"]):
        h = _sep(sep, h, stride=stride if i == len(p["seps"]) - 1 else 1,
                 dilation=dilation)
    skip = x
    if "skip" in p:
        skip = _cbn(p["skip"], x, stride=stride, relu6=False)
    elif stride != 1:
        skip = x[:, ::stride, ::stride]
    return h + skip


def xception_init(key):
    ks = iter(jax.random.split(key, 64))
    p = {
        "conv1": _cbn_init(next(ks), 3, 32, 3),
        "conv2": _cbn_init(next(ks), 32, 64, 3),
        "entry1": _xblock_init(next(ks), 64, 128),
        "entry2": _xblock_init(next(ks), 128, 256),
        "entry3": _xblock_init(next(ks), 256, 728),
        "middle": [_xblock_init(next(ks), 728, 728) for _ in range(16)],
        "exit": _xblock_init(next(ks), 728, 1024),
        "sep1": _sep_init(next(ks), 1024, 1536),
        "sep2": _sep_init(next(ks), 1536, 1536),
        "sep3": _sep_init(next(ks), 1536, 2048),
    }
    return p


def xception_features(p, x, output_stride: int = 16):
    # entry flow: /2 conv, blocks at /4, /8, /16; exit dilated at os16
    exit_stride = 2 if output_stride == 32 else 1
    exit_dil = 1 if output_stride == 32 else 2
    h = jax.nn.relu(_cbn(p["conv1"], x, stride=2, relu6=False))
    h = jax.nn.relu(_cbn(p["conv2"], h, relu6=False))
    h = _xblock(p["entry1"], h, stride=2)
    low = h  # 128 ch at /4
    h = _xblock(p["entry2"], h, stride=2)
    h = _xblock(p["entry3"], h, stride=2)
    for blk in p["middle"]:
        h = _xblock(blk, h)
    h = _xblock(p["exit"], h, stride=exit_stride, dilation=exit_dil)
    h = jax.nn.relu(_sep(p["sep1"], h, dilation=exit_dil, relu_first=False))
    h = jax.nn.relu(_sep(p["sep2"], h, dilation=exit_dil, relu_first=False))
    h = jax.nn.relu(_sep(p["sep3"], h, dilation=exit_dil, relu_first=False))
    return {"low": low, "high": h}


# ---------------------------------------------------------------------------
# HRNetV2 (deeplabv3 variant; reference backbone/hrnetv2.py)
# ---------------------------------------------------------------------------

HRNET_MODULES = {2: 1, 3: 4, 4: 3}     # modules per stage
HRNET_BLOCKS = 4                        # BasicBlocks per branch per module


def _basic_init(key, cin, cout):
    ks = jax.random.split(key, 3)
    p = {"conv1": _cbn_init(ks[0], cin, cout, 3),
         "conv2": _cbn_init(ks[1], cout, cout, 3)}
    if cin != cout:
        p["down"] = _cbn_init(ks[2], cin, cout, 1)
    return p


def _basic(p, x):
    h = jax.nn.relu(_cbn(p["conv1"], x, relu6=False))
    h = _cbn(p["conv2"], h, relu6=False)
    skip = _cbn(p["down"], x, relu6=False) if "down" in p else x
    return jax.nn.relu(h + skip)


def _bottleneck_init(key, cin, width, cout):
    ks = jax.random.split(key, 4)
    p = {"conv1": _cbn_init(ks[0], cin, width, 1),
         "conv2": _cbn_init(ks[1], width, width, 3),
         "conv3": _cbn_init(ks[2], width, cout, 1)}
    if cin != cout:
        p["down"] = _cbn_init(ks[3], cin, cout, 1)
    return p


def _bottleneck(p, x):
    h = jax.nn.relu(_cbn(p["conv1"], x, relu6=False))
    h = jax.nn.relu(_cbn(p["conv2"], h, relu6=False))
    h = _cbn(p["conv3"], h, relu6=False)
    skip = _cbn(p["down"], x, relu6=False) if "down" in p else x
    return jax.nn.relu(h + skip)


def _fuse_init(key, chans):
    """Fuse layers: p[i][j] transforms branch j -> branch i resolution."""
    n = len(chans)
    ks = iter(jax.random.split(key, n * n * 4))
    fuse = []
    for i in range(n):
        row = []
        for j in range(n):
            if j == i:
                row.append(None)
            elif j > i:  # upsample path: 1x1 to Ci (+ nearest resize)
                row.append({"up": _cbn_init(next(ks), chans[j], chans[i],
                                            1)})
            else:        # downsample path: (i - j) strided 3x3 convs
                downs = []
                c = chans[j]
                for step in range(i - j):
                    cout = chans[i] if step == i - j - 1 else c
                    downs.append(_cbn_init(next(ks), c, cout, 3))
                    c = cout
                row.append({"downs": downs})
        fuse.append(row)
    return fuse


def _fuse(fuse_p, xs):
    n = len(xs)
    outs = []
    for i in range(n):
        acc = xs[i]
        for j in range(n):
            if j == i:
                continue
            pij = fuse_p[i][j]
            if "up" in pij:
                y = _cbn(pij["up"], xs[j], relu6=False)
                y = L.resize_nearest(y, xs[i].shape[1:3])
            else:
                y = xs[j]
                for step, dp in enumerate(pij["downs"]):
                    last = step == len(pij["downs"]) - 1
                    y = _cbn(dp, y, stride=2, relu6=False)
                    if not last:
                        y = jax.nn.relu(y)
            acc = acc + y
        outs.append(jax.nn.relu(acc))
    return outs


def _module_init(key, chans):
    ks = iter(jax.random.split(key, len(chans) * HRNET_BLOCKS + 1))
    return {
        "branches": [[_basic_init(next(ks), c, c)
                      for _ in range(HRNET_BLOCKS)] for c in chans],
        "fuse": _fuse_init(next(ks), chans),
    }


def hrnetv2_init(key, width: int = 48):
    ks = iter(jax.random.split(key, 64))
    chans = [width * 2 ** i for i in range(4)]
    p = {
        "conv1": _cbn_init(next(ks), 3, 64, 3),
        "conv2": _cbn_init(next(ks), 64, 64, 3),
        "layer1": [_bottleneck_init(next(ks), 64 if i == 0 else 256, 64,
                                    256) for i in range(4)],
        "transitions": [], "stages": [],
    }
    prev = [256]
    for s in (2, 3, 4):
        cur = chans[:s]
        trans = []
        for i, c in enumerate(cur):
            if i < len(prev):
                trans.append(_cbn_init(next(ks), prev[i], c, 3)
                             if prev[i] != c else None)
            else:  # new branch from the last previous branch, stride 2
                trans.append(_cbn_init(next(ks), prev[-1], c, 3))
        p["transitions"].append(trans)
        p["stages"].append([_module_init(next(ks), cur)
                            for _ in range(HRNET_MODULES[s])])
        prev = cur
    return p


def hrnetv2_features(p, x, width: int = 48):
    chans = [width * 2 ** i for i in range(4)]
    h = jax.nn.relu(_cbn(p["conv1"], x, stride=2, relu6=False))
    h = jax.nn.relu(_cbn(p["conv2"], h, stride=2, relu6=False))
    for blk in p["layer1"]:
        h = _bottleneck(blk, h)
    low = h  # 256 ch at /4
    xs = [h]
    for si, (trans, stage) in enumerate(zip(p["transitions"], p["stages"])):
        nxt = []
        for i, t in enumerate(trans):
            if i < len(xs):
                nxt.append(jax.nn.relu(_cbn(t, xs[i], relu6=False))
                           if t is not None else xs[i])
            else:
                nxt.append(jax.nn.relu(_cbn(t, xs[-1], stride=2,
                                            relu6=False)))
        xs = nxt
        for mod in stage:
            xs = [x_ for x_ in xs]
            for bi, branch in enumerate(mod["branches"]):
                for blk in branch:
                    xs[bi] = _basic(blk, xs[bi])
            xs = _fuse(mod["fuse"], xs)
    # HRNetV2 head: upsample all branches to /4 and concat (720 ch @ w48)
    up = [xs[0]] + [L.resize_nearest(b, xs[0].shape[1:3]) for b in xs[1:]]
    return {"low": low, "high": jnp.concatenate(up, axis=-1)}
