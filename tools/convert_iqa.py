"""Offline converter: NR-IQA checkpoints -> npz trees for evalx.nr_suite.

Run where torch + the checkpoints are available; outputs go to ./weights
(or $UNIRESTORE_WEIGHTS).

    python tools/convert_iqa.py clipiqa <openai-clip-RN50.pt-state-dict> \
        [text_features.npy]          -> clipiqa_rn50.npz
    python tools/convert_iqa.py nima <pyiqa-NIMA-koniq.pth>  -> nima_koniq.npz
    python tools/convert_iqa.py hyperiqa <koniq_pretrained.pkl> -> hyperiqa.npz
    python tools/convert_iqa.py musiq <ckpt> musiq_koniq      -> musiq_koniq.npz
    python tools/convert_iqa.py maniqa <ckpt>                 -> maniqa.npz

CLIP text features: the antonym prompt pair ("Good photo.", "Bad photo.")
embeddings (2, 1024). Pass a precomputed .npy, or the converter computes
them when the ``clip`` package is importable.

MUSIQ/MANIQA note: our JAX archs follow the papers; pyiqa checkpoints use
per-port layouts, so those converters map by shape+order within named
groups and print any unmatched keys for manual adaptation.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.train.checkpoints import SEP  # noqa: E402
from tools.convert_torchvision import _sd, conv_w, _bn  # noqa: E402


def _lin(out, ours, theirs, sd, bias=True):
    out[f"{ours}{SEP}w"] = np.transpose(sd[f"{theirs}.weight"], (1, 0))
    if bias and f"{theirs}.bias" in sd:
        out[f"{ours}{SEP}b"] = sd[f"{theirs}.bias"]


def _conv(out, ours, theirs, sd, bias=True):
    out[f"{ours}{SEP}w"] = conv_w(sd[f"{theirs}.weight"])
    if bias and f"{theirs}.bias" in sd:
        out[f"{ours}{SEP}b"] = sd[f"{theirs}.bias"]


def convert_clipiqa(sd, text_features=None):
    """OpenAI CLIP RN50 state dict (visual.* keys) -> clipiqa tree."""
    v = "visual."
    out = {}
    for i in (1, 2, 3):
        _conv(out, f"stem{i}{SEP}conv", f"{v}conv{i}", sd, bias=False)
        _bn(out, f"stem{i}{SEP}bn", f"{v}bn{i}", sd)
    blocks = (3, 4, 6, 3)
    for s, n in enumerate(blocks):
        for j in range(n):
            t = f"{v}layer{s + 1}.{j}"
            o = f"layers{SEP}{s}{SEP}{j}"
            for c in (1, 2, 3):
                _conv(out, f"{o}{SEP}conv{c}{SEP}conv", f"{t}.conv{c}", sd,
                      bias=False)
                _bn(out, f"{o}{SEP}conv{c}{SEP}bn", f"{t}.bn{c}", sd)
            if f"{t}.downsample.0.weight" in sd:
                _conv(out, f"{o}{SEP}down{SEP}conv", f"{t}.downsample.0",
                      sd, bias=False)
                _bn(out, f"{o}{SEP}down{SEP}bn", f"{t}.downsample.1", sd)
    ap = f"{v}attnpool"
    out[f"attnpool{SEP}pos"] = sd[f"{ap}.positional_embedding"]
    for ours, theirs in (("q", "q_proj"), ("k", "k_proj"), ("v", "v_proj"),
                         ("out", "c_proj")):
        _lin(out, f"attnpool{SEP}{ours}", f"{ap}.{theirs}", sd)
    if text_features is None and "text_features" in sd:
        text_features = sd["text_features"]
    if text_features is None:
        try:
            import clip
            import torch
            model, _ = clip.load("RN50", device="cpu")
            tok = clip.tokenize(["Good photo.", "Bad photo."])
            with torch.no_grad():
                text_features = model.encode_text(tok).float().numpy()
        except Exception as e:  # pragma: no cover
            raise SystemExit(
                "pass precomputed text_features.npy (2, 1024); could not "
                f"compute with the clip package: {e}")
    out["text_features"] = np.asarray(text_features, np.float32)
    return out


def convert_nima(sd):
    """timm/pyiqa inception_resnet_v2 NIMA checkpoint -> nima tree."""
    p = ""
    if any(k.startswith("base_model.") for k in sd):
        p = "base_model."

    out = {}

    def cbn(ours, theirs):
        _conv(out, f"{ours}{SEP}conv", f"{p}{theirs}.conv", sd, bias=False)
        _bn(out, f"{ours}{SEP}bn", f"{p}{theirs}.bn", sd)

    for i, t in enumerate(("conv2d_1a", "conv2d_2a", "conv2d_2b",
                           "conv2d_3b", "conv2d_4a")):
        cbn(f"stem{SEP}{i}", t)

    def branch(ours, theirs, n):
        if n == 1:
            cbn(f"{ours}{SEP}0", theirs)
        else:
            for i in range(n):
                cbn(f"{ours}{SEP}{i}", f"{theirs}.{i}")

    m = "mixed_5b"
    branch(f"{m}{SEP}b0", f"{m}.branch0", 1)
    branch(f"{m}{SEP}b1", f"{m}.branch1", 2)
    branch(f"{m}{SEP}b2", f"{m}.branch2", 3)
    cbn(f"{m}{SEP}bp{SEP}0", f"{m}.branch3.1")
    for i in range(10):
        t = f"repeat.{i}"
        o = f"repeat{SEP}{i}"
        branch(f"{o}{SEP}b0", f"{t}.branch0", 1)
        branch(f"{o}{SEP}b1", f"{t}.branch1", 2)
        branch(f"{o}{SEP}b2", f"{t}.branch2", 3)
        _conv(out, f"{o}{SEP}conv", f"{p}{t}.conv2d", sd)
    m = "mixed_6a"
    branch(f"{m}{SEP}b0", f"{m}.branch0", 1)
    branch(f"{m}{SEP}b1", f"{m}.branch1", 3)
    for i in range(20):
        t = f"repeat_1.{i}"
        o = f"repeat_1{SEP}{i}"
        branch(f"{o}{SEP}b0", f"{t}.branch0", 1)
        branch(f"{o}{SEP}b1", f"{t}.branch1", 3)
        _conv(out, f"{o}{SEP}conv", f"{p}{t}.conv2d", sd)
    m = "mixed_7a"
    branch(f"{m}{SEP}b0", f"{m}.branch0", 2)
    branch(f"{m}{SEP}b1", f"{m}.branch1", 2)
    branch(f"{m}{SEP}b2", f"{m}.branch2", 3)
    for i in range(9):
        t = f"repeat_2.{i}"
        o = f"repeat_2{SEP}{i}"
        branch(f"{o}{SEP}b0", f"{t}.branch0", 1)
        branch(f"{o}{SEP}b1", f"{t}.branch1", 3)
        _conv(out, f"{o}{SEP}conv", f"{p}{t}.conv2d", sd)
    branch(f"block8{SEP}b0", "block8.branch0", 1)
    branch(f"block8{SEP}b1", "block8.branch1", 3)
    _conv(out, f"block8{SEP}conv", f"{p}block8.conv2d", sd)
    cbn("conv2d_7b", "conv2d_7b")
    for head in ("classifier.2", "classifier.1", "classif", "head"):
        if f"{head}.weight" in sd:
            _lin(out, "head", head, sd)
            break
    return out


def convert_hyperiqa(sd):
    """Official hyperIQA koniq_pretrained.pkl (HyperNet state dict)."""
    from tools.convert_torchvision import convert_resnet
    out = convert_resnet(sd, "resnet50", prefix="res.",
                         out_prefix=f"backbone{SEP}")
    # drop the (absent) classifier head key if emitted
    out.pop(f"backbone{SEP}fc{SEP}w", None)
    out.pop(f"backbone{SEP}fc{SEP}b", None)
    for i in (1, 2, 3):
        _conv(out, f"lda{i}_conv", f"res.lda{i}_pool.0", sd)
        _lin(out, f"lda{i}_fc", f"res.lda{i}_fc", sd)
    _lin(out, "lda4_fc", "res.lda4_fc", sd)
    for ours, theirs in (("hconv1", "conv1.0"), ("hconv2", "conv1.2"),
                         ("hconv3", "conv1.4")):
        _conv(out, ours, theirs, sd)
    for i in range(1, 5):
        _conv(out, f"fc{i}w_conv", f"fc{i}w_conv", sd)
        _lin(out, f"fc{i}b_fc", f"fc{i}b_fc", sd)
    _lin(out, "fc5w_fc", "fc5w_fc", sd)
    _lin(out, "fc5b_fc", "fc5b_fc", sd)
    return out


def _map_by_shape(sd, template_flat, groups):
    """Greedy order-preserving shape match within named key groups."""
    out = {}
    unmatched = []
    for ours_prefix, theirs_prefix, transform in groups:
        ours = [(k, v) for k, v in template_flat.items()
                if k.startswith(ours_prefix)]
        theirs = [(k, v) for k, v in sd.items()
                  if k.startswith(theirs_prefix)]
        ti = 0
        for ok, ov in ours:
            hit = None
            for i in range(ti, len(theirs)):
                tv = transform(theirs[i][1])
                if tv.shape == ov.shape:
                    hit = (i, tv)
                    break
            if hit is None:
                unmatched.append(ok)
            else:
                ti = hit[0] + 1
                out[ok] = hit[1]
    return out, unmatched


def main():
    kind = sys.argv[1]
    dst = os.environ.get("UNIRESTORE_WEIGHTS", "./weights")
    os.makedirs(dst, exist_ok=True)
    if kind == "clipiqa":
        text = np.load(sys.argv[3]) if len(sys.argv) > 3 else None
        out = convert_clipiqa(_sd(sys.argv[2]), text)
        name = "clipiqa_rn50"
    elif kind == "nima":
        out = convert_nima(_sd(sys.argv[2]))
        name = "nima_koniq"
    elif kind == "hyperiqa":
        out = convert_hyperiqa(_sd(sys.argv[2]))
        name = "hyperiqa"
    elif kind in ("musiq", "maniqa"):
        import jax
        from unirestore_tpu.train.checkpoints import tree_flatten_dict
        if kind == "musiq":
            from unirestore_tpu.evalx import musiq as M
            name = sys.argv[3] if len(sys.argv) > 3 else "musiq_koniq"
            tpl = M.musiq_init(jax.random.PRNGKey(0),
                               10 if name == "musiq_ava" else 1)
        else:
            from unirestore_tpu.evalx import maniqa as M
            name = "maniqa"
            tpl = M.maniqa_init(jax.random.PRNGKey(0))
        flat = tree_flatten_dict(tpl)
        sd = _sd(sys.argv[2])
        out, unmatched = _map_by_shape(
            sd, flat, [("", "", lambda a: a)])
        if unmatched:
            print(f"WARNING: {len(unmatched)} unmatched keys "
                  f"(first 10): {unmatched[:10]}")
    else:
        raise SystemExit(f"unknown kind {kind}")
    np.savez(os.path.join(dst, f"{name}.npz"), **out)
    print(f"wrote {name}.npz ({len(out)} tensors)")


if __name__ == "__main__":
    main()
