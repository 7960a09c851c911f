"""Segmentation probe zoo — the reference's seg eval_mode sets.

eval_semantic_segmentation.py:37-50: ``single`` = [dlv3pr50, rflwr101];
``all`` = [dlv3pr50, dlv3pr50_ft, rflwr101, rflwr101_ft, rflwr101_fifo];
``bare`` = []. Probe construction mirrors
segmentation/__init__.py:9-48 (DeepLabV3+ R50 os16 / RefineNet-LW-101
with per-variant checkpoints). Monitor: val_lq/rflwr101.

model_type -> weights file: dlv3pr50 -> deeplabv3plus_resnet50[_ft];
rflwr101 -> refinenet_lw101[_ft|_fifo].
"""

from __future__ import annotations

import jax

from .. import zoo
from . import deeplab as DLB
from . import refinenet as RFN

EVAL_MODE_SETS = {
    "single": ["dlv3pr50", "rflwr101"],
    "all": ["dlv3pr50", "dlv3pr50_ft", "rflwr101", "rflwr101_ft",
            "rflwr101_fifo"],
    "bare": [],
}

_WEIGHTS = {
    "dlv3pr50": "deeplabv3plus_resnet50",
    "dlv3pr50_ft": "deeplabv3plus_resnet50_ft",
    "rflwr101": "refinenet_lw101",
    "rflwr101_ft": "refinenet_lw101_ft",
    "rflwr101_fifo": "refinenet_lw101_fifo",
}


def model_types_for(eval_mode: str) -> list[str]:
    if eval_mode not in EVAL_MODE_SETS:
        raise ValueError(f"Unknown eval_mode: {eval_mode}")
    return list(EVAL_MODE_SETS[eval_mode])


def build_seg_probe(model_type: str, seed: int = 8, jit: bool = True):
    """Returns ``fn(images_nhwc01) -> logits (B, H, W, 19)``."""
    if model_type not in _WEIGHTS:
        raise ValueError(f"Unknown model type: {model_type}")
    if model_type.startswith("dlv3pr50"):
        p = DLB.deeplabv3plus_init(jax.random.PRNGKey(seed))
        p, _ = zoo.load_npz_tree(_WEIGHTS[model_type], p)
        fn = (lambda imgs: DLB.deeplabv3plus_apply(p, imgs))
    else:
        p = RFN.refinenet_lw_init(jax.random.PRNGKey(seed))
        p, _ = zoo.load_npz_tree(_WEIGHTS[model_type], p)
        fn = (lambda imgs: RFN.refinenet_lw_apply(p, imgs))
    return jax.jit(fn) if jit else fn


def build_seg_zoo(eval_mode: str = "single", seed: int = 8,
                  jit: bool = True) -> dict:
    return {mt: build_seg_probe(mt, seed, jit)
            for mt in model_types_for(eval_mode)}
