"""Classification probe zoo — the reference's eval_mode classifier sets.

Mirrors eval_classification.py:36-48 (eval_mode -> model_types) and
:209-270 (model_type -> network). Every probe is a functional JAX net from
this package with weights loaded from the offline converter outputs
(``$UNIRESTORE_WEIGHTS/<name>.npz``; random init + warning when absent).

model_type -> weights file:
  r50v1 / r50v2 / r101v1 / r18      resnet50_v1 / resnet50_v2 / resnet101_v1
  vgg / vit / swin / rvt / eff       vgg16 / vit_b16 / swin_v2_b / rvt_base_plus
                                     / efficientnet_v2_l
  *_ft                               <base>_ft (fine-tuned exports)
  cub_r18/cub_r50/cub_conv/cub_vitb/cub_swin   cub200-tuned exports
"""

from __future__ import annotations

import jax

from .. import zoo
from . import convnext as CNX
from . import efficientnet as EFF
from . import resnet as RN
from . import rvt as RVT
from . import swin as SW
from . import vgg as VGG
from . import vit as VIT

EVAL_MODE_SETS = {
    "all": ["r50v1", "r101v1", "vgg", "swin", "vit", "rvt"],
    "all_ft": ["r50v1_ft", "r50v2_ft", "vgg_ft", "swin_ft", "vit_ft", "rvt"],
    "single": ["r50v1", "r50v2"],
    "bare": [],
    "CUB": ["cub_r18", "cub_r50", "cub_conv", "cub_vitb", "cub_swin"],
}

# model_type -> (init(key, num_classes), apply(p, imgs), weights, n_class)
_SPECS = {
    "r18": (lambda k, n: RN.resnet_init(k, "resnet18", n),
            RN.resnet_apply, "resnet18_v1", 1000),
    "r50v1": (lambda k, n: RN.resnet_init(k, "resnet50", n),
              RN.resnet_apply, "resnet50_v1", 1000),
    "r50v2": (lambda k, n: RN.resnet_init(k, "resnet50", n),
              RN.resnet_apply, "resnet50_v2", 1000),
    "r101v1": (lambda k, n: RN.resnet_init(k, "resnet101", n),
               RN.resnet_apply, "resnet101_v1", 1000),
    "vgg": (VGG.vgg16_init, VGG.vgg16_apply, "vgg16", 1000),
    "vit": (VIT.vit_b16_init, VIT.vit_b16_apply, "vit_b16", 1000),
    "swin": (lambda k, n: SW.swin_base_init(k, n, v2=True),
             lambda p, x: SW.swin_base_apply(p, x, v2=True),
             "swin_v2_b", 1000),
    "rvt": (RVT.rvt_base_plus_init, RVT.rvt_base_plus_apply,
            "rvt_base_plus", 1000),
    "eff": (EFF.efficientnet_v2_l_init, EFF.efficientnet_v2_l_apply,
            "efficientnet_v2_l", 1000),
    "cub_r18": (lambda k, n: RN.resnet_init(k, "resnet18", 200),
                RN.resnet_apply, "cub_resnet18", 200),
    "cub_r50": (lambda k, n: RN.resnet_init(k, "resnet50", 200),
                RN.resnet_apply, "cub_resnet50", 200),
    "cub_conv": (lambda k, n: CNX.convnext_base_init(k, 200),
                 CNX.convnext_base_apply, "cub_convnext_base", 200),
    "cub_vitb": (lambda k, n: VIT.vit_b16_init(k, 200),
                 VIT.vit_b16_apply, "cub_vit_b16", 200),
    "cub_swin": (lambda k, n: SW.swin_base_init(k, 200, v2=False),
                 lambda p, x: SW.swin_base_apply(p, x, v2=False),
                 "cub_swin_base", 200),
}


def model_types_for(eval_mode: str) -> list[str]:
    if eval_mode not in EVAL_MODE_SETS:
        raise ValueError(f"Unknown eval_mode: {eval_mode}")
    return list(EVAL_MODE_SETS[eval_mode])


def build_classifier(model_type: str, seed: int = 7, jit: bool = True):
    """Returns ``fn(images_nhwc01) -> logits`` for one probe."""
    base = model_type[:-3] if model_type.endswith("_ft") else model_type
    if base not in _SPECS:
        raise ValueError(f"Unknown classifier name: {model_type}")
    init, apply, weights, n_class = _SPECS[base]
    if model_type.endswith("_ft"):
        weights = f"{weights}_ft"
    p = init(jax.random.PRNGKey(seed), n_class)
    p, _ = zoo.load_npz_tree(weights, p)
    fn = (lambda imgs: apply(p, imgs))
    return jax.jit(fn) if jit else fn


def build_classifier_zoo(eval_mode: str = "single", seed: int = 7,
                         jit: bool = True) -> dict:
    """name -> fn for the reference eval_mode's probe set."""
    return {mt: build_classifier(mt, seed, jit)
            for mt in model_types_for(eval_mode)}
