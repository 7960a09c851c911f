"""Pretrained-weight zoo: load converted checkpoints when present.

Zero-egress friendly: all external weights (sd-turbo VAE/UNet, null text
embedding, torchvision critics, LPIPS) are imported OFFLINE via the
``tools/convert_*.py`` scripts into ``$UNIRESTORE_WEIGHTS`` (default
``./weights``) as .npz pytrees; this module loads them into our param trees.
When a file is missing we fall back to seeded random init and warn once —
the framework stays fully functional (shapes/compiles/training), only
absolute metric values then differ from the pretrained reference.
"""

from __future__ import annotations

import os
import warnings

import jax
import numpy as np

from .train.checkpoints import SEP, tree_unflatten_dict

_WARNED = set()


def weights_dir() -> str:
    return os.environ.get("UNIRESTORE_WEIGHTS", "./weights")


def _warn_once(name):
    if name not in _WARNED:
        _WARNED.add(name)
        warnings.warn(
            f"pretrained weights '{name}' not found under {weights_dir()} — "
            "using random init (convert with tools/convert_*.py)")


def load_npz_tree(name: str, template):
    """Merge ``weights/<name>.npz`` (flat path//keys) into template."""
    path = os.path.join(weights_dir(), f"{name}.npz")
    if not os.path.exists(path):
        _warn_once(name)
        return template, False
    data = np.load(path)
    flat = {k: data[k] for k in data.files}
    merged = tree_unflatten_dict(flat, template)
    # sanity: warn when nothing matched
    n_hit = sum(1 for k in flat if k in
                _flat_keys(template))
    if n_hit == 0:
        _warn_once(name + " (no matching keys)")
        return template, False
    return merged, True


def _flat_keys(tree, prefix=""):
    from .train.checkpoints import tree_flatten_dict
    return set(tree_flatten_dict(tree).keys())


def load_null_embedding(shape):
    """(1, 77, 1024) CLIP-H null-prompt embedding (reference
    sd_null_emb.pt, base_model.py:24-27), converted to .npy offline."""
    path = os.path.join(weights_dir(), "sd_null_emb.npy")
    if not os.path.exists(path):
        _warn_once("sd_null_emb")
        return None
    emb = np.load(path).astype(np.float32)
    if emb.shape != tuple(shape):
        _warn_once(f"sd_null_emb shape {emb.shape} != {tuple(shape)}")
        return None
    return emb


def load_frozen_backbone(frozen, cfg):
    """Load converted sd-turbo weights into the frozen tree in-place-ish."""
    frozen = dict(frozen)
    frozen["vae"], _ = load_npz_tree("sd_turbo_vae", frozen["vae"])
    if "unet" in frozen:
        frozen["unet"], _ = load_npz_tree("sd_turbo_unet", frozen["unet"])
    emb = load_null_embedding(frozen["null_emb"].shape)
    if emb is not None:
        frozen["null_emb"] = jax.numpy.asarray(emb)
    return frozen
