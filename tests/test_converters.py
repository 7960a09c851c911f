"""Structural validation of the offline weight converters: the key sets they
emit must exactly cover our parameter trees (so a real diffusers checkpoint
maps 1:1 once available)."""

import numpy as np
import pytest

from unirestore_tpu.models import unet as UN
from unirestore_tpu.models import vae as VAE
from unirestore_tpu.train.checkpoints import tree_flatten_dict

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_sd_turbo as CST  # noqa: E402


class FakeSD:
    """Mapping that fabricates plausibly-shaped tensors for any requested
    diffusers key, recording what was asked for."""

    def __init__(self):
        self.seen = set()

    def _shape(self, key):
        name = key.rsplit(".", 1)[0]
        leaf = name.rsplit(".", 1)[-1]
        if key.endswith(".bias"):
            return (2,)
        if "norm" in leaf or leaf in ("group_norm",):
            return (2,)
        if leaf in ("to_q", "to_k", "to_v", "proj_in", "proj_out",
                    "linear_1", "linear_2", "time_emb_proj", "proj", "0",
                    "2"):
            return (2, 2)
        return (2, 2, 3, 3)  # conv OIHW

    def __contains__(self, key):
        # SD2.1: down block 3 / up block 0 are plain (no transformer)
        if "down_blocks.3.attentions" in key or \
                "up_blocks.0.attentions" in key:
            return False
        return True

    def __getitem__(self, key):
        self.seen.add(key)
        return np.zeros(self._shape(key), np.float32)


# FakeSD claims every optional diffusers key exists, so the converter will
# also emit optional submodules (shortcuts/time projections) for blocks that
# don't have them in the real architecture — with a real checkpoint those
# keys are absent. Extras limited to these optional patterns are fine.
OPTIONAL = ("conv_shortcut", "time_emb_proj", "downsample", "upsample",
            # transformer qkv are bias-free in SD2.1; FakeSD still offers
            # biases so the converter emits them here (not with a real ckpt)
            "to_q//b", "to_k//b", "to_v//b")


def _check(tree, out):
    ours = set(tree_flatten_dict(tree).keys())
    theirs = set(out.keys())
    missing = ours - theirs
    extra = [k for k in theirs - ours
             if not any(p in k for p in OPTIONAL)]
    assert not missing, f"converter misses {sorted(missing)[:10]}"
    assert not extra, f"converter emits unknown {sorted(extra)[:10]}"


def test_vae_converter_covers_tree():
    import jax
    # key-set check only: eval_shape builds the full-size tree structure
    # without materializing (or compiling) the 80M-param init on 1 vCPU
    tree = jax.eval_shape(
        lambda k: VAE.vae_init(k, VAE.VAEConfig()), jax.random.PRNGKey(0))
    _check(tree, CST.convert_vae(FakeSD()))


def test_unet_converter_covers_tree():
    import jax
    tree = jax.eval_shape(
        lambda k: UN.unet_init(k, UN.UNetConfig()), jax.random.PRNGKey(0))
    _check(tree, CST.convert_unet(FakeSD()))
