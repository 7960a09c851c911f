"""Key/shape coverage of the reference-adapter checkpoint converter: a
checkpoint built from the reference's OWN modules (full channel sizes) must
convert into trees that exactly match our full-size trainable subtree
layouts (keys AND shapes)."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unirestore_tpu.models import cfrm as CFRM  # noqa: E402
from unirestore_tpu.models import scedit as SC  # noqa: E402
from unirestore_tpu.models import tfa as TFA  # noqa: E402
from unirestore_tpu.train.checkpoints import tree_flatten_dict  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_adapters as CA  # noqa: E402
from test_golden_parity import _ref_module  # noqa: E402

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/src/modules/diffuie"),
    reason="reference not available")


def _flat_shapes(tree):
    return {k: tuple(np.shape(v)) for k, v in tree_flatten_dict(tree).items()}


def _assert_same_layout(converted, ours):
    a, b = _flat_shapes(converted), _flat_shapes(ours)
    assert set(a) == set(b), (
        f"missing={sorted(set(b) - set(a))[:8]} "
        f"extra={sorted(set(a) - set(b))[:8]}")
    mismatched = {k: (a[k], b[k]) for k in a if a[k] != b[k]}
    assert not mismatched, f"shape mismatches: {mismatched}"


def test_reference_adapter_checkpoint_full_coverage():
    naf = _ref_module("nafnet_arch")
    cf = _ref_module("cfrm")
    sce = _ref_module("scedit")
    te = _ref_module("taskeditor")

    sd = {}
    # CFRM: Sequential(NAFBlock x depth, AdaNAFV2) per stage
    # (autoencoder.py:92-98)
    for s, (c, depth) in enumerate(((128, 1), (256, 1), (512, 9))):
        stage = torch.nn.Sequential(
            *[naf.NAFBlock(c) for _ in range(depth)], cf.AdaNAFV2(c))
        for k, v in stage.state_dict().items():
            sd[f"model.ae.vae.encoder.fr_blocks.{s}.{k}"] = v.numpy()
    # SC-Tuner: 12 CSCEAdapters, c_emb = c_in (base_model.py:38-43)
    for i, c in enumerate([320] * 4 + [640] * 3 + [1280] * 5):
        ad = sce.CSCEAdapter(c, c, 256)
        for k, v in ad.state_dict().items():
            sd[f"model.base_model.csc_editors.{i}.{k}"] = v.numpy()
    # TFA: 3 editors (512/256/128 skips) + per-task prompts
    # (autoencoder.py:117-126)
    for i, (cs, last) in enumerate(((512, False), (256, False),
                                    (128, True))):
        ed = te.TaskFeatureAdapter(512, cs, prompt_len=1, last_layer=last)
        for k, v in ed.state_dict().items():
            sd[f"model.ae.vae.decoder.task_editors.{i}.{k}"] = v.numpy()
    for task in ("ir", "cls", "seg"):
        sd[f"model.ae.vae.decoder.task_prompts.{task}"] = \
            np.zeros((1, 512), np.float32)

    tree = CA.convert_reference_checkpoint(sd)
    assert set(tree) == {"cfrm", "control", "tfa"}

    key = jax.random.PRNGKey(0)
    _assert_same_layout(tree["cfrm"], CFRM.cfrm_init(key))
    _assert_same_layout(tree["control"], SC.sc_tuner_init(key))
    _assert_same_layout(
        tree["tfa"],
        {"task_editors": TFA.tfa_init(key),
         "task_prompts": TFA.task_prompts_init(("ir", "cls", "seg"))})


def _fake_controller_sd(pfx="model.controller"):
    """The reference Controller's state-dict key set under stablesr_config
    (controller.py:29-45): channels 256, mult (1,1,2,2), 2 resnets/stage,
    AttnDownBlock2D x3 + DownBlock2D, UNetMidBlock2D, conv downsample.
    Shapes follow the diffusers module definitions (torch OIHW / [out,in])."""
    sd = {}

    def conv(name, cout, cin, k=3):
        sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def lin(name, cout, cin):
        sd[f"{name}.weight"] = np.zeros((cout, cin), np.float32)
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)

    def norm(name, c):
        sd[f"{name}.weight"] = np.zeros((c,), np.float32)
        sd[f"{name}.bias"] = np.zeros((c,), np.float32)

    def resnet(name, cin, cout, temb=1024):
        norm(f"{name}.norm1", cin)
        conv(f"{name}.conv1", cout, cin)
        lin(f"{name}.time_emb_proj", cout, temb)
        norm(f"{name}.norm2", cout)
        conv(f"{name}.conv2", cout, cout)
        if cin != cout:
            conv(f"{name}.conv_shortcut", cout, cin, k=1)

    def attn(name, c):
        norm(f"{name}.group_norm", c)
        for q in ("to_q", "to_k", "to_v"):
            lin(f"{name}.{q}", c, c)
        lin(f"{name}.to_out.0", c, c)

    lin(f"{pfx}.time_embedding.linear_1", 1024, 256)
    lin(f"{pfx}.time_embedding.linear_2", 1024, 1024)
    conv(f"{pfx}.conv_in", 256, 4)
    chans = [256, 256, 512, 512]
    cin = 256
    for i, cout in enumerate(chans):
        base = f"{pfx}.down_blocks.{i}"
        for j in range(2):
            resnet(f"{base}.resnets.{j}", cin if j == 0 else cout, cout)
            if i < 3:  # AttnDownBlock2D stages
                attn(f"{base}.attentions.{j}", cout)
        if i < 3:
            conv(f"{base}.downsamplers.0.conv", cout, cout)
        cin = cout
    resnet(f"{pfx}.middle_block.resnets.0", 512, 512)
    attn(f"{pfx}.middle_block.attentions.0", 512)
    resnet(f"{pfx}.middle_block.resnets.1", 512, 512)
    for i, c in enumerate(chans):
        resnet(f"{pfx}.fea_tran.{i}", c, 256)
    return sd


def test_controller_conversion_full_coverage():
    """The Controller can't be instantiated here (diffusers absent), so the
    fake state dict transcribes the diffusers key naming; conversion must
    exactly cover our controller_init layout (keys and shapes)."""
    from unirestore_tpu.models import controller as CTRL

    sd = _fake_controller_sd()
    tree = CA.convert_reference_checkpoint(sd)
    assert set(tree) == {"controller"}
    ours = CTRL.controller_init(jax.random.PRNGKey(0),
                                CTRL.ControllerConfig())
    _assert_same_layout(tree["controller"], ours)
