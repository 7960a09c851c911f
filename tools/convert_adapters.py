"""Convert the reference's trained adapter checkpoints to our pytree format.

The reference's stage checkpoints contain ONLY adapter weights (frozen SD is
pruned by ``on_save_checkpoint``, base.py:129-136) under these key families
(engine_unifie.py:50-133):

- ``model.ae.vae.encoder.fr_blocks.{stage}.{idx}.*``  -> trainable["cfrm"]
- ``model.base_model.csc_editors.{i}.*``              -> trainable["control"]
- ``model.ae.vae.decoder.task_editors.{i}.*``         -> trainable["tfa"]["editors"]
- ``model.ae.vae.decoder.task_prompts.{task}``        -> trainable["tfa"]["task_prompts"]
- ``model.controller.*``                              -> trainable["controller"]
  (diffusers-block naming; see convert_controller)

The per-module mapping functions are exact (torch OIHW/[out,in] -> our
HWIO/[in,out]) and are exercised against the reference's own torch modules by
tests/test_golden_parity.py.

Usage: python tools/convert_adapters.py <ckpt.(ckpt|pt|npz)> [out_dir]
Emits ``unirestore_adapters.npz`` loadable via checkpoints.load_subtree.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def conv_w(t):
    return np.transpose(np.asarray(t), (2, 3, 1, 0))  # OIHW -> HWIO


def lin_w(t):
    return np.transpose(np.asarray(t), (1, 0))  # (out,in) -> (in,out)


def _conv(sd, pfx):
    p = {"w": conv_w(sd[f"{pfx}.weight"])}
    if f"{pfx}.bias" in sd:
        p["b"] = np.asarray(sd[f"{pfx}.bias"])
    return p


def _lin(sd, pfx):
    p = {"w": lin_w(sd[f"{pfx}.weight"])}
    if f"{pfx}.bias" in sd:
        p["b"] = np.asarray(sd[f"{pfx}.bias"])
    return p


def _norm(sd, pfx):
    return {"scale": np.asarray(sd[f"{pfx}.weight"]),
            "bias": np.asarray(sd[f"{pfx}.bias"])}


# -- NAFNet / CFRM (nafnet_arch.py:28-131, cfrm.py:12-54) -------------------


def convert_naf_block(sd, pfx):
    return {
        "norm1": _norm(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
        "sca": _conv(sd, f"{pfx}.sca.1"),
        "conv3": _conv(sd, f"{pfx}.conv3"),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "conv4": _conv(sd, f"{pfx}.conv4"),
        "conv5": _conv(sd, f"{pfx}.conv5"),
        # torch shape (1, c, 1, 1) -> (c,)
        "beta": np.asarray(sd[f"{pfx}.beta"]).reshape(-1),
        "gamma": np.asarray(sd[f"{pfx}.gamma"]).reshape(-1),
    }


def convert_ada_naf_v2(sd, pfx):
    return {
        "conv_in": _conv(sd, f"{pfx}.conv_in"),
        "group_norm": _norm(sd, f"{pfx}.group_norm"),
        "group_conv": _conv(sd, f"{pfx}.group_conv"),
        "intra_attn": _conv(sd, f"{pfx}.intra_group_attn.1"),
        "inter_attn": _conv(sd, f"{pfx}.inter_group_attn.1"),
        "pwconv": _conv(sd, f"{pfx}.pwconv"),
        "nafblock": convert_naf_block(sd, f"{pfx}.nafblock"),
    }


def convert_cfrm(sd, pfx="model.ae.vae.encoder.fr_blocks", depths=(1, 1, 9)):
    """fr_blocks.{s} is Sequential(NAFBlock x depth, AdaNAFV2)
    (autoencoder.py:92-98)."""
    return [{
        "naf": [convert_naf_block(sd, f"{pfx}.{s}.{i}") for i in range(n)],
        "ada": convert_ada_naf_v2(sd, f"{pfx}.{s}.{n}"),
    } for s, n in enumerate(depths)]


# -- SC-Tuner (scedit.py:24-38) ---------------------------------------------


def convert_csce_adapter(sd, pfx):
    return {
        "proj": _conv(sd, f"{pfx}.proj"),
        "tuner_in": _conv(sd, f"{pfx}.tuner.0"),
        "tuner_out": _conv(sd, f"{pfx}.tuner.2"),
    }


def convert_sc_tuner(sd, pfx="model.base_model.csc_editors", n: int = 12):
    return [convert_csce_adapter(sd, f"{pfx}.{i}") for i in range(n)]


# -- SPADE (spade.py:29-71, alt control mode) --------------------------------


def convert_spade(sd, pfx):
    return {
        "norm": _norm(sd, f"{pfx}.param_free_norm"),
        "mlp_shared": _conv(sd, f"{pfx}.mlp_shared.0"),
        "mlp_gamma": _conv(sd, f"{pfx}.mlp_gamma"),
        "mlp_beta": _conv(sd, f"{pfx}.mlp_beta"),
    }


# -- TFA (taskeditor.py:10-108) ----------------------------------------------


def _tower(sd, pfx):
    # Sequential: 0 InstanceNorm2d (no params), 1 Conv, 2 GELU, 3 Conv, 4 GAP
    return {"conv1": _conv(sd, f"{pfx}.1"), "conv2": _conv(sd, f"{pfx}.3")}


def convert_tfa_level(sd, pfx, last_layer: bool = False):
    p = {
        "t_gate1": _conv(sd, f"{pfx}.t_gate1"),
        "t_gate2": _conv(sd, f"{pfx}.t_gate2"),
        "conv_out": _conv(sd, f"{pfx}.conv_out"),
        "filter_gate": _tower(sd, f"{pfx}.filter_gate"),
        "info_gate": _tower(sd, f"{pfx}.info_gate"),
        "content_trans": _tower(sd, f"{pfx}.content_trans"),
        "out_gate": _lin(sd, f"{pfx}.out_gate.0"),
    }
    if not last_layer:
        p["prompt_trans"] = _lin(sd, f"{pfx}.prompt_trans.0")
    return p


def convert_tfa(sd, pfx="model.ae.vae.decoder"):
    editors = [convert_tfa_level(sd, f"{pfx}.task_editors.{i}",
                                 last_layer=(i == 2)) for i in range(3)]
    prompts = {}
    plen = len(f"{pfx}.task_prompts.")
    for k in sd:
        if k.startswith(f"{pfx}.task_prompts."):
            prompts[k[plen:]] = np.asarray(sd[k])
    return {"task_editors": editors, "task_prompts": prompts}


# -- Controller (controller.py:65-220, diffusers block naming) ---------------


def _resnet(sd, pfx):
    p = {
        "norm1": _norm(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2": _norm(sd, f"{pfx}.norm2"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if f"{pfx}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _lin(sd, f"{pfx}.time_emb_proj")
    if f"{pfx}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return p


def _attn(sd, pfx):
    """Deprecated-style diffusers Attention (residual, biased qkv), as in
    AttnDownBlock2D / UNetMidBlock2D."""
    return {
        "group_norm": _norm(sd, f"{pfx}.group_norm"),
        "attn": {
            "to_q": _lin(sd, f"{pfx}.to_q"),
            "to_k": _lin(sd, f"{pfx}.to_k"),
            "to_v": _lin(sd, f"{pfx}.to_v"),
            "to_out": _lin(sd, f"{pfx}.to_out.0"),
        },
    }


def convert_controller(sd, pfx="model.controller", n_stages: int = 4,
                       num_res_blocks: int = 2):
    """StableSR-config Controller: AttnDownBlock2D x3 + DownBlock2D +
    UNetMidBlock2D + 4 fea_tran ResnetBlock2Ds (controller.py:29-45).
    Attention/downsample presence is detected from the keys, so the
    sdxl/mysd2 stage layouts convert too."""
    p = {
        "time_embedding": {
            "linear_1": _lin(sd, f"{pfx}.time_embedding.linear_1"),
            "linear_2": _lin(sd, f"{pfx}.time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, f"{pfx}.conv_in"),
        "down_blocks": [],
        "fea_tran": [],
    }
    for i in range(n_stages):
        base = f"{pfx}.down_blocks.{i}"
        blk = {"resnets": [], "attentions": []}
        for j in range(num_res_blocks):
            blk["resnets"].append(_resnet(sd, f"{base}.resnets.{j}"))
            if f"{base}.attentions.{j}.to_q.weight" in sd:
                blk["attentions"].append(_attn(sd, f"{base}.attentions.{j}"))
        if f"{base}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = {"conv": _conv(sd,
                                               f"{base}.downsamplers.0.conv")}
        p["down_blocks"].append(blk)
    mid = f"{pfx}.middle_block"
    p["mid"] = {
        "resnet1": _resnet(sd, f"{mid}.resnets.0"),
        "attn": _attn(sd, f"{mid}.attentions.0"),
        "resnet2": _resnet(sd, f"{mid}.resnets.1"),
    }
    for i in range(n_stages):
        p["fea_tran"].append(_resnet(sd, f"{pfx}.fea_tran.{i}"))
    return p


# -- whole-checkpoint conversion ---------------------------------------------


def convert_reference_checkpoint(sd: dict) -> dict:
    """Map whatever adapter families are present in a reference stage
    checkpoint into our ``trainable`` subtree layout."""
    out = {}
    if any(k.startswith("model.ae.vae.encoder.fr_blocks.") for k in sd):
        out["cfrm"] = convert_cfrm(sd)
    if any(k.startswith("model.base_model.csc_editors.") for k in sd):
        out["control"] = convert_sc_tuner(sd)
    if any(k.startswith("model.ae.vae.decoder.task_editors.") for k in sd):
        out["tfa"] = convert_tfa(sd)
    if any(k.startswith("model.controller.") for k in sd):
        out["controller"] = convert_controller(sd, pfx="model.controller")
    return out


def main(src: str, dst: str = None):
    import torch

    dst = dst or os.environ.get("UNIRESTORE_WEIGHTS", "./weights")
    ckpt = torch.load(src, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    tree = convert_reference_checkpoint(sd)
    if not tree:
        raise SystemExit(f"no adapter keys recognized in {src}")

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from unirestore_tpu.train.checkpoints import save_checkpoint

    os.makedirs(dst, exist_ok=True)
    out = os.path.join(dst, "unirestore_adapters.npz")
    save_checkpoint(out, tree, step=0,
                    metadata={"source": os.path.basename(src),
                              "families": sorted(tree)})
    print(f"wrote {out} ({sorted(tree)})")


if __name__ == "__main__":
    main(*sys.argv[1:])
