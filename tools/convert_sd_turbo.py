"""Offline converter: diffusers sd-turbo checkpoint -> unirestore_tpu npz.

Run on a machine with the HuggingFace checkpoint downloaded (zero-egress
images import the produced npz files):

    python tools/convert_sd_turbo.py /path/to/sd-turbo ./weights

Maps the diffusers state dicts (vae/diffusion_pytorch_model.safetensors,
unet/diffusion_pytorch_model.safetensors) onto our NHWC pytrees:
conv OIHW -> HWIO, linear (out,in) -> (in,out). Reference model identity:
``AutoencoderKL/UNet2DConditionModel.from_pretrained("stabilityai/sd-turbo")``
(reference unifie.py:40,60).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.train.checkpoints import SEP  # noqa: E402


def _load_state_dict(path):
    if path.endswith(".safetensors"):
        from safetensors import safe_open
        out = {}
        with safe_open(path, framework="numpy") as f:
            for k in f.keys():
                out[k] = f.get_tensor(k)
        return out
    import torch
    sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() for k, v in sd.items()}


def conv_w(t):
    return np.transpose(t, (2, 3, 1, 0))  # OIHW -> HWIO


def lin_w(t):
    return np.transpose(t, (1, 0))  # (out,in) -> (in,out)


def _put_conv(out, ours, theirs, sd):
    out[f"{ours}{SEP}w"] = conv_w(sd[f"{theirs}.weight"])
    if f"{theirs}.bias" in sd:
        out[f"{ours}{SEP}b"] = sd[f"{theirs}.bias"]


def _put_lin(out, ours, theirs, sd):
    out[f"{ours}{SEP}w"] = lin_w(sd[f"{theirs}.weight"])
    if f"{theirs}.bias" in sd:
        out[f"{ours}{SEP}b"] = sd[f"{theirs}.bias"]


def _put_norm(out, ours, theirs, sd):
    out[f"{ours}{SEP}scale"] = sd[f"{theirs}.weight"]
    out[f"{ours}{SEP}bias"] = sd[f"{theirs}.bias"]


def _put_resnet(out, ours, theirs, sd):
    _put_norm(out, f"{ours}{SEP}norm1", f"{theirs}.norm1", sd)
    _put_conv(out, f"{ours}{SEP}conv1", f"{theirs}.conv1", sd)
    _put_norm(out, f"{ours}{SEP}norm2", f"{theirs}.norm2", sd)
    _put_conv(out, f"{ours}{SEP}conv2", f"{theirs}.conv2", sd)
    if f"{theirs}.time_emb_proj.weight" in sd:
        _put_lin(out, f"{ours}{SEP}time_emb_proj", f"{theirs}.time_emb_proj",
                 sd)
    if f"{theirs}.conv_shortcut.weight" in sd:
        _put_conv(out, f"{ours}{SEP}conv_shortcut", f"{theirs}.conv_shortcut",
                  sd)


def _put_vae_attn(out, ours, theirs, sd):
    _put_norm(out, f"{ours}{SEP}group_norm", f"{theirs}.group_norm", sd)
    for q in ("to_q", "to_k", "to_v"):
        _put_lin(out, f"{ours}{SEP}attn{SEP}{q}", f"{theirs}.{q}", sd)
    _put_lin(out, f"{ours}{SEP}attn{SEP}to_out", f"{theirs}.to_out.0", sd)


def convert_vae(sd: dict) -> dict:
    out = {}
    # encoder
    _put_conv(out, f"encoder{SEP}conv_in", "encoder.conv_in", sd)
    for i in range(4):
        base = f"encoder.down_blocks.{i}"
        for j in range(2):
            _put_resnet(out, f"encoder{SEP}down_blocks{SEP}{i}{SEP}resnets"
                        f"{SEP}{j}", f"{base}.resnets.{j}", sd)
        if f"{base}.downsamplers.0.conv.weight" in sd:
            _put_conv(out, f"encoder{SEP}down_blocks{SEP}{i}{SEP}downsample"
                      f"{SEP}conv", f"{base}.downsamplers.0.conv", sd)
    _put_resnet(out, f"encoder{SEP}mid{SEP}resnet1",
                "encoder.mid_block.resnets.0", sd)
    _put_vae_attn(out, f"encoder{SEP}mid{SEP}attn",
                  "encoder.mid_block.attentions.0", sd)
    _put_resnet(out, f"encoder{SEP}mid{SEP}resnet2",
                "encoder.mid_block.resnets.1", sd)
    _put_norm(out, f"encoder{SEP}conv_norm_out", "encoder.conv_norm_out", sd)
    _put_conv(out, f"encoder{SEP}conv_out", "encoder.conv_out", sd)
    _put_conv(out, "quant_conv", "quant_conv", sd)
    _put_conv(out, "post_quant_conv", "post_quant_conv", sd)
    # decoder
    _put_conv(out, f"decoder{SEP}conv_in", "decoder.conv_in", sd)
    _put_resnet(out, f"decoder{SEP}mid{SEP}resnet1",
                "decoder.mid_block.resnets.0", sd)
    _put_vae_attn(out, f"decoder{SEP}mid{SEP}attn",
                  "decoder.mid_block.attentions.0", sd)
    _put_resnet(out, f"decoder{SEP}mid{SEP}resnet2",
                "decoder.mid_block.resnets.1", sd)
    for i in range(4):
        base = f"decoder.up_blocks.{i}"
        for j in range(3):
            _put_resnet(out, f"decoder{SEP}up_blocks{SEP}{i}{SEP}resnets"
                        f"{SEP}{j}", f"{base}.resnets.{j}", sd)
        if f"{base}.upsamplers.0.conv.weight" in sd:
            _put_conv(out, f"decoder{SEP}up_blocks{SEP}{i}{SEP}upsample"
                      f"{SEP}conv", f"{base}.upsamplers.0.conv", sd)
    _put_norm(out, f"decoder{SEP}conv_norm_out", "decoder.conv_norm_out", sd)
    _put_conv(out, f"decoder{SEP}conv_out", "decoder.conv_out", sd)
    return out


def _put_tblock(out, ours, theirs, sd):
    """Transformer2DModel with use_linear_projection=True."""
    _put_norm(out, f"{ours}{SEP}norm", f"{theirs}.norm", sd)
    _put_lin(out, f"{ours}{SEP}proj_in", f"{theirs}.proj_in", sd)
    tb = f"{theirs}.transformer_blocks.0"
    o = f"{ours}{SEP}blocks{SEP}0"
    for n in ("norm1", "norm2", "norm3"):
        _put_norm(out, f"{o}{SEP}{n}", f"{tb}.{n}", sd)
    for attn in ("attn1", "attn2"):
        for q in ("to_q", "to_k", "to_v"):
            _put_lin(out, f"{o}{SEP}{attn}{SEP}{q}", f"{tb}.{attn}.{q}", sd)
        _put_lin(out, f"{o}{SEP}{attn}{SEP}to_out", f"{tb}.{attn}.to_out.0",
                 sd)
    _put_lin(out, f"{o}{SEP}ff_in", f"{tb}.ff.net.0.proj", sd)
    _put_lin(out, f"{o}{SEP}ff_out", f"{tb}.ff.net.2", sd)
    _put_lin(out, f"{ours}{SEP}proj_out", f"{theirs}.proj_out", sd)


def convert_unet(sd: dict) -> dict:
    out = {}
    _put_conv(out, "conv_in", "conv_in", sd)
    _put_lin(out, f"time_embedding{SEP}linear_1", "time_embedding.linear_1",
             sd)
    _put_lin(out, f"time_embedding{SEP}linear_2", "time_embedding.linear_2",
             sd)
    for i in range(4):
        base = f"down_blocks.{i}"
        ours = f"down_blocks{SEP}{i}"
        for j in range(2):
            _put_resnet(out, f"{ours}{SEP}resnets{SEP}{j}",
                        f"{base}.resnets.{j}", sd)
            if f"{base}.attentions.{j}.proj_in.weight" in sd:
                _put_tblock(out, f"{ours}{SEP}attentions{SEP}{j}",
                            f"{base}.attentions.{j}", sd)
        if f"{base}.downsamplers.0.conv.weight" in sd:
            _put_conv(out, f"{ours}{SEP}downsample{SEP}conv",
                      f"{base}.downsamplers.0.conv", sd)
    _put_resnet(out, f"mid{SEP}resnet1", "mid_block.resnets.0", sd)
    _put_tblock(out, f"mid{SEP}attn", "mid_block.attentions.0", sd)
    _put_resnet(out, f"mid{SEP}resnet2", "mid_block.resnets.1", sd)
    for i in range(4):
        base = f"up_blocks.{i}"
        ours = f"up_blocks{SEP}{i}"
        for j in range(3):
            _put_resnet(out, f"{ours}{SEP}resnets{SEP}{j}",
                        f"{base}.resnets.{j}", sd)
            if f"{base}.attentions.{j}.proj_in.weight" in sd:
                _put_tblock(out, f"{ours}{SEP}attentions{SEP}{j}",
                            f"{base}.attentions.{j}", sd)
        if f"{base}.upsamplers.0.conv.weight" in sd:
            _put_conv(out, f"{ours}{SEP}upsample{SEP}conv",
                      f"{base}.upsamplers.0.conv", sd)
    _put_norm(out, "conv_norm_out", "conv_norm_out", sd)
    _put_conv(out, "conv_out", "conv_out", sd)
    return out


def main(src: str, dst: str = "./weights"):
    os.makedirs(dst, exist_ok=True)
    for sub, convert, name in (("vae", convert_vae, "sd_turbo_vae"),
                               ("unet", convert_unet, "sd_turbo_unet")):
        for fname in ("diffusion_pytorch_model.safetensors",
                      "diffusion_pytorch_model.bin"):
            path = os.path.join(src, sub, fname)
            if os.path.exists(path):
                sd = _load_state_dict(path)
                out = convert(sd)
                np.savez(os.path.join(dst, f"{name}.npz"), **out)
                print(f"wrote {name}.npz ({len(out)} tensors)")
                break
        else:
            print(f"!! {sub} checkpoint not found under {src}")


if __name__ == "__main__":
    main(*sys.argv[1:])
