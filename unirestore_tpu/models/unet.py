"""Controlled SD UNet (UNet2DConditionModel port) — the denoiser, TPU-native.

The reference hand-unrolls the diffusers UNet forward so control can be
injected (base_model.py:94-209): 12 skip tensors from the down path are run
through SC-Tuner adapters (scedit mode, base_model.py:233-238), or a SPADE
layer modulates every ResnetBlock2D's conv2 output (spade mode,
base_model.py:56-92). Text conditioning is a fixed null-prompt embedding
(1, 77, 1024) expanded to batch (base_model.py:24-27, 221).

Here the UNet natively takes a per-scale control list; control modes are
static config. sd-turbo UNet (SD 2.1 arch): block_out_channels
(320, 640, 1280, 1280), CrossAttnDownBlock2D x3 + DownBlock2D down path,
heads (5, 10, 20, 20), cross-attention dim 1024, linear transformer
projections, GroupNorm(32, eps=1e-5).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import embeddings as E
from ..nn import layers as L
from ..nn import resnet as R
from ..nn import transformer as T
from . import scedit as SC
from . import spade as SP


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: tuple = (320, 640, 1280, 1280)
    # True for CrossAttnDownBlock2D (and the mirrored up block), False for
    # plain DownBlock2D/UpBlock2D
    cross_attention: tuple = (True, True, True, False)
    heads: tuple = (5, 10, 20, 20)
    layers_per_block: int = 2
    cross_attention_dim: int = 1024
    norm_num_groups: int = 32
    eps: float = 1e-5
    control_type: str = "scedit"  # "scedit" | "spade" | "none"
    control_channels: int = 256
    # rematerialize each (resnet, attention) unit in the backward pass:
    # without it the XLA-attention backward keeps every S^2 attention map
    # live at once (batch 8 x 5 heads x 4096^2 bf16 = 1.3 GB PER map at
    # 512px), which exhausts one chip's HBM; with it only one unit's
    # internals exist at a time. Enabled by the train steps; a pure
    # forward under jit is unaffected (checkpoint is the identity there)
    remat: bool = False

    @property
    def time_embed_dim(self):
        return self.block_out_channels[0] * 4

    def skip_channels(self):
        """Channels of down_block_res_samples, in capture order."""
        chans = [self.block_out_channels[0]]  # conv_in output
        for i, c in enumerate(self.block_out_channels):
            chans += [c] * self.layers_per_block
            if i < len(self.block_out_channels) - 1:
                chans.append(c)  # downsample output
        return chans

    def skip_scale_indices(self):
        """Control-scale index (0 = full latent res) per skip tensor."""
        idxs = [0]
        for i in range(len(self.block_out_channels)):
            idxs += [i] * self.layers_per_block
            if i < len(self.block_out_channels) - 1:
                idxs.append(i + 1)
        return idxs


def tiny_unet_config(control_type: str = "scedit"):
    return UNetConfig(block_out_channels=(32, 64, 64, 64), heads=(2, 2, 2, 2),
                      cross_attention_dim=64, control_type=control_type,
                      control_channels=32)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def unet_init(key, cfg: UNetConfig, dtype=jnp.float32):
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 256))
    p = {
        "conv_in": L.conv2d_init(next(keys), cfg.in_channels, chans[0], 3,
                                 dtype=dtype),
        "time_embedding": E.timestep_mlp_init(next(keys), chans[0],
                                              cfg.time_embed_dim, dtype),
    }
    temb = cfg.time_embed_dim

    down = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(R.resnet_block_init(
                next(keys), cin if j == 0 else cout, cout, temb, dtype))
            if cfg.cross_attention[i]:
                blk["attentions"].append(T.transformer_2d_init(
                    next(keys), cout, cfg.heads[i], cfg.cross_attention_dim,
                    dtype=dtype))
        if i < len(chans) - 1:
            blk["downsample"] = R.downsample_init(next(keys), cout, dtype)
        down.append(blk)
        cin = cout
    p["down_blocks"] = down

    cmid = chans[-1]
    p["mid"] = {
        "resnet1": R.resnet_block_init(next(keys), cmid, cmid, temb, dtype),
        "attn": T.transformer_2d_init(next(keys), cmid, cfg.heads[-1],
                                      cfg.cross_attention_dim, dtype=dtype),
        "resnet2": R.resnet_block_init(next(keys), cmid, cmid, temb, dtype),
    }

    up = []
    rev = list(reversed(chans))
    skip_chans = cfg.skip_channels()
    prev_out = cmid
    for i, cout in enumerate(rev):
        blk_idx = len(chans) - 1 - i  # mirrored down block index
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.layers_per_block + 1):
            skip_c = skip_chans.pop()
            res_in = (prev_out if j == 0 else cout) + skip_c
            blk["resnets"].append(R.resnet_block_init(next(keys), res_in, cout,
                                                      temb, dtype))
            if cfg.cross_attention[blk_idx]:
                blk["attentions"].append(T.transformer_2d_init(
                    next(keys), cout, cfg.heads[blk_idx],
                    cfg.cross_attention_dim, dtype=dtype))
        if i < len(chans) - 1:
            blk["upsample"] = R.upsample_init(next(keys), cout, dtype)
        up.append(blk)
        prev_out = cout
    p["up_blocks"] = up

    p["conv_norm_out"] = L.norm_init(chans[0], dtype)
    p["conv_out"] = L.conv2d_init(next(keys), chans[0], cfg.out_channels, 3,
                                  dtype=dtype)
    return p


def control_adapters_init(key, cfg: UNetConfig, dtype=jnp.float32):
    """Trainable control-injection params for the configured mode."""
    if cfg.control_type == "scedit":
        return {"csc_editors": SC.sc_tuner_init(key, cfg.skip_channels(),
                                                cfg.control_channels, dtype)}
    if cfg.control_type == "spade":
        # one SPADE per ResnetBlock2D in the UNet, in traversal order
        spades = {"down": [], "mid": [], "up": []}
        keys = iter(jax.random.split(key, 64))
        chans = cfg.block_out_channels
        for i, cout in enumerate(chans):
            spades["down"].append([
                SP.spade_init(next(keys), cout, cfg.control_channels, dtype)
                for _ in range(cfg.layers_per_block)])
        spades["mid"] = [SP.spade_init(next(keys), chans[-1],
                                       cfg.control_channels, dtype)
                         for _ in range(2)]
        for i, cout in enumerate(reversed(chans)):
            spades["up"].append([
                SP.spade_init(next(keys), cout, cfg.control_channels, dtype)
                for _ in range(cfg.layers_per_block + 1)])
        return {"spades": spades}
    return {}


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _unit(cfg, scale_idx):
    """One rematerializable (ResnetBlock2D, Transformer2D) unit.

    ``attn_p`` may be None (plain Down/UpBlock2D). With ``cfg.remat`` the
    unit is wrapped in ``jax.checkpoint`` — see UNetConfig.remat."""
    def unit(res_p, attn_p, h, temb, encoder_hidden_states, control,
             spade_p):
        h = _resnet_maybe_spade(res_p, h, temb, cfg, spade_p, control,
                                scale_idx)
        if attn_p is not None:
            h = T.transformer_2d(attn_p, h, encoder_hidden_states,
                                 heads=cfg.heads[scale_idx],
                                 groups=cfg.norm_num_groups)
        return h

    return jax.checkpoint(unit) if cfg.remat else unit


def _resnet_maybe_spade(p_res, x, temb, cfg, spade_p, control, scale_idx):
    """ResnetBlock2D, optionally with SPADE after conv2 (base_model.py:56-92)."""
    if spade_p is None:
        return R.resnet_block(p_res, x, temb, groups=cfg.norm_num_groups,
                              eps=cfg.eps)
    h = L.group_norm(p_res["norm1"], x, groups=cfg.norm_num_groups, eps=cfg.eps)
    h = L.silu(h)
    h = L.conv2d(p_res["conv1"], h, padding=1)
    if "time_emb_proj" in p_res:
        t = L.linear(p_res["time_emb_proj"], L.silu(temb))
        h = h + t[:, None, None, :].astype(h.dtype)
    h = L.group_norm(p_res["norm2"], h, groups=cfg.norm_num_groups, eps=cfg.eps)
    h = L.silu(h)
    h = L.conv2d(p_res["conv2"], h, padding=1)
    h = SP.spade(spade_p, h, control[scale_idx])
    if "conv_shortcut" in p_res:
        x = L.conv2d(p_res["conv_shortcut"], x, padding=0)
    return x + h


def unet_time_embedding(p, cfg: UNetConfig, timesteps, dtype):
    temb = E.sinusoidal_timestep_embedding(timesteps,
                                           cfg.block_out_channels[0])
    return E.timestep_mlp(p["time_embedding"], temb.astype(dtype))


def unet_encode(p, cfg: UNetConfig, sample, emb, encoder_hidden_states,
                control=None, control_params=None):
    """UNet down path + mid + SC-Tuner skip injection
    (base_model.py:94-162, 233-238). Returns (h_mid, skips).

    Split out from ``unet_apply`` so the DDIM loop can propagate encoder
    features across adjacent timesteps ("Faster Diffusion",
    arXiv:2312.09608) and run only ``unet_decode`` at non-key steps.
    """
    use_scedit = (control is not None and control_params is not None
                  and "csc_editors" in control_params)
    use_spade = (control is not None and control_params is not None
                 and "spades" in control_params)
    spades = control_params["spades"] if use_spade else None

    h = L.conv2d(p["conv_in"], sample, padding=1)

    skips = [h]
    scale_idxs = cfg.skip_scale_indices()
    for i, blk in enumerate(p["down_blocks"]):
        for j, res in enumerate(blk["resnets"]):
            sp = spades["down"][i][j] if use_spade else None
            attn = blk["attentions"][j] if blk["attentions"] else None
            h = _unit(cfg, i)(res, attn, h, emb, encoder_hidden_states,
                              control, sp)
            skips.append(h)
        if "downsample" in blk:
            h = R.downsample(blk["downsample"], h)
            skips.append(h)

    n_levels = len(cfg.block_out_channels)

    def mid(p_mid, h, emb, encoder_hidden_states, control, sp1, sp2):
        h = _resnet_maybe_spade(p_mid["resnet1"], h, emb, cfg, sp1, control,
                                n_levels - 1)
        h = T.transformer_2d(p_mid["attn"], h, encoder_hidden_states,
                             heads=cfg.heads[-1], groups=cfg.norm_num_groups)
        return _resnet_maybe_spade(p_mid["resnet2"], h, emb, cfg, sp2,
                                   control, n_levels - 1)

    if cfg.remat:
        mid = jax.checkpoint(mid)
    h = mid(p["mid"], h, emb, encoder_hidden_states, control,
            spades["mid"][0] if use_spade else None,
            spades["mid"][1] if use_spade else None)

    # SC-Tuner injection on the captured skips (base_model.py:233-238)
    if use_scedit:
        skips = [SC.csce_adapter(ed, s, control[si])
                 for ed, s, si in zip(control_params["csc_editors"], skips,
                                      scale_idxs)]
    return h, skips


def unet_decode(p, cfg: UNetConfig, h, skips, emb, encoder_hidden_states,
                control=None, control_params=None, return_deep: bool = False):
    """UNet up path + head (base_model.py:164-209). ``skips`` is not
    mutated.

    With ``return_deep=True`` also returns the input feature of the
    shallowest up block (after the previous block's upsample) — the tensor
    cached by the DeepCache-style inference mode (arXiv:2312.00858), see
    ``unet_up_shallow``.
    """
    use_spade = (control is not None and control_params is not None
                 and "spades" in control_params)
    spades = control_params["spades"] if use_spade else None
    skips = list(skips)

    n_levels = len(cfg.block_out_channels)
    deep = None
    for i, blk in enumerate(p["up_blocks"]):
        if i == len(p["up_blocks"]) - 1:
            deep = h
        blk_idx = n_levels - 1 - i
        for j, res in enumerate(blk["resnets"]):
            skip = skips.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            sp = spades["up"][i][j] if use_spade else None
            attn = blk["attentions"][j] if blk["attentions"] else None
            h = _unit(cfg, blk_idx)(res, attn, h, emb,
                                    encoder_hidden_states, control, sp)
        if "upsample" in blk:
            h = R.upsample(blk["upsample"], h)

    h = L.silu(L.group_norm(p["conv_norm_out"], h, groups=cfg.norm_num_groups,
                            eps=cfg.eps))
    h = L.conv2d(p["conv_out"], h, padding=1)
    if return_deep:
        return h, deep
    return h


def unet_down_shallow(p, cfg: UNetConfig, sample, emb, encoder_hidden_states,
                      control=None, control_params=None):
    """Level-0 down path only: conv_in + the first down block's resnets
    (+ attention), WITHOUT its downsample — everything deeper is served
    from the DeepCache-cached feature at follower steps. Returns the three
    full-resolution skips (after SC-Tuner injection when configured),
    matching the tensors ``unet_decode``'s last up block pops."""
    use_scedit = (control is not None and control_params is not None
                  and "csc_editors" in control_params)
    use_spade = (control is not None and control_params is not None
                 and "spades" in control_params)
    spades = control_params["spades"] if use_spade else None

    h = L.conv2d(p["conv_in"], sample, padding=1)
    skips = [h]
    blk = p["down_blocks"][0]
    for j, res in enumerate(blk["resnets"]):
        sp = spades["down"][0][j] if use_spade else None
        h = _resnet_maybe_spade(res, h, emb, cfg, sp, control, 0)
        if blk["attentions"]:
            h = T.transformer_2d(blk["attentions"][j], h,
                                 encoder_hidden_states, heads=cfg.heads[0],
                                 groups=cfg.norm_num_groups)
        skips.append(h)
    if use_scedit:
        # the first len(skips) editors/scale-indices are the level-0 ones
        skips = [SC.csce_adapter(ed, s, control[0])
                 for ed, s in zip(control_params["csc_editors"], skips)]
    return skips


def unet_up_shallow(p, cfg: UNetConfig, deep, skips0, emb,
                    encoder_hidden_states, control=None, control_params=None):
    """Shallowest up block + head, fed by the cached deep feature
    (``deep`` = what the full forward passes into its last up block) and
    the level-0 skips from ``unet_down_shallow``."""
    use_spade = (control is not None and control_params is not None
                 and "spades" in control_params)
    spades = control_params["spades"] if use_spade else None
    skips = list(skips0)

    i = len(p["up_blocks"]) - 1
    blk = p["up_blocks"][i]
    h = deep
    for j, res in enumerate(blk["resnets"]):
        skip = skips.pop()
        h = jnp.concatenate([h, skip], axis=-1)
        sp = spades["up"][i][j] if use_spade else None
        h = _resnet_maybe_spade(res, h, emb, cfg, sp, control, 0)
        if blk["attentions"]:
            h = T.transformer_2d(blk["attentions"][j], h,
                                 encoder_hidden_states, heads=cfg.heads[0],
                                 groups=cfg.norm_num_groups)

    h = L.silu(L.group_norm(p["conv_norm_out"], h, groups=cfg.norm_num_groups,
                            eps=cfg.eps))
    return L.conv2d(p["conv_out"], h, padding=1)


def unet_apply(p, cfg: UNetConfig, sample, timesteps, encoder_hidden_states,
               control=None, control_params=None):
    """Full controlled UNet forward (base_model.py:211-245).

    Args:
        sample: (B, h, w, 4) noisy latent, NHWC.
        timesteps: (B,) int32.
        encoder_hidden_states: (B, 77, 1024) text context (null embedding).
        control: list of per-scale control maps [(B, h, w, Cc), (B, h/2, ...),
            ...] indexed by downsample level, or None.
        control_params: adapter params from ``control_adapters_init``.
    """
    emb = unet_time_embedding(p, cfg, timesteps, sample.dtype)
    h, skips = unet_encode(p, cfg, sample, emb, encoder_hidden_states,
                           control, control_params)
    return unet_decode(p, cfg, h, skips, emb, encoder_hidden_states,
                       control, control_params)
