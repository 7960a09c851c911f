"""Controller — StableSR-style control encoder, TPU-native.

Maps the degraded latent + timestep to per-scale 256-channel control maps
consumed by the SC-Tuner/SPADE injections. Reference: controller.py:65-220
with ``stablesr_config`` (controller.py:29-45): model channels 256, mult
(1, 1, 2, 2), 2 res blocks per stage, AttnDownBlock2D x3 + DownBlock2D,
UNetMidBlock2D, 4 heads, conv downsample.

Per-stage capture is the last pre-downsample activation (``output[-2]``,
controller.py:205); the mid output replaces the deepest capture
(controller.py:211). Each capture passes through a ``fea_tran``
ResnetBlock2D to 256 channels. ControlNet-style zero-init: every
ResnetBlock2D conv2 and every Attention out-projection start at zero
(controller.py:174-185), so control contributions start as pure biases that
grow during training.

Returns a list of control maps indexed by scale (0 = latent res /1 ... 3 =
latent res /8), replacing the reference's spatial-size-keyed dict with a
static trace-time index.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import attention as A
from ..nn import embeddings as E
from ..nn import layers as L
from ..nn import resnet as R


@dataclasses.dataclass(frozen=True)
class ControllerConfig:
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 256
    num_res_blocks: int = 2
    channel_mult: tuple = (1, 1, 2, 2)
    num_heads: int = 4
    # attention in the first three down stages, none in the last (stablesr)
    attn_stages: tuple = (True, True, True, False)
    norm_num_groups: int = 32
    eps: float = 1e-5

    @property
    def time_embed_dim(self):
        return self.model_channels * 4


def tiny_controller_config():
    return ControllerConfig(model_channels=32, out_channels=32, num_heads=2)


def _zero(p):
    return jax.tree.map(jnp.zeros_like, p)


def controller_init(key, cfg: ControllerConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 128))
    temb = cfg.time_embed_dim
    p = {
        "time_embedding": E.timestep_mlp_init(next(keys), cfg.model_channels,
                                              temb, dtype),
        "conv_in": L.conv2d_init(next(keys), cfg.in_channels,
                                 cfg.model_channels, 3, dtype=dtype),
    }

    down = []
    stage_chans = []
    cin = cfg.model_channels
    n = len(cfg.channel_mult)
    for i, mult in enumerate(cfg.channel_mult):
        cout = cfg.model_channels * mult
        blk = {"resnets": [], "attentions": []}
        for j in range(cfg.num_res_blocks):
            rp = R.resnet_block_init(next(keys), cin if j == 0 else cout, cout,
                                     temb, dtype)
            rp["conv2"] = _zero(rp["conv2"])  # ControlNet-style zero conv
            blk["resnets"].append(rp)
            if cfg.attn_stages[i]:
                ap = A.spatial_self_attention_init(next(keys), cout,
                                                   cfg.num_heads, dtype)
                ap["attn"]["to_out"] = _zero(ap["attn"]["to_out"])
                blk["attentions"].append(ap)
        if i < n - 1:
            blk["downsample"] = R.downsample_init(next(keys), cout, dtype)
        down.append(blk)
        stage_chans.append(cout)
        cin = cout
    p["down_blocks"] = down

    cmid = stage_chans[-1]
    mid = {
        "resnet1": R.resnet_block_init(next(keys), cmid, cmid, temb, dtype),
        "attn": A.spatial_self_attention_init(next(keys), cmid, cfg.num_heads,
                                              dtype),
        "resnet2": R.resnet_block_init(next(keys), cmid, cmid, temb, dtype),
    }
    mid["resnet1"]["conv2"] = _zero(mid["resnet1"]["conv2"])
    mid["resnet2"]["conv2"] = _zero(mid["resnet2"]["conv2"])
    mid["attn"]["attn"]["to_out"] = _zero(mid["attn"]["attn"]["to_out"])
    p["mid"] = mid

    p["fea_tran"] = []
    for c in stage_chans:
        rp = R.resnet_block_init(next(keys), c, cfg.out_channels, temb, dtype)
        rp["conv2"] = _zero(rp["conv2"])
        p["fea_tran"].append(rp)
    return p


def controller_apply(p, cfg: ControllerConfig, x, timesteps):
    """Returns [c0, c1, c2, c3]: control maps at latent res /1, /2, /4, /8."""
    temb = E.sinusoidal_timestep_embedding(timesteps, cfg.model_channels)
    emb = E.timestep_mlp(p["time_embedding"], temb.astype(x.dtype))

    h = L.conv2d(p["conv_in"], x, padding=1)
    captures = []
    for i, blk in enumerate(p["down_blocks"]):
        for j, res in enumerate(blk["resnets"]):
            h = R.resnet_block(res, h, emb, groups=cfg.norm_num_groups,
                               eps=cfg.eps)
            if blk["attentions"]:
                h = A.spatial_self_attention(blk["attentions"][j], h,
                                             heads=cfg.num_heads,
                                             groups=cfg.norm_num_groups,
                                             eps=cfg.eps)
        captures.append(h)  # pre-downsample capture (= reference output[-2])
        if "downsample" in blk:
            h = R.downsample(blk["downsample"], h)

    h = R.resnet_block(p["mid"]["resnet1"], h, emb, groups=cfg.norm_num_groups,
                       eps=cfg.eps)
    h = A.spatial_self_attention(p["mid"]["attn"], h, heads=cfg.num_heads,
                                 groups=cfg.norm_num_groups, eps=cfg.eps)
    h = R.resnet_block(p["mid"]["resnet2"], h, emb, groups=cfg.norm_num_groups,
                       eps=cfg.eps)
    captures[-1] = h  # mid replaces the deepest capture (controller.py:211)

    return [R.resnet_block(ft, c, emb, groups=cfg.norm_num_groups, eps=cfg.eps)
            for ft, c in zip(p["fea_tran"], captures)]
