"""Skip-connected SD VAE (AutoencoderKL port) with CFRM and TFA, TPU-native.

The reference monkey-patches the diffusers VAE encoder/decoder forwards to
(1) splice CFRM stages after the first three encoder down blocks, capture the
restored features as skips, and cut gradients into the latent path
(autoencoder.py:11-35); and (2) thread task prompts through three TaskEditors
before the first three decoder up blocks (autoencoder.py:37-72).

Here those hooks are first-class: the encoder natively returns skips, the
decoder natively accepts (skips, task prompt). ``enable_fr`` and ``task`` are
trace-time (static) choices — the finite task set yields one cached jit per
task instead of dynamic control flow.

sd-turbo VAE config: block_out_channels (128, 256, 512, 512), 2 res layers
per encoder block (3 per decoder block), 4 latent channels, GroupNorm(32,
eps=1e-6), single-head mid attention, scaling_factor 0.18215.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..nn import attention as A
from ..nn import layers as L
from ..nn import resnet as R
from . import cfrm as CFRM
from . import tfa as TFA


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215
    eps: float = 1e-6
    # CFRM stage depths (NAFBlocks before the AdaNAFV2) per skip scale
    cfrm_depths: tuple = (1, 1, 9)
    # rematerialize per-block in the backward pass (same rationale as
    # UNetConfig.remat: CFRM/TFA training at 512px otherwise keeps every
    # NAF-block intermediate live — ~270 MB each at the /2 scale).
    # Enabled by the train steps; forward-only jits are unaffected
    remat: bool = False

    @property
    def skip_channels(self):
        # post-down-block channels at the three skip scales (/2, /4, /8)
        return tuple(self.block_out_channels[:3])


def tiny_vae_config():
    """Scaled-down config for tests (same topology, 8x narrower)."""
    return VAEConfig(block_out_channels=(16, 32, 64, 64), cfrm_depths=(1, 1, 2),
                     norm_num_groups=8)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def encoder_init(key, cfg: VAEConfig, dtype=jnp.float32):
    chans = cfg.block_out_channels
    keys = iter(jax.random.split(key, 64))
    p = {"conv_in": L.conv2d_init(next(keys), cfg.in_channels, chans[0], 3,
                                  dtype=dtype)}
    blocks = []
    cin = chans[0]
    for i, cout in enumerate(chans):
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block):
            blk["resnets"].append(
                R.resnet_block_init(next(keys), cin if j == 0 else cout, cout,
                                    dtype=dtype))
        if i < len(chans) - 1:
            blk["downsample"] = R.downsample_init(next(keys), cout, dtype=dtype)
        blocks.append(blk)
        cin = cout
    p["down_blocks"] = blocks
    cmid = chans[-1]
    p["mid"] = {
        "resnet1": R.resnet_block_init(next(keys), cmid, cmid, dtype=dtype),
        "attn": A.spatial_self_attention_init(next(keys), cmid, heads=1,
                                              dtype=dtype),
        "resnet2": R.resnet_block_init(next(keys), cmid, cmid, dtype=dtype),
    }
    p["conv_norm_out"] = L.norm_init(cmid, dtype)
    p["conv_out"] = L.conv2d_init(next(keys), cmid, 2 * cfg.latent_channels, 3,
                                  dtype=dtype)
    return p


def decoder_init(key, cfg: VAEConfig, dtype=jnp.float32):
    chans = list(reversed(cfg.block_out_channels))  # e.g. (512, 512, 256, 128)
    keys = iter(jax.random.split(key, 64))
    cmid = chans[0]
    p = {
        "conv_in": L.conv2d_init(next(keys), cfg.latent_channels, cmid, 3,
                                 dtype=dtype),
        "mid": {
            "resnet1": R.resnet_block_init(next(keys), cmid, cmid, dtype=dtype),
            "attn": A.spatial_self_attention_init(next(keys), cmid, heads=1,
                                                  dtype=dtype),
            "resnet2": R.resnet_block_init(next(keys), cmid, cmid, dtype=dtype),
        },
    }
    blocks = []
    cin = cmid
    for i, cout in enumerate(chans):
        blk = {"resnets": []}
        for j in range(cfg.layers_per_block + 1):
            blk["resnets"].append(
                R.resnet_block_init(next(keys), cin if j == 0 else cout, cout,
                                    dtype=dtype))
        if i < len(chans) - 1:
            blk["upsample"] = R.upsample_init(next(keys), cout, dtype=dtype)
        blocks.append(blk)
        cin = cout
    p["up_blocks"] = blocks
    p["conv_norm_out"] = L.norm_init(chans[-1], dtype)
    p["conv_out"] = L.conv2d_init(next(keys), chans[-1], cfg.out_channels, 3,
                                  dtype=dtype)
    return p


def vae_init(key, cfg: VAEConfig, dtype=jnp.float32):
    """Frozen VAE backbone params (no adapters)."""
    ke, kd, kq, kpq = jax.random.split(key, 4)
    return {
        "encoder": encoder_init(ke, cfg, dtype),
        "decoder": decoder_init(kd, cfg, dtype),
        "quant_conv": L.conv2d_init(kq, 2 * cfg.latent_channels,
                                    2 * cfg.latent_channels, 1, dtype=dtype),
        "post_quant_conv": L.conv2d_init(kpq, cfg.latent_channels,
                                         cfg.latent_channels, 1, dtype=dtype),
    }


def cfrm_adapter_init(key, cfg: VAEConfig, dtype=jnp.float32):
    return CFRM.cfrm_init(key, cfg.skip_channels, cfg.cfrm_depths, dtype=dtype)


def tfa_adapter_init(key, cfg: VAEConfig, tasks, prompt_len: int = 1,
                     dtype=jnp.float32):
    c_out = cfg.block_out_channels[-1]
    skip_chans = tuple(reversed(cfg.skip_channels))  # (512, 256, 128)
    return {
        "task_editors": TFA.tfa_init(key, c_out, skip_chans, prompt_len, dtype),
        "task_prompts": TFA.task_prompts_init(tasks, prompt_len, c_out, dtype),
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _res_fn(cfg: VAEConfig):
    """Per-block rematerializable resnet apply (see VAEConfig.remat)."""
    def f(p_res, h):
        return R.resnet_block(p_res, h, groups=cfg.norm_num_groups,
                              eps=cfg.eps)

    return jax.checkpoint(f) if cfg.remat else f


def _mid_block(p, x, cfg: VAEConfig):
    x = R.resnet_block(p["resnet1"], x, groups=cfg.norm_num_groups, eps=cfg.eps)
    x = A.spatial_self_attention(p["attn"], x, heads=1,
                                 groups=cfg.norm_num_groups, eps=cfg.eps)
    return R.resnet_block(p["resnet2"], x, groups=cfg.norm_num_groups,
                          eps=cfg.eps)


def encode_moments(p, x, cfg: VAEConfig, fr_params=None, enable_fr: bool = False):
    """Encoder forward. x in [0, 1] NHWC.

    Returns (mean, logvar, skips): the posterior moments at /8 and the three
    skip tensors (after CFRM when enabled) at /2, /4, /8. Gradients from the
    latent path are cut before the last down block (the reference's
    ``sample.detach()`` firewall, autoencoder.py:27), so CFRM grads flow only
    through the skips/feature losses.
    """
    enc = p["encoder"]
    h = x * 2.0 - 1.0
    h = L.conv2d(enc["conv_in"], h, padding=1)

    res_fn = _res_fn(cfg)
    skips = []
    blocks = enc["down_blocks"]
    for i, blk in enumerate(blocks[:-1]):
        for res in blk["resnets"]:
            h = res_fn(res, h)
        if "downsample" in blk:
            h = R.downsample(blk["downsample"], h, pad_mode="asym")
        if enable_fr:
            h = CFRM.cfrm_stage(fr_params[i], h, remat=cfg.remat)
        skips.append(h)

    h = jax.lax.stop_gradient(h)
    for res in blocks[-1]["resnets"]:
        h = res_fn(res, h)

    h = _mid_block(enc["mid"], h, cfg)
    h = L.silu(L.group_norm(enc["conv_norm_out"], h, groups=cfg.norm_num_groups,
                            eps=cfg.eps))
    h = L.conv2d(enc["conv_out"], h, padding=1)
    moments = L.conv2d(p["quant_conv"], h, padding=0)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    return mean, logvar, skips


def encode(p, x, cfg: VAEConfig, rng=None, fr_params=None,
           enable_fr: bool = False, sample: bool = True):
    """Full encode: posterior sample (or mode) scaled by scaling_factor.

    Returns (latents, skips). Matches SkipConnectedAutoEncoder.encode
    (autoencoder.py:132-156).
    """
    mean, logvar, skips = encode_moments(p, x, cfg, fr_params, enable_fr)
    if sample:
        std = jnp.exp(0.5 * logvar)
        z = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    else:
        z = mean
    return z * cfg.scaling_factor, skips


def decode(p, z, cfg: VAEConfig, skips=None, tfa_params=None, task=None,
           prompt_len: int = 1):
    """Decoder forward. Returns images in [0, 1] (un-clamped).

    With ``tfa_params`` + ``task`` (a static string), threads the task prompt
    through the three TaskFeatureAdapters before the first three up blocks
    (autoencoder.py:37-72). Without them, plain VAE decode.
    """
    dec = p["decoder"]
    h = z / cfg.scaling_factor
    h = L.conv2d(p["post_quant_conv"], h, padding=0)
    h = L.conv2d(dec["conv_in"], h, padding=1)
    h = _mid_block(dec["mid"], h, cfg)

    use_tfa = tfa_params is not None and task is not None
    if use_tfa:
        prompt = tfa_params["task_prompts"][task]  # (T, D)
        cond = jnp.broadcast_to(prompt[None], (h.shape[0],) + prompt.shape)
        cond = cond.astype(h.dtype)

    res_fn = _res_fn(cfg)
    tfa_fn = TFA.task_feature_adapter
    if cfg.remat:
        tfa_fn = jax.checkpoint(tfa_fn, static_argnums=(4,))
    blocks = dec["up_blocks"]
    for i, blk in enumerate(blocks):
        if use_tfa and i < len(blocks) - 1:
            skip = skips[-i - 1]
            h, cond = tfa_fn(
                tfa_params["task_editors"][i], h, skip, cond, prompt_len)
        for res in blk["resnets"]:
            h = res_fn(res, h)
        if "upsample" in blk:
            h = R.upsample(blk["upsample"], h)

    h = L.silu(L.group_norm(dec["conv_norm_out"], h, groups=cfg.norm_num_groups,
                            eps=cfg.eps))
    h = L.conv2d(dec["conv_out"], h, padding=1)
    return (h + 1.0) / 2.0
