"""UniRestore composite model: diffusion-prior restoration, TPU-native.

Equivalent of the reference ``DiffUIE`` (unifie.py:22-169): a frozen SD VAE +
UNet with four trainable adapter families (CFRM, Controller, SC-Tuner, TFA).

Design differences from the torch reference (intentional, TPU-first):
- Parameters live in two explicit pytrees: ``frozen`` (vae, unet, null text
  embedding) and ``trainable`` (cfrm, controller, control adapters, tfa).
  Freezing is structural — gradients are only ever taken w.r.t. the
  trainable tree — replacing requires_grad_ bookkeeping
  (engine_unifie.py:46-133).
- The DDIM denoise loop is a ``lax.scan`` over a static timestep table
  (unifie.py:146-150 is a Python loop over scheduler.timesteps).
- ``enable_fr`` / ``task`` / step counts are trace-time constants; the finite
  task set gives one cached jit per (shape, task).
- NHWC layouts, bf16-friendly compute, fp32 scheduler math.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from ..diffusion import schedules as D
from ..ops import resize as RS
from . import controller as CTRL
from . import unet as UN
from . import vae as VAE

# fixed train-time noising timestep buffer (unifie.py:65-68)
TRAIN_TIMESTEPS = (249, 499, 749, 999, 999, 999)


@dataclasses.dataclass(frozen=True)
class UniRestoreConfig:
    vae: VAE.VAEConfig = dataclasses.field(default_factory=VAE.VAEConfig)
    unet: UN.UNetConfig = dataclasses.field(default_factory=UN.UNetConfig)
    controller: CTRL.ControllerConfig = dataclasses.field(
        default_factory=CTRL.ControllerConfig)
    # adapter switches (mirror frenc/cnet/tedit, unifie.py:24-36)
    use_cfrm: bool = True
    control_type: str = "scedit"  # "scedit" | "spade" | "none" (no cnet)
    tasks: tuple = ("ir",)
    prompt_len: int = 1
    use_tfa: bool = False
    num_inference_steps: int = 1
    # Faster-Diffusion encoder propagation in the DDIM loop (arXiv:
    # 2312.09608): cache Controller + UNet encoder at key steps, run only
    # the decoder at follower steps. Approximate; off = exact reference.
    encoder_propagation: bool = False
    # Cached-inference mode for the DDIM loop. "none" = exact reference
    # semantics; "encoder" = Faster-Diffusion encoder propagation (above);
    # "deep" = DeepCache-style (arXiv:2312.00858): at follower steps reuse
    # the cached deep UNet feature and recompute only the full-resolution
    # level (down block 0 + last up block + SC-Tuner level-0 skips) with a
    # fresh timestep embedding. ``encoder_propagation=True`` is an alias
    # for cache_mode="encoder".
    cache_mode: str = "none"
    # Key-step stride for cached modes: a full forward every N-th DDIM
    # step, cached fast steps in between.
    cache_stride: int = 2
    # Run the first N DDIM steps in full before caching kicks in: early
    # steps move the latent fastest, so a short exact warmup buys most of
    # the quality back for a small FLOP cost (Faster-Diffusion's
    # non-uniform key steps, arXiv:2312.09608 Fig. 5).
    cache_warmup: int = 0
    # preprocessing (unifie.py:124-134)
    min_size: int = 512
    pad_multiple: int = 64
    text_seq_len: int = 77

    @property
    def use_cnet(self):
        return self.control_type in ("scedit", "spade")


def tiny_config(use_tfa: bool = True, control_type: str = "scedit",
                tasks=("ir", "cls", "seg")):
    return UniRestoreConfig(
        vae=VAE.tiny_vae_config(),
        unet=UN.tiny_unet_config(control_type),
        controller=CTRL.tiny_controller_config(),
        tasks=tasks, use_tfa=use_tfa, control_type=control_type,
        min_size=64, pad_multiple=64,
    )


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init(key, cfg: UniRestoreConfig, dtype=jnp.float32):
    """Returns (frozen, trainable) parameter pytrees."""
    k_vae, k_unet, k_cfrm, k_ctrl, k_csc, k_tfa = jax.random.split(key, 6)
    frozen = {
        "vae": VAE.vae_init(k_vae, cfg.vae, dtype),
        # null-prompt CLIP embedding placeholder; replaced by the converted
        # sd_null_emb asset when available (base_model.py:24-27)
        "null_emb": jnp.zeros((1, cfg.text_seq_len,
                               cfg.unet.cross_attention_dim), dtype),
    }
    trainable = {}
    if cfg.use_cnet:
        frozen["unet"] = UN.unet_init(k_unet, cfg.unet, dtype)
        trainable["controller"] = CTRL.controller_init(k_ctrl, cfg.controller,
                                                       dtype)
        trainable["control"] = UN.control_adapters_init(k_csc, cfg.unet, dtype)
    if cfg.use_cfrm:
        trainable["cfrm"] = VAE.cfrm_adapter_init(k_cfrm, cfg.vae, dtype)
    if cfg.use_tfa:
        trainable["tfa"] = VAE.tfa_adapter_init(k_tfa, cfg.vae, cfg.tasks,
                                                cfg.prompt_len, dtype)
    return frozen, trainable


def schedule(cfg: UniRestoreConfig) -> D.DiffusionSchedule:
    return D.make_schedule()


# ---------------------------------------------------------------------------
# core pieces (pure functions; all static switches are Python values)
# ---------------------------------------------------------------------------


def encode(frozen, trainable, cfg, images, rng=None, enable_fr=True,
           sample=True):
    """VAE encode with optional CFRM; images in [0,1] NHWC.

    Returns (latents, skips)."""
    fr = trainable.get("cfrm") if (enable_fr and cfg.use_cfrm) else None
    return VAE.encode(frozen["vae"], images, cfg.vae, rng=rng, fr_params=fr,
                      enable_fr=fr is not None, sample=sample)


def decode(frozen, trainable, cfg, latents, skips=None, task=None):
    """VAE decode with optional TFA task routing (static ``task`` string)."""
    tfa = trainable.get("tfa") if cfg.use_tfa else None
    return VAE.decode(frozen["vae"], latents, cfg.vae, skips=skips,
                      tfa_params=tfa, task=task if tfa is not None else None,
                      prompt_len=cfg.prompt_len)


def diffuse(sched, latents, rng, timesteps=None):
    """DDPM-noise latents at random buffer timesteps (unifie.py:77-89).

    Returns (noised, noise, timesteps)."""
    k_t, k_n = jax.random.split(rng)
    if timesteps is None:
        buf = jnp.asarray(TRAIN_TIMESTEPS, jnp.int32)
        idx = jax.random.randint(k_t, (latents.shape[0],), 0, len(buf))
        timesteps = buf[idx]
    noise = jax.random.normal(k_n, latents.shape, latents.dtype)
    return D.add_noise(sched, latents, noise, timesteps), noise, timesteps


def predict_eps(frozen, trainable, cfg, zt, conditions, timesteps):
    """Controller -> controlled UNet -> predicted noise."""
    control = CTRL.controller_apply(trainable["controller"], cfg.controller,
                                    conditions, timesteps)
    null = jnp.broadcast_to(frozen["null_emb"],
                            (zt.shape[0],) + frozen["null_emb"].shape[1:])
    return UN.unet_apply(frozen["unet"], cfg.unet, zt, timesteps,
                         null.astype(zt.dtype), control=control,
                         control_params=trainable.get("control"))


def predict_z0(frozen, trainable, cfg, sched, zt, conditions, timesteps):
    """One-shot x0 prediction under Controller guidance (unifie.py:91-105)."""
    eps = predict_eps(frozen, trainable, cfg, zt, conditions, timesteps)
    return D.predict_x0_from_eps(sched, zt, eps, timesteps)


def ddim_denoise(frozen, trainable, cfg, sched, zt, z0_lq,
                 num_inference_steps=None, encoder_propagation=False,
                 cache_mode=None, cache_stride=None, cache_warmup=None):
    """DDIM loop with per-step Controller control, as a lax.scan
    (unifie.py:146-150).

    Cached fast paths (both OFF by default = exact reference semantics):

    - ``cache_mode="encoder"`` — Faster-Diffusion encoder propagation
      (arXiv:2312.09608): UNet encoder features change little between
      adjacent timesteps, so the Controller + UNet encoder (+ SC-Tuner
      injection) run only at every ``cache_stride``-th ("key") step and
      follower steps re-run just the UNet decoder with the cached encoder
      features and a fresh timestep embedding (~40% fewer FLOPs per
      follower).
    - ``cache_mode="deep"`` — DeepCache-style (arXiv:2312.00858): key
      steps additionally cache the deep feature entering the shallowest
      up block; follower steps recompute ONLY the full-resolution level
      (conv_in + down block 0 + SC-Tuner level-0 skips + last up block +
      head) against the cached deep feature (~65% fewer FLOPs per
      follower).

    The loop runs as a ``lax.scan`` over key-step groups (one key + the
    followers inside a single scan body, so caches live in registers/VMEM
    across the group rather than in the scan carry); a trailing remainder
    of fewer than ``cache_stride`` steps runs as full steps.

    Cost note: full-UNet evals per restore = warmup + n_groups +
    remainder, so they are minimized when ``stride`` divides
    ``n - warmup`` exactly. At n=20 the measured Pareto knee is
    (stride 17, warmup 3) — one cached group covering every step after
    warmup, 4 full evals, 51.6 dB vs exact (PERF.md "Cached-mode
    quality"); (5, 2) pays 8 full evals for the same gate.
    """
    n = num_inference_steps or cfg.num_inference_steps
    mode = cache_mode if cache_mode is not None else cfg.cache_mode
    if encoder_propagation or (cache_mode is None and cfg.encoder_propagation
                               and mode == "none"):
        mode = "encoder"
    if mode not in ("none", "encoder", "deep"):
        raise ValueError(f"cache_mode must be 'none', 'encoder' or 'deep', "
                         f"got {mode!r}")
    stride = cache_stride if cache_stride is not None else cfg.cache_stride
    warmup = cache_warmup if cache_warmup is not None else cfg.cache_warmup
    if warmup < 0:
        raise ValueError(f"cache_warmup must be >= 0, got {warmup}")
    ts = jnp.asarray(D.ddim_timesteps(n))
    bsz = zt.shape[0]

    def full_step(z, t):
        tb = jnp.full((bsz,), t, jnp.int32)
        eps = predict_eps(frozen, trainable, cfg, z, z0_lq, tb)
        return D.ddim_step(sched, z, eps, t, n)

    if mode == "none" or n < 2 or stride < 2 or warmup >= n:
        def body(z, t):
            return full_step(z, t), None

        z, _ = jax.lax.scan(body, zt, ts)
        return z

    ts_warm, ts = ts[:warmup], ts[warmup:]
    n_cached = n - warmup

    unet_p = frozen["unet"]
    null = jnp.broadcast_to(frozen["null_emb"],
                            (bsz,) + frozen["null_emb"].shape[1:]
                            ).astype(zt.dtype)
    ctrl_params = trainable.get("control")

    def group_body(z, t_group):
        # key step: Controller + full UNet, caching features
        tb0 = jnp.full((bsz,), t_group[0], jnp.int32)
        control = CTRL.controller_apply(trainable["controller"],
                                        cfg.controller, z0_lq, tb0)
        emb0 = UN.unet_time_embedding(unet_p, cfg.unet, tb0, z.dtype)
        h, skips = UN.unet_encode(unet_p, cfg.unet, z, emb0, null, control,
                                  ctrl_params)
        eps0, deep = UN.unet_decode(unet_p, cfg.unet, h, skips, emb0, null,
                                    control, ctrl_params, return_deep=True)
        z = D.ddim_step(sched, z, eps0, t_group[0], n)
        # follower steps: cached deep/encoder features + fresh temb
        for j in range(1, stride):
            tbj = jnp.full((bsz,), t_group[j], jnp.int32)
            embj = UN.unet_time_embedding(unet_p, cfg.unet, tbj, z.dtype)
            if mode == "deep":
                skips0 = UN.unet_down_shallow(unet_p, cfg.unet, z, embj,
                                              null, control, ctrl_params)
                epsj = UN.unet_up_shallow(unet_p, cfg.unet, deep, skips0,
                                          embj, null, control, ctrl_params)
            else:
                epsj = UN.unet_decode(unet_p, cfg.unet, h, skips, embj, null,
                                      control, ctrl_params)
            z = D.ddim_step(sched, z, epsj, t_group[j], n)
        return z, None

    def full_body(z, t):
        return full_step(z, t), None

    z = zt
    if warmup:  # exact warmup steps before caching kicks in
        z, _ = jax.lax.scan(full_body, z, ts_warm)
    n_groups = n_cached // stride
    groups = ts[:n_groups * stride].reshape(n_groups, stride)
    z, _ = jax.lax.scan(group_body, z, groups)
    if n_cached % stride:  # trailing remainder runs in full (as a scan: one
        # UNet instance in the XLA module instead of inlined copies)
        z, _ = jax.lax.scan(full_body, z, ts[n_groups * stride:])
    return z


def restore_padded(frozen, trainable, cfg, sched, images, task, rng,
                   num_inference_steps=None):
    """Restore images whose H/W are already multiples of pad_multiple.

    The jittable core of ``DiffUIE.forward`` (unifie.py:136-155):
    encode (CFRM on) -> noise to t=999 -> DDIM loop -> decode (TFA task).
    """
    k_enc, k_diff = jax.random.split(rng)
    z0, skips = encode(frozen, trainable, cfg, images, rng=k_enc,
                       enable_fr=True)
    if cfg.use_cnet:
        t999 = jnp.full((images.shape[0],), 999, jnp.int32)
        zt, _, _ = diffuse(sched, z0, k_diff, timesteps=t999)
        zt = ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                          num_inference_steps)
    else:
        zt = z0
    return decode(frozen, trainable, cfg, zt, skips, task)


def preprocess_shape(h: int, w: int, cfg: UniRestoreConfig):
    """Static shape plan for restore(): upscale short side to >= min_size,
    then pad to a multiple of pad_multiple (unifie.py:124-134)."""
    if h < cfg.min_size or w < cfg.min_size:
        s = cfg.min_size / min(h, w)
        # round() in the reference is Python banker's rounding
        h, w = round(h * s), round(w * s)
    m = cfg.pad_multiple
    pad_h = (m - h % m) % m
    pad_w = (m - w % m) % m
    return h, w, pad_h, pad_w


def restore(frozen, trainable, cfg, sched, images, task, rng,
            num_inference_steps=None):
    """Full restore pipeline with pre/post resizing (unifie.py:107-169).

    Shape-dependent steps happen at trace time (static per input shape).
    """
    org_h, org_w = images.shape[1:3]
    h, w, pad_h, pad_w = preprocess_shape(org_h, org_w, cfg)
    x = images
    if (h, w) != (org_h, org_w):
        x = RS.resize_bicubic(x, (h, w))
    x = RS.reflect_pad_hw(x, pad_h, pad_w)

    preds = restore_padded(frozen, trainable, cfg, sched, x, task, rng,
                           num_inference_steps)

    preds = preds[:, :h, :w]
    if (h, w) != (org_h, org_w):
        preds = RS.resize_bicubic(preds, (org_h, org_w))
    return preds
