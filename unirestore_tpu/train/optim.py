"""Optimizer / LR-schedule factory (optax).

Mirrors the reference's optimization surface (base.py:51-127):
- AdamW with timm-style weight-decay masking (no decay on ndim<=1 params)
- sqrt batch-size LR scaling: eff_lr = base_lr * (eff_bsz / base_bsz) ** 0.5
  (base.py:110)
- OneCycle cosine schedule (pct_start 0.1, div_factor 10, per-step) or StepLR
  (base.py:62-80); gradient accumulation via optax.MultiSteps
  (Lightning accumulate_grad_batches equivalent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def effective_lr(base_lr: float, base_bsz: int, batch_size: int,
                 accum_iter: int, num_devices: int) -> float:
    eff_bsz = batch_size * accum_iter * num_devices
    return base_lr * (eff_bsz / base_bsz) ** 0.5


def make_lr_schedule(sched: str | None, peak_lr: float, total_steps: int,
                     **kwargs):
    if sched is None:
        return peak_lr
    if sched == "onecycle":
        total = max(total_steps, 2)
        # guard tiny runs: warmup interval must span >= 1 step or the
        # piecewise interpolation divides by zero
        pct = max(kwargs.get("pct_start", 0.1), 1.0 / total)
        return optax.cosine_onecycle_schedule(
            transition_steps=total, peak_value=peak_lr,
            pct_start=pct,
            div_factor=kwargs.get("div_factor", 10.0),
            final_div_factor=kwargs.get("final_div_factor", 1e4))
    if sched == "step":
        return optax.exponential_decay(
            init_value=peak_lr,
            transition_steps=kwargs.get("step_size", 30),
            decay_rate=kwargs.get("gamma", 0.1), staircase=True)
    raise ValueError(f"Unknown scheduler: {sched}")


def _wd_mask(params):
    # timm create_optimizer_v2 convention: no weight decay on 1D params
    # (norm scales/biases, conv biases, prompts are 2D and DO decay)
    return jax.tree.map(lambda p: p.ndim >= 2, params)


def make_optimizer(opt: str = "adamw", lr=1e-4, weight_decay: float = 1e-2,
                   momentum: float = 0.9, accum_iter: int = 1,
                   grad_clip: float | None = None):
    """Returns an optax.GradientTransformation over the trainable tree.

    Name surface mirrors timm.create_optimizer_v2 (reference
    base.py:62-73): any of the names below is accepted from
    `optimizer_kwargs.opt`; decoupled weight decay is masked off 1D
    params, coupled (L2) decay is applied via additive_weight_decay.
    """
    wd = dict(weight_decay=weight_decay, mask=_wd_mask)
    decoupled = {
        "adamw": lambda: optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, **wd),
        "nadamw": lambda: optax.nadamw(lr, **wd),
        # decoupled: decay joins AFTER the moment normalizer, scaled only
        # by lr (AdamW-style) — decaying before optax.radam would push the
        # decay term through RAdam's adaptive rescaling (coupled L2)
        "radam": lambda: optax.chain(
            optax.scale_by_radam(),
            optax.add_decayed_weights(weight_decay, mask=_wd_mask),
            optax.scale_by_learning_rate(lr)),
        "lamb": lambda: optax.lamb(lr, **wd),
        "lion": lambda: optax.lion(lr, **wd),
        "adafactor": lambda: optax.adafactor(
            lr, weight_decay_rate=weight_decay or None),
        "lars": lambda: optax.lars(lr, weight_decay=weight_decay,
                                   weight_decay_mask=_wd_mask,
                                   momentum=momentum),
        "sgdw": lambda: optax.chain(
            optax.trace(decay=momentum, nesterov=True),
            optax.add_decayed_weights(weight_decay, mask=_wd_mask),
            optax.scale_by_learning_rate(lr)),
    }
    coupled = {  # timm's non-*w forms: L2 decay inside the gradient
        "adam": lambda: optax.adam(lr),
        "nadam": lambda: optax.nadam(lr),
        "adamax": lambda: optax.adamax(lr),
        "sgd": lambda: optax.sgd(lr, momentum=momentum, nesterov=True),
        "momentum": lambda: optax.sgd(lr, momentum=momentum),
        "rmsprop": lambda: optax.rmsprop(lr, momentum=momentum),
        "adagrad": lambda: optax.adagrad(lr),
        "adadelta": lambda: optax.adadelta(lr),
    }
    opt = opt.lower()
    if opt in decoupled:
        tx = decoupled[opt]()
    elif opt in coupled:
        base = coupled[opt]()
        if weight_decay:
            tx = optax.chain(
                optax.add_decayed_weights(weight_decay, mask=_wd_mask), base)
        else:
            tx = base
    else:
        raise ValueError(
            f"Unknown optimizer: {opt!r} (supported: "
            f"{sorted(decoupled) + sorted(coupled)})")
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    chain.append(tx)
    tx = optax.chain(*chain)
    if accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_iter)
    return tx


def build(optimizer_kwargs: dict, lr_scheduler_kwargs: dict | None,
          total_steps: int, batch_size: int, accum_iter: int,
          num_devices: int):
    """Full factory from the reference's YAML kwargs surface
    (train_stage1.yaml:61-67)."""
    # YAML 1.1 parses "1e-4" as a string — coerce numeric fields
    optimizer_kwargs = {
        k: (float(v) if isinstance(v, str)
            and v.replace(".", "").replace("e", "").replace("-", "")
            .replace("+", "").isdigit() else v)
        for k, v in optimizer_kwargs.items()}
    peak = effective_lr(float(optimizer_kwargs["base_lr"]),
                        int(optimizer_kwargs["base_bsz"]), batch_size,
                        accum_iter, num_devices)
    sched_kwargs = dict(lr_scheduler_kwargs or {})
    sched = sched_kwargs.pop("sched", None)
    lr = make_lr_schedule(sched, peak, total_steps, **sched_kwargs)
    return make_optimizer(
        opt=optimizer_kwargs.get("opt", "adamw"), lr=lr,
        weight_decay=optimizer_kwargs.get("weight_decay", 0.0),
        momentum=optimizer_kwargs.get("momentum", 0.9),
        accum_iter=accum_iter,
        grad_clip=optimizer_kwargs.get("grad_clip"),
    ), peak
