"""Staged training steps as pure jitted functions.

Reproduces the reference's three-part training step
(engine_unifie.py:135-225) with structural gradient discipline: gradients are
taken only w.r.t. the ``trainable`` pytree, and the reference's
``.detach()`` / ``set_grad_enabled`` windows become ``stop_gradient`` calls
at the same cut points:

- CFRM gradients flow only through the skip features (the VAE's latent-path
  firewall, autoencoder.py:27).
- The control loss MSE(pred_z0, h0) reaches Controller + SC-Tuner only
  (the conditions l0 carry values, not grads, into the controller — matching
  the no_grad encode at engine_unifie.py:137-147).
- TFA sees a detached pred_z0 and detached skips (engine_unifie.py:185-191).

Loss weights: 0.1/0.1/0.01 CFRM feature MSEs (engine_unifie.py:156); control
MSE (:181); per-task TFA losses 10*L1 ir / 0.1*CE cls / 0.1*CE seg with the
auxiliary IR L1 on non-ir MTL batches (:259-266, :220-223).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models import unirestore as UR


@dataclasses.dataclass(frozen=True)
class StageConfig:
    """Which adapter families train (frenc/cnet/tedit "train" flags)."""
    train_cfrm: bool = True
    train_cnet: bool = True
    train_tfa: bool = False
    # stage-3 new-task extension: only prompts train (engine_unifie.py:128-133)
    tfa_prompts_only: bool = False
    # MTL: auxiliary IR decode loss on non-ir batches (engine_unifie.py:220-223)
    multi_task: bool = False
    # loss weights
    w_fr: tuple = (0.1, 0.1, 0.01)
    w_te: dict = dataclasses.field(
        default_factory=lambda: {"ir": 10.0, "cls": 0.1, "seg": 0.1,
                                 "det": 1.0})


def trainable_filter(stage: StageConfig, trainable):
    """Mask of which top-level trainable subtrees receive optimizer updates.

    Equivalent to the reference's requires_grad partition
    (engine_unifie.py:62-133). Returns a pytree of bools shaped like
    ``trainable`` (prefix-level)."""
    def mask_for(name):
        if name == "cfrm":
            return stage.train_cfrm
        if name in ("controller", "control"):
            return stage.train_cnet
        if name == "tfa":
            return stage.train_tfa
        return False

    out = {}
    for name, sub in trainable.items():
        if name == "tfa" and stage.train_tfa and stage.tfa_prompts_only:
            out[name] = {"task_editors": jax.tree.map(lambda _: False,
                                                      sub["task_editors"]),
                         "task_prompts": jax.tree.map(lambda _: True,
                                                      sub["task_prompts"])}
        else:
            out[name] = jax.tree.map(lambda _, v=mask_for(name): v, sub)
    return out


def apply_grad_mask(grads, mask):
    return jax.tree.map(lambda g, m: g if m else jnp.zeros_like(g), grads, mask)


def _sg(x):
    return jax.lax.stop_gradient(x)


def _mse(a, b):
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2)


def compute_losses(frozen, trainable, cfg: UR.UniRestoreConfig, sched,
                   stage: StageConfig, batch: dict, rng, task: str,
                   te_loss_fn: Callable | None = None):
    """Forward + all stage losses for one batch.

    ``batch``: dict with "lq", "hq" (NHWC, [0,1]) and optionally "gt"
    (task labels). ``task`` is static. ``te_loss_fn(preds, hq, gt, task)``
    computes the downstream task loss (the engine variants'
    ``te_loss_fn``, engine_unifie.py:259-336).

    Returns (total_loss, logs_dict).
    """
    lq, hq = batch["lq"], batch["hq"]
    k_hq, k_lq, k_diff = jax.random.split(rng, 3)
    logs = {}

    # --- fr forward (engine_unifie.py:135-148)
    h0, h0_mids = UR.encode(frozen, trainable, cfg, hq, rng=k_hq,
                            enable_fr=False)
    h0, h0_mids = _sg(h0), [_sg(m) for m in h0_mids]
    l0, l0_mids = UR.encode(frozen, trainable, cfg, lq, rng=k_lq,
                            enable_fr=cfg.use_cfrm)
    if not stage.train_cfrm:
        l0_mids = [_sg(m) for m in l0_mids]
    l0 = _sg(l0)  # latent path carries no grads (encoder frozen + firewall)

    # --- cn forward (engine_unifie.py:169-177)
    if cfg.use_cnet:
        zt, _, timesteps = UR.diffuse(sched, h0, k_diff)
        zt = _sg(zt)
        pred_z0 = UR.predict_z0(frozen, trainable, cfg, sched, zt, l0,
                                timesteps)
        if not stage.train_cnet:
            pred_z0 = _sg(pred_z0)
    else:
        pred_z0 = l0

    loss = jnp.float32(0.0)

    if stage.train_cfrm and cfg.use_cfrm:
        fr_terms = [_mse(lm, hm) for lm, hm in zip(l0_mids, h0_mids)]
        loss_fr = sum(w * t for w, t in zip(stage.w_fr, fr_terms))
        loss = loss + loss_fr
        logs.update({f"train/loss_layer{i + 1}": t
                     for i, t in enumerate(fr_terms)})
        logs["train/loss_frenc"] = loss_fr
        logs["train/loss_enc"] = _mse(l0, h0)

    if stage.train_cnet and cfg.use_cnet:
        loss_cn = _mse(pred_z0, h0)
        loss = loss + loss_cn
        logs["train/loss_cnet"] = loss_cn

    if cfg.use_tfa and stage.train_tfa:
        te_mids = [_sg(m) for m in l0_mids] if stage.train_cfrm else l0_mids
        preds = UR.decode(frozen, trainable, cfg, _sg(pred_z0), te_mids, task)
        if te_loss_fn is not None:
            loss_te = te_loss_fn(preds, hq, batch.get("gt"), task)
        else:
            loss_te = stage.w_te.get(task, 1.0) * jnp.mean(
                jnp.abs(preds.astype(jnp.float32) - hq.astype(jnp.float32)))
        if stage.multi_task and task != "ir":
            preds_ir = UR.decode(frozen, trainable, cfg, _sg(pred_z0), te_mids,
                                 "ir")
            loss_te = loss_te + jnp.mean(
                jnp.abs(preds_ir.astype(jnp.float32)
                        - hq.astype(jnp.float32)))
        loss = loss + loss_te
        logs[f"train/loss_{task}"] = loss_te

    logs["train/loss"] = loss
    return loss, logs


def _with_train_remat(cfg: UR.UniRestoreConfig):
    """Turn on per-unit UNet rematerialization for training (numerically
    identical; bounds backward activation memory — see UNetConfig.remat).
    Opt out with UNIRESTORE_NO_REMAT=1 (A/B measurement)."""
    import os
    if os.environ.get("UNIRESTORE_NO_REMAT") == "1" or cfg.unet.remat:
        return cfg
    return dataclasses.replace(
        cfg, unet=dataclasses.replace(cfg.unet, remat=True),
        vae=dataclasses.replace(cfg.vae, remat=True))


def make_train_step(frozen, cfg: UR.UniRestoreConfig, sched,
                    stage: StageConfig, tx, task: str,
                    te_loss_fn: Callable | None = None,
                    donate: bool = True):
    """Builds the jitted train step for a static (stage, task) pair.

    step(trainable, opt_state, batch, rng) -> (trainable, opt_state, logs)

    Under a data mesh, batch arrays arrive sharded on the leading axis and
    params replicated; XLA inserts the gradient all-reduce automatically.
    """
    cfg = _with_train_remat(cfg)

    def loss_fn(frozen_p, trainable, batch, rng):
        return compute_losses(frozen_p, trainable, cfg, sched, stage, batch,
                              rng, task, te_loss_fn)

    # frozen is a jit ARGUMENT, not a closure capture: closed-over device
    # arrays are baked into the XLA module as constants, which multiplies
    # module size by the ~1.9 GB of sd-turbo weights and overwhelms
    # compilers (and duplicates the weights in HBM)
    def step(frozen_p, trainable, opt_state, batch, rng):
        from ..nn.attention import force_xla_attention
        with force_xla_attention():  # trace-time: see attention.py
            (_, logs), grads = jax.value_and_grad(
                loss_fn, argnums=1, has_aux=True)(
                frozen_p, trainable, batch, rng)
        mask = trainable_filter(stage, trainable)
        grads = apply_grad_mask(grads, mask)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        # also mask the updates so weight decay cannot leak into frozen
        # adapter subtrees (requires_grad_(False) semantics)
        updates = apply_grad_mask(updates, mask)
        trainable = jax.tree.map(lambda p, u: p + u, trainable, updates)
        return trainable, opt_state, logs

    jitted = jax.jit(step, donate_argnums=(1, 2) if donate else ())

    def run(trainable, opt_state, batch, rng):
        return jitted(frozen, trainable, opt_state, batch, rng)

    return run


# ---------------------------------------------------------------------------
# split train step: one XLA module per gradient subgraph
# ---------------------------------------------------------------------------


def make_split_train_step(frozen, cfg: UR.UniRestoreConfig, sched,
                          stage: StageConfig, tx, task: str,
                          te_loss_fn: Callable | None = None,
                          donate: bool = True,
                          stop_after: str | None = None):
    """Pipelined variant of :func:`make_train_step`: one jit per loss
    subgraph plus a small optimizer-apply jit.

    The reference's training step is three losses joined only at
    ``.detach()`` boundaries (engine_unifie.py:135-225): the CFRM feature
    loss, the controller MSE, and the TFA task loss each backprop into a
    disjoint adapter family. That makes the monolithic backward separable
    with NO numerical change — each loss can be differentiated w.r.t. its
    own subtree in its own (far smaller) XLA module:

      shared:  encode(hq) + DDPM noising               (no grad)
      fr:      encode(lq, CFRM)  -> grads over cfrm    (+ l0/l0_mids out)
      cn:      predict_z0        -> grads over controller+sc-tuner
      te:      decode(+TFA)      -> grads over tfa
      apply:   assemble grads, mask, optimizer update  (donated)

    Motivation: the monolithic full-scale backward exceeds this
    platform's remote-compiler capacity (see CLAUDE.md); the split
    modules each stay near forward-pipeline size and compile. Cost: one
    extra hq-encode dispatch vs the fused graph, plus per-call dispatch
    overhead x5 — amortize with big batches.

    step(trainable, opt_state, batch, rng) -> (trainable, opt_state, logs)
    """
    from ..nn.attention import force_xla_attention

    if stop_after not in (None, "shared", "fr", "cn", "te"):
        # a typo here would silently run the FULL step — including a real
        # optimizer update — inside what the caller believes is a
        # compile-only no-op (and compile every module in one
        # remote-compiler session, the exact failure the hook avoids)
        raise ValueError(f"stop_after must be one of "
                         f"shared|fr|cn|te, got {stop_after!r}")

    cfg = _with_train_remat(cfg)

    FR_KEYS = ("cfrm",)
    CN_KEYS = ("controller", "control")
    TE_KEYS = ("tfa",)

    need_fr_loss = stage.train_cfrm and cfg.use_cfrm
    need_cn_loss = stage.train_cnet and cfg.use_cnet
    need_te_loss = cfg.use_tfa and stage.train_tfa

    def _sub_value_and_grad(fn, frozen_p, trainable, keys, *args):
        """value_and_grad w.r.t. only trainable[keys] (others constant)."""
        sub = {k: trainable[k] for k in keys if k in trainable}
        rest = {k: v for k, v in trainable.items() if k not in sub}

        def f(sub_p):
            return fn(frozen_p, {**rest, **sub_p}, *args)

        (loss, aux), g = jax.value_and_grad(f, has_aux=True)(sub)
        return loss, aux, g

    # like make_train_step, every sub-jit takes frozen as a traced ARGUMENT
    # so the sd-turbo weights are not baked into each XLA module as constants
    @jax.jit
    def shared_fwd(frozen_p, trainable, hq, rng):
        k_hq, k_lq, k_diff = jax.random.split(rng, 3)
        h0, h0_mids = UR.encode(frozen_p, trainable, cfg, hq, rng=k_hq,
                                enable_fr=False)
        if cfg.use_cnet:
            zt, _, ts_ = UR.diffuse(sched, h0, k_diff)
        else:
            zt = h0
            ts_ = jnp.zeros((h0.shape[0],), jnp.int32)
        return h0, h0_mids, zt, ts_, k_lq

    def _fr_fwd(frozen_p, trainable, lq, k_lq, h0, h0_mids):
        l0, l0_mids = UR.encode(frozen_p, trainable, cfg, lq, rng=k_lq,
                                enable_fr=cfg.use_cfrm)
        logs = {}
        loss = jnp.float32(0.0)
        if need_fr_loss:
            fr_terms = [_mse(lm, hm) for lm, hm in zip(l0_mids, h0_mids)]
            loss = sum(w * t for w, t in zip(stage.w_fr, fr_terms))
            logs.update({f"train/loss_layer{i + 1}": t
                         for i, t in enumerate(fr_terms)})
            logs["train/loss_frenc"] = loss
            logs["train/loss_enc"] = _mse(l0, h0)
        return loss, (logs, _sg(l0), [_sg(m) for m in l0_mids])

    if need_fr_loss:
        @jax.jit
        def fr_part(frozen_p, trainable, lq, k_lq, h0, h0_mids):
            return _sub_value_and_grad(_fr_fwd, frozen_p, trainable, FR_KEYS,
                                       lq, k_lq, h0, h0_mids)
    else:
        @jax.jit
        def fr_part(frozen_p, trainable, lq, k_lq, h0, h0_mids):
            loss, aux = _fr_fwd(frozen_p, trainable, lq, k_lq, h0, h0_mids)
            return loss, aux, {}

    def _cn_fwd(frozen_p, trainable, zt, l0, ts_, h0):
        pred_z0 = UR.predict_z0(frozen_p, trainable, cfg, sched, zt, l0, ts_)
        return _mse(pred_z0, h0), _sg(pred_z0)

    if need_cn_loss:
        @jax.jit
        def cn_part(frozen_p, trainable, zt, l0, ts_, h0):
            return _sub_value_and_grad(_cn_fwd, frozen_p, trainable, CN_KEYS,
                                       zt, l0, ts_, h0)
    else:
        @jax.jit
        def cn_part(frozen_p, trainable, zt, l0, ts_, h0):
            loss, pred_z0 = _cn_fwd(frozen_p, trainable, zt, l0, ts_, h0)
            return loss, pred_z0, {}

    def _te_fwd(frozen_p, trainable, pred_z0, te_mids, hq, gt):
        preds = UR.decode(frozen_p, trainable, cfg, pred_z0, te_mids, task)
        if te_loss_fn is not None:
            loss_te = te_loss_fn(preds, hq, gt, task)
        else:
            loss_te = stage.w_te.get(task, 1.0) * jnp.mean(
                jnp.abs(preds.astype(jnp.float32) - hq.astype(jnp.float32)))
        if stage.multi_task and task != "ir":
            preds_ir = UR.decode(frozen_p, trainable, cfg, pred_z0, te_mids,
                                 "ir")
            loss_te = loss_te + jnp.mean(
                jnp.abs(preds_ir.astype(jnp.float32)
                        - hq.astype(jnp.float32)))
        return loss_te, ()

    @jax.jit
    def te_part(frozen_p, trainable, pred_z0, te_mids, hq, gt):
        loss, _, g = _sub_value_and_grad(_te_fwd, frozen_p, trainable,
                                         TE_KEYS, pred_z0, te_mids, hq, gt)
        return loss, g

    def apply_part_fn(trainable, opt_state, grads_by_key):
        grads = jax.tree.map(jnp.zeros_like, trainable)
        grads = {**grads, **{k: v for g in grads_by_key for k, v in
                             g.items()}}
        mask = trainable_filter(stage, trainable)
        grads = apply_grad_mask(grads, mask)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        updates = apply_grad_mask(updates, mask)
        trainable = jax.tree.map(lambda p, u: p + u, trainable, updates)
        return trainable, opt_state

    apply_part = jax.jit(apply_part_fn,
                         donate_argnums=(0, 1) if donate else ())

    def step(trainable, opt_state, batch, rng):
        # stop_after="shared"|"fr"|"cn"|"te" truncates the step after that
        # sub-module: tools/bench_train.py uses it to compile ONE fresh
        # XLA module per subprocess (this platform's remote compile server
        # leaks memory across large compiles in a session and dies with
        # ResourceExhausted on the 2nd-3rd big module; the persistent
        # compilation cache carries the executables across). Never set in
        # production training — it is an explicit maker argument, not an
        # ambient switch.
        lq, hq = batch["lq"], batch["hq"]
        logs = {}
        with force_xla_attention():  # trace-time: see attention.py
            h0, h0_mids, zt, ts_, k_lq = shared_fwd(frozen, trainable, hq,
                                                    rng)
            if stop_after == "shared":
                return trainable, opt_state, {"train/loss": h0.mean()}
            loss_fr, (fr_logs, l0, l0_mids), g_fr = fr_part(
                frozen, trainable, lq, k_lq, h0, h0_mids)
            logs.update(fr_logs)
            loss = loss_fr if need_fr_loss else jnp.float32(0.0)
            if stop_after == "fr":
                return trainable, opt_state, {"train/loss": loss}
            if cfg.use_cnet:
                loss_cn, pred_z0, g_cn = cn_part(frozen, trainable, zt, l0,
                                                 ts_, h0)
                if need_cn_loss:
                    logs["train/loss_cnet"] = loss_cn
                    loss = loss + loss_cn
            else:
                pred_z0, g_cn = l0, {}
            if stop_after == "cn":
                return trainable, opt_state, {"train/loss": loss}
            g_te = {}
            if need_te_loss:
                loss_te, g_te = te_part(frozen, trainable, pred_z0, l0_mids,
                                        hq, batch.get("gt"))
                logs[f"train/loss_{task}"] = loss_te
                loss = loss + loss_te
            if stop_after == "te":
                return trainable, opt_state, {"train/loss": loss}
            trainable, opt_state = apply_part(
                trainable, opt_state, [g_fr, g_cn, g_te])
        logs["train/loss"] = loss
        return trainable, opt_state, logs

    return step
