"""Train-step throughput on the chip via the split train step.

The monolithic full-scale backward (grad through the sd-turbo UNet+VAE in
one XLA module) exceeds this platform's remote-compiler capacity
(CLAUDE.md). The split step (steps.make_split_train_step) differentiates
each loss subgraph in its own module — the same cut the reference's
.detach() boundaries define (engine_unifie.py:135-225) — so each module
stays near forward-pipeline size and compiles through the tunnel.

Measures stage-1 (CFRM + Controller, train_stage1.yaml:9-25 protocol:
512px) steps/sec and train img/s on the real chip.

The remote compile server leaks memory across large compiles within one
client session and dies with ResourceExhausted on the 2nd-3rd big module
(a fresh process compiles the same module fine). So each split-step
sub-module is first compiled in its OWN subprocess into the persistent
compilation cache (JAX_COMPILATION_CACHE_DIR, default
/tmp/unirestore_jax_cache), then the measuring run loads every module
from the cache and never triggers a fresh large remote compile.

Env knobs: TRAIN_BATCH (default 8), TRAIN_ITERS (default 8),
TRAIN_TINY=1 (64px tiny config on CPU — plumbing check), TRAIN_STAGE
(1|2|3, default 1; 3 = prompts-only stage-2), TRAIN_SPLIT=0 (monolithic single-module step — viable
since frozen weights became jit arguments instead of baked constants),
TRAIN_RES (override resolution), TRAIN_PRECOMPILE=0 (skip the
per-module subprocess compile pass), TRAIN_TASK (ir|cls|seg|det,
default ir; non-ir implies a stage>=2 protocol with the matching frozen
critic in the TFA loss — CE through ResNet-50 for cls, CE through
DeepLabV3+ for seg, detector loss sum for det; engine_unifie.py:238-336).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("TRAIN_BATCH", "8"))
ITERS = int(os.environ.get("TRAIN_ITERS", "8"))
TINY = os.environ.get("TRAIN_TINY") == "1"
STAGE = int(os.environ.get("TRAIN_STAGE", "1"))
TASK = os.environ.get("TRAIN_TASK", "ir")
if TASK != "ir":
    STAGE = max(STAGE, 2)  # critic-in-the-loop TFA training is stage >= 2
SPLIT = os.environ.get("TRAIN_SPLIT", "1") == "1"
PRECOMPILE = os.environ.get("TRAIN_PRECOMPILE", "1") == "1"
from unirestore_tpu.compile_cache import cache_dir  # noqa: E402

CACHE_DIR = cache_dir()


def _precompile_phases():
    """Compile each split-step sub-module in a fresh subprocess (fresh
    remote-compiler session) into the persistent cache; earlier phases
    re-load from the cache, so each child performs exactly one large
    compile."""
    import subprocess

    phases = ["shared", "fr", "cn"] + (["te"] if STAGE >= 2 else [])
    for ph in phases:
        env = dict(os.environ, UNIRESTORE_TRAIN_STOP_AFTER=ph,
                   TRAIN_PRECOMPILE="0", TRAIN_ITERS="0",
                   JAX_COMPILATION_CACHE_DIR=CACHE_DIR)
        print(f"precompile [{ph}] ...", flush=True)
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True,
                timeout=int(os.environ.get("TRAIN_PHASE_TIMEOUT", "3600")))
        except subprocess.TimeoutExpired:
            raise SystemExit(f"precompile phase {ph} hung (>1h); a wedged "
                             "remote compile must not hang the bench")
        dt = time.perf_counter() - t0
        status = "ok" if proc.returncode == 0 else f"rc={proc.returncode}"
        print(f"precompile [{ph}] {status} in {dt:.0f}s", flush=True)
        if proc.returncode != 0:
            print(proc.stdout[-1500:] + proc.stderr[-1500:], flush=True)
            raise SystemExit(f"precompile phase {ph} failed")


def main():
    if TINY:
        jax.config.update("jax_platforms", "cpu")
    else:
        from unirestore_tpu.compile_cache import enable_compile_cache
        enable_compile_cache()
    if PRECOMPILE and SPLIT and not TINY \
            and not os.environ.get("UNIRESTORE_TRAIN_STOP_AFTER"):
        _precompile_phases()

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.train import optim as OPT
    from unirestore_tpu.train import steps as ST

    res = int(os.environ.get("TRAIN_RES", "64" if TINY else "512"))
    use_tfa = STAGE >= 2
    tasks = ("ir",) if TASK == "ir" else ("ir", TASK)
    if TINY:
        cfg = UR.tiny_config(use_tfa=use_tfa, tasks=tasks)
    else:
        cfg = UR.UniRestoreConfig(use_tfa=use_tfa, tasks=tasks)
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    # bf16 frozen weights (compute path); trainable stays fp32 (master)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    if STAGE == 1:
        # TRAIN_FRENC_ONLY=1: isolate the CFRM feature objective (cnet
        # term off) — the frenc learning-evidence runs use this so the
        # adapter's own loss is the total and its trajectory is
        # unambiguous (reference stage 1 trains both, engine_unifie.py:135-181)
        frenc_only = os.environ.get("TRAIN_FRENC_ONLY") == "1"
        stage = ST.StageConfig(train_cfrm=True, train_cnet=not frenc_only,
                               train_tfa=False)
    else:  # stage 3 = stage 2 with only the new task's prompts training
        stage = ST.StageConfig(train_cfrm=False, train_cnet=False,
                               train_tfa=True,
                               tfa_prompts_only=STAGE == 3)
    te_fn = None
    if TASK != "ir":
        # the real stage-2 protocol: loss through the frozen task critic
        # (engine variants, engine_unifie.py:238-336); weights come from
        # the converted zoo when present, seeded random otherwise (same
        # compute graph either way — throughput is what's measured here)
        from unirestore_tpu.train import engine as ENG
        critics = ENG.build_critics(TASK)
        te_fn = ENG.make_te_loss_fn(TASK, critics)
    tx = OPT.make_optimizer(opt="adamw", lr=1e-4, weight_decay=1e-2)
    opt_state = tx.init(trainable)
    if SPLIT:
        step = ST.make_split_train_step(
            frozen, cfg, sched, stage, tx, TASK, te_loss_fn=te_fn,
            donate=True,
            stop_after=os.environ.get("UNIRESTORE_TRAIN_STOP_AFTER"))
    else:
        step = ST.make_train_step(frozen, cfg, sched, stage, tx, TASK,
                                  te_loss_fn=te_fn, donate=True)

    k = jax.random.PRNGKey(1)
    hq = jax.random.uniform(jax.random.fold_in(k, 1),
                            (BATCH, res, res, 3), jnp.bfloat16)
    if os.environ.get("TRAIN_LQ_FROM_HQ") == "1":
        # lq = degraded hq (additive gaussian + 4x box-downsample blur):
        # the reference's stage-1 semantics (lq is a corrupted version of
        # hq, dataset.py pair loaders) — gives the CFRM branch a
        # learnable lq->hq feature mapping instead of two independent
        # noise images (used by the frenc learning-evidence runs)
        blur = jax.image.resize(jax.image.resize(
            hq.astype(jnp.float32), (BATCH, res // 4, res // 4, 3),
            "linear"), (BATCH, res, res, 3), "linear")
        noise = 0.1 * jax.random.normal(jax.random.fold_in(k, 7),
                                        hq.shape, jnp.float32)
        lq = jnp.clip(blur + noise, 0.0, 1.0).astype(jnp.bfloat16)
    else:
        lq = jax.random.uniform(k, (BATCH, res, res, 3), jnp.bfloat16)
    batch = {"lq": lq, "hq": hq}
    if TASK == "cls":
        batch["gt"] = jax.random.randint(jax.random.fold_in(k, 2),
                                         (BATCH,), 0, 1000)
    elif TASK == "seg":
        gt = jax.random.randint(jax.random.fold_in(k, 2),
                                (BATCH, res, res), 0, 19)
        # sprinkle ignore_index pixels (the 34->19 Cityscapes encode maps
        # unlabeled classes to 255; the CE must mask them)
        ign = jax.random.bernoulli(jax.random.fold_in(k, 3), 0.05,
                                   gt.shape)
        batch["gt"] = jnp.where(ign, 255, gt).astype(jnp.int32)
    elif TASK == "det":
        from unirestore_tpu.tasks.retinanet import pad_targets
        rng = np.random.default_rng(0)
        targets = []
        for _ in range(BATCH):
            n = int(rng.integers(1, 6))
            xy = rng.uniform(0, res / 2, (n, 2))
            wh = rng.uniform(8, res / 2, (n, 2))
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            labels = rng.integers(0, 5, (n,)).astype(np.int32)
            targets.append({"boxes": boxes, "labels": labels})
        boxes, labels, mask = pad_targets(targets)
        batch["gt"] = {"boxes": boxes, "labels": labels, "mask": mask}

    if os.environ.get("TRAIN_FRENC_BASELINE") == "1":
        # no-adapter floor for the CFRM feature objective: the weighted
        # mid-feature MSE with the CFRM branch DISABLED (raw frozen-
        # encoder LQ mids vs HQ mids). A trained CFRM must land BELOW
        # this to demonstrate the branch reduces its own objective.
        @jax.jit
        def _frenc_no_fr(frozen_p, batch_):
            _, hm = UR.encode(frozen_p, {}, cfg, batch_["hq"],
                              rng=jax.random.PRNGKey(11), enable_fr=False)
            _, lm = UR.encode(frozen_p, {}, cfg, batch_["lq"],
                              rng=jax.random.PRNGKey(12), enable_fr=False)
            terms = [jnp.mean((l.astype(jnp.float32)
                               - h.astype(jnp.float32)) ** 2)
                     for l, h in zip(lm, hm)]
            return sum(w * t for w, t in zip(stage.w_fr, terms)), terms
        base, terms = _frenc_no_fr(frozen, batch)
        print(json.dumps({
            "frenc_no_cfrm_baseline": round(float(np.asarray(base)), 6),
            "layer_terms_no_cfrm": [round(float(np.asarray(t)), 6)
                                    for t in terms]}), flush=True)

    t0 = time.perf_counter()
    trainable, opt_state, logs = step(trainable, opt_state, batch,
                                      jax.random.PRNGKey(2))
    loss0 = float(np.asarray(logs["train/loss"]))  # host read = full sync
    compile_s = time.perf_counter() - t0
    print(f"first step (compile): {compile_s:.1f}s  loss={loss0:.4f}",
          flush=True)

    if ITERS == 0:  # precompile child: one (possibly truncated) step only
        return
    # TRAIN_FIXED_RNG=1: same key every step -> a deterministic objective
    # on the fixed batch (same DDPM timestep + noise draw), the standard
    # single-batch overfit check — loss must fall if optimization works.
    fixed_rng = os.environ.get("TRAIN_FIXED_RNG") == "1"
    log_every = int(os.environ.get("TRAIN_LOG_EVERY", "0"))
    t0 = time.perf_counter()
    for i in range(ITERS):
        key = jax.random.PRNGKey(3) if fixed_rng else jax.random.PRNGKey(3 + i)
        trainable, opt_state, logs = step(trainable, opt_state, batch, key)
        if log_every and (i + 1) % log_every == 0:
            rec = {"step": i + 1}
            rec.update({key.removeprefix("train/"): round(
                float(np.asarray(v)), 6) for key, v in sorted(logs.items())})
            print(json.dumps(rec), flush=True)
    loss = float(np.asarray(logs["train/loss"]))  # sync
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(loss), loss
    print(json.dumps({
        "metric": (f"stage{STAGE} train img/s/chip ({res}px, "
                   f"task {TASK}, "
                   f"{'split' if SPLIT else 'monolithic'} step)"),
        "value": round(BATCH / dt, 3), "unit": "img/s",
        "step_ms": round(dt * 1000, 1), "batch": BATCH,
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
