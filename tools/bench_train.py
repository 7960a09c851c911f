"""Train-step throughput on the chip via the split train step.

The monolithic full-scale backward (grad through the sd-turbo UNet+VAE in
one XLA module) exceeds this platform's remote-compiler capacity
(CLAUDE.md). The split step (steps.make_split_train_step) differentiates
each loss subgraph in its own module — the same cut the reference's
.detach() boundaries define (engine_unifie.py:135-225) — so each module
stays near forward-pipeline size and compiles through the tunnel.

Measures stage-1 (CFRM + Controller, train_stage1.yaml:9-25 protocol:
512px) steps/sec and train img/s on the real chip.

Env knobs: TRAIN_BATCH (default 8), TRAIN_ITERS (default 8),
TRAIN_TINY=1 (64px tiny config on CPU — plumbing check), TRAIN_STAGE
(1|2, default 1), TRAIN_SPLIT=0 (monolithic single-module step — viable
since frozen weights became jit arguments instead of baked constants),
TRAIN_RES (override resolution).
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
SPLIT = os.environ.get("TRAIN_SPLIT", "1") == "1"


def main():
    if TINY:
        jax.config.update("jax_platforms", "cpu")

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.train import optim as OPT
    from unirestore_tpu.train import steps as ST

    res = int(os.environ.get("TRAIN_RES", "64" if TINY else "512"))
    if TINY:
        cfg = UR.tiny_config(use_tfa=STAGE == 2, tasks=("ir",))
    else:
        cfg = UR.UniRestoreConfig(use_tfa=STAGE == 2, tasks=("ir",))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    # bf16 frozen weights (compute path); trainable stays fp32 (master)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    if STAGE == 1:
        stage = ST.StageConfig(train_cfrm=True, train_cnet=True,
                               train_tfa=False)
    else:
        stage = ST.StageConfig(train_cfrm=False, train_cnet=False,
                               train_tfa=True)
    tx = OPT.make_optimizer(opt="adamw", lr=1e-4, weight_decay=1e-2)
    opt_state = tx.init(trainable)
    maker = ST.make_split_train_step if SPLIT else ST.make_train_step
    step = maker(frozen, cfg, sched, stage, tx, "ir", donate=True)

    k = jax.random.PRNGKey(1)
    batch = {"lq": jax.random.uniform(k, (BATCH, res, res, 3),
                                      jnp.bfloat16),
             "hq": jax.random.uniform(jax.random.fold_in(k, 1),
                                      (BATCH, res, res, 3), jnp.bfloat16)}

    t0 = time.perf_counter()
    trainable, opt_state, logs = step(trainable, opt_state, batch,
                                      jax.random.PRNGKey(2))
    loss0 = float(np.asarray(logs["train/loss"]))  # host read = full sync
    compile_s = time.perf_counter() - t0
    print(f"first step (compile): {compile_s:.1f}s  loss={loss0:.4f}",
          flush=True)

    t0 = time.perf_counter()
    for i in range(ITERS):
        trainable, opt_state, logs = step(trainable, opt_state, batch,
                                          jax.random.PRNGKey(3 + i))
    loss = float(np.asarray(logs["train/loss"]))  # sync
    dt = (time.perf_counter() - t0) / ITERS
    assert np.isfinite(loss), loss
    print(json.dumps({
        "metric": (f"stage{STAGE} train img/s/chip ({res}px, "
                   f"{'split' if SPLIT else 'monolithic'} step)"),
        "value": round(BATCH / dt, 3), "unit": "img/s",
        "step_ms": round(dt * 1000, 1), "batch": BATCH,
        "loss_first": round(loss0, 4), "loss_last": round(loss, 4),
        "compile_s": round(compile_s, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
