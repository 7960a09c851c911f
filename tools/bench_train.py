"""Training-step throughput bench (real chip): stage-1 and stage-2 steps.

    python tools/bench_train.py [--stage 1] [--batch 3] [--res 512]

Stage 1 = CFRM + Controller + SC-Tuner on feature/latent MSE (reference:
8 GPUs x bs 3, configs/train_stage1.yaml); stage 2 = TFA against a frozen
critic (bs 1). Prints one JSON line with imgs/sec/chip.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", type=int, default=1)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--iters", type=int, default=5)
    a = ap.parse_args()

    import optax

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.train import steps as ST

    cfg = UR.UniRestoreConfig(use_tfa=a.stage >= 2, tasks=("ir",))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    stage = ST.StageConfig(train_cfrm=a.stage == 1, train_cnet=a.stage == 1,
                           train_tfa=a.stage >= 2)
    tx = optax.adamw(1e-4)
    te_fn = None
    if a.stage >= 2:
        def te_fn(preds, hq, gt, task):
            return jnp.abs(preds.astype(jnp.float32)
                           - hq.astype(jnp.float32)).mean()
    step = ST.make_train_step(frozen, cfg, sched, stage, tx, "ir",
                              te_loss_fn=te_fn, donate=True)
    opt_state = tx.init(trainable)
    batch = {
        "lq": jnp.full((a.batch, a.res, a.res, 3), 0.4, jnp.float32),
        "hq": jnp.full((a.batch, a.res, a.res, 3), 0.5, jnp.float32),
    }
    rng = jax.random.PRNGKey(1)

    def run_once(tr, st):
        tr, st, logs = step(tr, st, batch, rng)
        return tr, st, logs

    trainable, opt_state, logs = run_once(trainable, opt_state)
    float(jax.tree.leaves(logs)[0])  # host sync
    times = []
    for _ in range(a.iters):
        t0 = time.perf_counter()
        trainable, opt_state, logs = run_once(trainable, opt_state)
        float(jax.tree.leaves(logs)[0])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "metric": f"stage-{a.stage} train imgs/sec/chip "
                  f"({a.res}px, batch {a.batch})",
        "value": round(a.batch / best, 3),
        "unit": "img/s",
        "step_ms": round(best * 1e3, 1),
    }))


if __name__ == "__main__":
    main()
