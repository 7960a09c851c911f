"""Benchmark: restored 512px images/sec/chip at 20-step DDIM (north star >= 8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Runs the flagship full-size sd-turbo UniRestore restore pipeline (CFRM +
Controller + SC-Tuner + TFA) in bf16 on the available chip.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp

BASELINE_IMGS_PER_SEC = 8.0  # BASELINE.md north-star target per chip
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_DDIM_STEPS", "20"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def main():
    from unirestore_tpu.models import unirestore as UR

    cfg = UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg"))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)

    @jax.jit
    def run(frozen_p, trainable_p, images, rng):
        return UR.restore_padded(frozen_p, trainable_p, cfg, sched, images,
                                 "ir", rng, num_inference_steps=STEPS)

    images = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3),
                                jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    # warmup / compile
    run(frozen, trainable, images, rng).block_until_ready()

    times = []
    for i in range(ITERS):
        t0 = time.perf_counter()
        run(frozen, trainable, images, rng).block_until_ready()
        times.append(time.perf_counter() - t0)

    best = min(times)
    imgs_per_sec = BATCH / best
    print(json.dumps({
        "metric": "512px restored images/sec/chip (20-step DDIM)",
        "value": round(imgs_per_sec, 3),
        "unit": "img/s",
        "vs_baseline": round(imgs_per_sec / BASELINE_IMGS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
