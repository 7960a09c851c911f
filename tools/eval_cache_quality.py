"""Measure the approximation cost of the cached DDIM inference modes.

Runs the flagship restore pipeline on the available device and reports,
for each cached mode/stride, PSNR and relative L2 deviation of its output
against the EXACT pipeline's output on the same inputs — the number a
deployment uses to pick a speed/quality point.

With converted sd-turbo weights in $UNIRESTORE_WEIGHTS this is a real
quality proxy; with the random-init fallback the numbers only sanity-check
that the cached graphs stay close to the exact one structurally.

Usage: python tools/eval_cache_quality.py [--steps 20] [--batch 4]
       [--size 512] [--strides 2,3,4,5] [--platform cpu]
"""

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--strides", default="2,3,4,5")
    ap.add_argument("--warmups", default="0",
                    help="comma list of cache_warmup values (first N steps "
                         "exact) to sweep per stride")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke; structural numbers only)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.models import unirestore as UR

    base = (UR.tiny_config() if args.tiny
            else UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg")))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), base)
    sched = UR.schedule(base)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    from unirestore_tpu import zoo
    if not os.path.exists(os.path.join(zoo.weights_dir(),
                                       "sd_turbo_vae.npz")):
        print("# WARNING: random-init weights; numbers are structural only",
              file=sys.stderr)

    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (args.batch, args.size, args.size, 3),
                                jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    def run(cfg):
        f = jax.jit(lambda fz, tr, im, r: UR.restore_padded(
            fz, tr, cfg, sched, im, "ir", r,
            num_inference_steps=args.steps))
        return np.asarray(f(frozen, trainable, images, rng), np.float32)

    exact = np.clip(run(base), 0, 1)
    rows = []
    for mode in ("encoder", "deep"):
        for stride in (int(s) for s in args.strides.split(",")):
            for warmup in (int(w) for w in args.warmups.split(",")):
                cfg = dataclasses.replace(base, cache_mode=mode,
                                          cache_stride=stride,
                                          cache_warmup=warmup)
                out = np.clip(run(cfg), 0, 1)
                mse = float(np.mean((out - exact) ** 2))
                psnr = float("inf") if mse == 0 else float(
                    10 * np.log10(1.0 / mse))
                rel = float(np.linalg.norm(out - exact)
                            / max(np.linalg.norm(exact), 1e-9))
                rows.append({"mode": mode, "stride": stride,
                             "warmup": warmup,
                             "psnr_vs_exact_db": round(psnr, 2),
                             "rel_l2": round(rel, 5)})
                print(json.dumps(rows[-1]), flush=True)


if __name__ == "__main__":
    main()
