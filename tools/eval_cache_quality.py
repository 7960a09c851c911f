"""Measure the approximation cost of the cached DDIM inference modes.

Runs the flagship restore pipeline on the available device and reports,
for each cached mode/stride/warmup, PSNR and relative L2 deviation of its
output against the EXACT pipeline's output on the same inputs — the
number a deployment uses to pick a speed/quality point.

With converted sd-turbo weights in $UNIRESTORE_WEIGHTS this is a real
quality proxy; with the random-init fallback the numbers only sanity-check
that the cached graphs stay close to the exact one structurally.

On the TPU platform each configuration runs in its OWN subprocess sharing
a persistent compilation cache: the remote compile server dies after 2-3
large compiles in one session (see CLAUDE.md), and each (mode, stride,
warmup) point is a separate full-pipeline XLA module. Results pass
through a per-run temp directory (CACHEQ_OUT_DIR), so concurrent sweeps
cannot read each other's outputs.

Usage: python tools/eval_cache_quality.py [--steps 20] [--batch 4]
       [--size 512] [--strides 2,3,4,5] [--warmups 0,2] [--platform cpu]
"""

import argparse
import dataclasses
import json
import os
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.compile_cache import cache_dir  # noqa: E402

CACHE_DIR = cache_dir()


def _parse():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--strides", default="2,3,4,5")
    ap.add_argument("--warmups", default="0",
                    help="comma list of cache_warmup values (first N steps "
                         "exact) to sweep per stride")
    ap.add_argument("--modes", default="encoder,deep",
                    help="comma list of cache modes to sweep (e.g. 'deep' "
                         "alone skips the encoder compiles — each config is "
                         "a separate full-pipeline XLA module)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config (CPU smoke; structural numbers only)")
    ap.add_argument("--in-process", action="store_true",
                    help="run every configuration in this process (CPU/tiny "
                         "default; TPU default is one subprocess per config)")
    return ap.parse_args()


def _make_runner(args):
    """Build (frozen, trainable, inputs) ONCE and return run(spec) ->
    float32 output for one configuration ("exact" or "mode:stride:warmup")."""
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    else:
        from unirestore_tpu.compile_cache import enable_compile_cache
        enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.models import unirestore as UR

    base = (UR.tiny_config() if args.tiny
            else UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg")))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), base)
    sched = UR.schedule(base)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (args.batch, args.size, args.size, 3),
                                jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    def run(spec: str):
        if spec == "exact":
            cfg = base
        else:
            mode, stride, warmup = spec.split(":")
            cfg = dataclasses.replace(base, cache_mode=mode,
                                      cache_stride=int(stride),
                                      cache_warmup=int(warmup))
        f = jax.jit(lambda fz, tr, im, r: UR.restore_padded(
            fz, tr, cfg, sched, im, "ir", r,
            num_inference_steps=args.steps))
        return np.clip(np.asarray(f(frozen, trainable, images, rng),
                                  np.float32), 0, 1)

    return run


def _compare(out, exact):
    import numpy as np
    mse = float(np.mean((out - exact) ** 2))
    psnr = float("inf") if mse == 0 else float(10 * np.log10(1.0 / mse))
    rel = float(np.linalg.norm(out - exact)
                / max(np.linalg.norm(exact), 1e-9))
    return round(psnr, 2), round(rel, 5)


def main():
    args = _parse()
    import numpy as np

    from unirestore_tpu import zoo
    if not args.tiny and not os.path.exists(
            os.path.join(zoo.weights_dir(), "sd_turbo_vae.npz")):
        print("# WARNING: random-init weights; numbers are structural only",
              file=sys.stderr)

    row_spec = os.environ.get("CACHEQ_ROW")
    if row_spec is not None:  # child: one config, write output, exit
        out = _make_runner(args)(row_spec)
        np.save(os.path.join(os.environ["CACHEQ_OUT_DIR"], "out.npy"), out)
        return

    specs = ["exact"] + [
        f"{mode}:{stride}:{warmup}"
        for mode in args.modes.split(",")
        for stride in args.strides.split(",")
        for warmup in args.warmups.split(",")]

    in_process = args.in_process or args.tiny or args.platform == "cpu"
    runner = _make_runner(args) if in_process else None
    out_dir = None if in_process else tempfile.mkdtemp(prefix="cacheq_")
    timeout_s = int(os.environ.get("CACHEQ_CONFIG_TIMEOUT", "3600"))
    exact = None
    for spec in specs:
        if in_process:
            out = runner(spec)
        else:
            env = dict(os.environ, CACHEQ_ROW=spec, CACHEQ_OUT_DIR=out_dir,
                       JAX_COMPILATION_CACHE_DIR=CACHE_DIR)
            try:
                proc = subprocess.run([sys.executable] + sys.argv, env=env,
                                      capture_output=True, text=True,
                                      timeout=timeout_s)
            except subprocess.TimeoutExpired:
                print(f"# config {spec} hung (> {timeout_s}s); skipping",
                      file=sys.stderr)
                proc = None
            if proc is None or proc.returncode != 0:
                if proc is not None:
                    print(f"# config {spec} failed:\n{proc.stderr[-1500:]}",
                          file=sys.stderr)
                if spec == "exact":
                    raise SystemExit(
                        "exact pipeline failed; nothing to compare against")
                continue
            out = np.load(os.path.join(out_dir, "out.npy"))
        if spec == "exact":
            exact = out
            continue
        mode, stride, warmup = spec.split(":")
        psnr, rel = _compare(out, exact)
        print(json.dumps({"mode": mode, "stride": int(stride),
                          "warmup": int(warmup),
                          "psnr_vs_exact_db": psnr, "rel_l2": rel}),
              flush=True)


if __name__ == "__main__":
    main()
