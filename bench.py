"""Benchmark: restored 512px images/sec/chip at 20-step DDIM (north star >= 8).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Runs the flagship full-size sd-turbo UniRestore restore pipeline (CFRM +
Controller + SC-Tuner + TFA) in bf16 on the available chip.

"value" is the EXACT reference-semantics pipeline. Two opt-in cached
inference modes (both OFF by default in the framework) are reported as
extra fields:

- "encoder_prop_value": Faster-Diffusion encoder propagation
  (arXiv:2312.09608; Controller + UNet encoder cached across DDIM step
  pairs, ~2% relative latent deviation at 20 steps).
- "turbo_value": DeepCache-style deep-feature caching (arXiv:2312.00858)
  at key-step stride BENCH_TURBO_STRIDE (default 5, the DeepCache
  paper's standard SD interval): follower steps
  recompute only the full-resolution UNet level against the cached deep
  feature.

Each mode runs in its own subprocess: this platform's remote-compile
tunnel can die on one large XLA module without poisoning the others.

Set BENCH_ENCODER_PROP=1 or BENCH_TURBO=1 to make one of them the primary
value instead.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_IMGS_PER_SEC = 8.0  # BASELINE.md north-star target per chip
BATCH = int(os.environ.get("BENCH_BATCH", "8"))
STEPS = int(os.environ.get("BENCH_DDIM_STEPS", "20"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))
TURBO_STRIDE = int(os.environ.get("BENCH_TURBO_STRIDE", "5"))
PRIMARY = ("encoder" if os.environ.get("BENCH_ENCODER_PROP") == "1"
           else "deep" if os.environ.get("BENCH_TURBO") == "1"
           else "none")


def _bench(run, frozen, trainable, images, rng):
    # a host read of one element forces full device sync (block_until_ready
    # alone does not reliably wait on this platform)
    np.asarray(run(frozen, trainable, images, rng)[0, 0, 0])
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        np.asarray(run(frozen, trainable, images, rng)[0, 0, 0])
        times.append(time.perf_counter() - t0)
    return BATCH / min(times)


def _bench_mode(mode: str, stride: int) -> float:
    from unirestore_tpu.models import unirestore as UR

    cfg = UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg"),
                              cache_mode=mode, cache_stride=stride)
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)

    @jax.jit
    def run(frozen_p, trainable_p, images, rng):
        return UR.restore_padded(frozen_p, trainable_p, cfg, sched,
                                 images, "ir", rng,
                                 num_inference_steps=STEPS)

    images = jax.random.uniform(jax.random.PRNGKey(1),
                                (BATCH, 512, 512, 3), jnp.bfloat16)
    rng = jax.random.PRNGKey(2)
    return _bench(run, frozen, trainable, images, rng)


def main():
    mode = os.environ.get("BENCH_MODE")
    if mode:  # child: one mode per process (isolates the remote compiler)
        stride = {"none": 1, "encoder": 2, "deep": TURBO_STRIDE}[mode]
        print("RESULT " + json.dumps({mode: _bench_mode(mode, stride)}))
        return

    import subprocess

    def emit(results):
        """Print the cumulative JSON line; re-emitted after every mode so
        the last stdout line is always a valid result even if an outer
        harness timeout kills the remaining modes."""
        primary = results.get(PRIMARY, results.get("none", 0.0))
        label = {"none": "", "encoder": " [encoder propagation]",
                 "deep": f" [deep cache /{TURBO_STRIDE}]"}[PRIMARY]
        print(json.dumps({
            "metric": "512px restored images/sec/chip (20-step DDIM)"
                      + label,
            "value": round(primary, 3),
            "unit": "img/s",
            "vs_baseline": round(primary / BASELINE_IMGS_PER_SEC, 3),
            "exact_value": round(results.get("none", 0.0), 3),
            "encoder_prop_value": round(results.get("encoder", 0.0), 3),
            "turbo_value": round(results.get("deep", 0.0), 3),
            "turbo_stride": TURBO_STRIDE,
        }), flush=True)

    results = {}
    # exact (the primary) first, then the headline turbo, encoder last —
    # an early kill still leaves the most important numbers on stdout
    for m in ("none", "deep", "encoder"):
        env = dict(os.environ, BENCH_MODE=m)
        # one retry per mode: the remote-compile tunnel occasionally flakes
        # on one large XLA module; a transient failure must not zero the
        # recorded number
        for attempt in (1, 2):
            try:
                # bound each mode: a wedged tunnel must not hang the whole
                # bench (the subprocess design exists for isolation)
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__)],
                    capture_output=True, text=True, env=env,
                    timeout=int(os.environ.get("BENCH_MODE_TIMEOUT",
                                               "3600")))
            except subprocess.TimeoutExpired as e:
                print(f"# mode {m} attempt {attempt} timed out: {e}",
                      file=sys.stderr)
                continue
            for line in proc.stdout.splitlines():
                if line.startswith("RESULT "):
                    results.update(json.loads(line[len("RESULT "):]))
            if m in results:
                break
            print(f"# mode {m} attempt {attempt} failed:\n"
                  f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}",
                  file=sys.stderr)
        results.setdefault(m, 0.0)
        emit(results)


if __name__ == "__main__":
    main()
