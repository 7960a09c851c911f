"""Component-level timing of the flagship restore pipeline on the chip.

Times (jitted separately, batch BENCH_BATCH at 512px, bf16):
  - VAE encode (+CFRM)
  - one full DDIM step (Controller + controlled UNet + scheduler step)
  - UNet alone / Controller alone
  - VAE decode (+TFA)
and prints a table with measured time, per-component FLOP estimate, and
achieved TFLOP/s so the furthest-from-roofline component is obvious.

Optionally (PROFILE_TRACE=dir) captures a jax.profiler trace of a few DDIM
steps for op-level inspection.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", "8"))
ITERS = int(os.environ.get("BENCH_ITERS", "5"))


def sync(x):
    np.asarray(jax.tree.leaves(x)[0]).reshape(-1)[0]


def timeit(fn, *args, vary: int = 2):
    """Scan-amortized steady-state time per call: ITERS invocations inside
    ONE lax.scan so the ~30-40 ms per-dispatch tunnel overhead is charged
    once per ITERS, not once per call (memory: axon-tpu-benchmarking).
    The argument at index ``vary`` is perturbed by carry*1e-30 each
    iteration (numerically a no-op) so XLA can neither hoist the
    loop-invariant body nor elide iterations."""

    @jax.jit
    def many(*a):
        def body(acc, _):
            aa = list(a)
            aa[vary] = jax.tree.map(
                lambda x: x + (acc * 1e-30).astype(x.dtype), aa[vary])
            out = fn(*aa)
            leaf = jax.tree.leaves(out)[0]
            return acc + leaf.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    float(np.asarray(many(*args)))  # compile + warmup
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(many(*args)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


def flops_of(fn, *args):
    """XLA's own per-call FLOP estimate (TPU cost analysis)."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def main():
    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.models import controller as CTRL
    from unirestore_tpu.models import unet as UN
    from unirestore_tpu.diffusion import schedules as D

    cfg = UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg"))
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)

    images = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3),
                                jnp.bfloat16)
    rng = jax.random.PRNGKey(2)

    z0, skips = jax.jit(lambda f, t, im, r: UR.encode(f, t, cfg, im, rng=r))(
        frozen, trainable, images, rng)
    zt = jnp.asarray(jax.random.normal(rng, z0.shape, z0.dtype))
    tb = jnp.full((BATCH,), 999, jnp.int32)

    @jax.jit
    def f_encode(f, t, im, r):
        return UR.encode(f, t, cfg, im, rng=r)[0]

    @jax.jit
    def f_decode(f, t, z, sk):
        return UR.decode(f, t, cfg, z, sk, "ir")

    @jax.jit
    def f_ctrl(t, z, ts_):
        c = CTRL.controller_apply(t["controller"], cfg.controller, z, ts_)
        return c[0]

    @jax.jit
    def f_unet(f, t, z, zlq, ts_):
        control = CTRL.controller_apply(t["controller"], cfg.controller, zlq,
                                        ts_)
        null = jnp.broadcast_to(f["null_emb"],
                                (z.shape[0],) + f["null_emb"].shape[1:])
        return UN.unet_apply(f["unet"], cfg.unet, z, ts_,
                             null.astype(z.dtype), control=control,
                             control_params=t.get("control"))

    @jax.jit
    def f_unet_only(f, t, z, ts_, control):
        null = jnp.broadcast_to(f["null_emb"],
                                (z.shape[0],) + f["null_emb"].shape[1:])
        return UN.unet_apply(f["unet"], cfg.unet, z, ts_,
                             null.astype(z.dtype), control=control,
                             control_params=t.get("control"))

    @jax.jit
    def f_ddim20(f, t, z, zlq):
        return UR.ddim_denoise(f, t, cfg, sched, z, zlq, 20)

    control = jax.jit(lambda t, z, ts_: CTRL.controller_apply(
        t["controller"], cfg.controller, z, ts_))(trainable, z0, tb)

    PEAK = 197e12  # v5e bf16 peak FLOP/s

    specs = [
        ("encode(+CFRM) 512px", f_encode, (frozen, trainable, images, rng), 2),
        ("decode(+TFA) 512px", f_decode, (frozen, trainable, zt, skips), 2),
        ("controller 64px", f_ctrl, (trainable, z0, tb), 1),
        ("unet-only step", f_unet_only,
         (frozen, trainable, zt, tb, control), 2),
        ("ctrl+unet step", f_unet, (frozen, trainable, zt, z0, tb), 2),
        ("ddim x20", f_ddim20, (frozen, trainable, zt, z0), 2),
    ]
    rows = []
    for name, fn, fargs, vary in specs:
        t = timeit(fn, *fargs, vary=vary)
        fl = flops_of(fn, *fargs)
        rows.append((name, t, fl))
        print(f"  {name:24s} {t * 1000:9.1f} ms  {t / BATCH * 1000:7.1f} "
              f"ms/img  {fl / 1e12:7.2f} TF  "
              f"{fl / t / PEAK * 100 if fl else 0:5.1f}% MFU", flush=True)

    print(f"\nbatch={BATCH}  (times are steady-state scan-amortized, "
          f"min over 2 runs of {ITERS} iters; MFU vs {PEAK/1e12:.0f} TF/s "
          "bf16 peak)")
    rows = [(n, t) for n, t, _ in rows]

    step = dict(rows)["ctrl+unet step"]
    enc = dict(rows)["encode(+CFRM) 512px"]
    dec = dict(rows)["decode(+TFA) 512px"]
    ddim = dict(rows)["ddim x20"]
    total = enc + dec + ddim
    print(f"\n  est. pipeline: enc {enc*1e3:.0f} + ddim20 {ddim*1e3:.0f} "
          f"+ dec {dec*1e3:.0f} = {total*1e3:.0f} ms "
          f"-> {BATCH/total:.2f} img/s")
    print(f"  20x single-step = {20*step*1e3:.0f} ms (scan overhead = "
          f"{(ddim-20*step)*1e3:+.0f} ms)")

    tracedir = os.environ.get("PROFILE_TRACE")
    if tracedir:
        sync(f_unet(frozen, trainable, zt, z0, tb))
        jax.profiler.start_trace(tracedir)
        for _ in range(3):
            sync(f_unet(frozen, trainable, zt, z0, tb))
        sync(f_encode(frozen, trainable, images, rng))
        sync(f_decode(frozen, trainable, zt, skips))
        jax.profiler.stop_trace()
        print(f"  trace written to {tracedir}")


if __name__ == "__main__":
    main()
