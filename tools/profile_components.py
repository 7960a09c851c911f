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


def timeit(fn, *args):
    sync(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


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

    rows = []
    rows.append(("encode(+CFRM) 512px", timeit(f_encode, frozen, trainable,
                                               images, rng)))
    rows.append(("decode(+TFA) 512px", timeit(f_decode, frozen, trainable,
                                              zt, skips)))
    rows.append(("controller 64px", timeit(f_ctrl, trainable, z0, tb)))
    rows.append(("unet-only step", timeit(f_unet_only, frozen, trainable, zt,
                                          tb, control)))
    rows.append(("ctrl+unet step", timeit(f_unet, frozen, trainable, zt, z0,
                                          tb)))
    rows.append(("ddim x20", timeit(f_ddim20, frozen, trainable, zt, z0)))

    print(f"\nbatch={BATCH}  (times are min over {ITERS} iters)")
    for name, t in rows:
        print(f"  {name:24s} {t * 1000:9.1f} ms   {t/BATCH*1000:7.1f} ms/img")

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
