"""AOT memory analysis of the stage-1 controller backward (cn_part).

Lowers the controller-loss value_and_grad (the piece that exhausts HBM in
tools/bench_train.py) from ShapeDtypeStructs only — no arrays are
materialized — compiles it for the current backend, and prints XLA's
memory_analysis(): argument/output/temp/constant bytes. Use to attribute
RESOURCE_EXHAUSTED failures to the actual buffer class instead of
guessing.

Env knobs: MEM_BATCH (default 8), MEM_RES (default 512), MEM_REMAT (1|0,
default 1), UNIRESTORE_TRAIN_ATTN_CHUNK (see nn/attention.py).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BATCH = int(os.environ.get("MEM_BATCH", "8"))
RES = int(os.environ.get("MEM_RES", "512"))
REMAT = os.environ.get("MEM_REMAT", "1") == "1"


def main():
    import dataclasses

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.nn.attention import force_xla_attention

    cfg = UR.UniRestoreConfig(use_tfa=False, tasks=("ir",))
    if REMAT:
        cfg = dataclasses.replace(
            cfg, unet=dataclasses.replace(cfg.unet, remat=True))
    sched = UR.schedule(cfg)

    frozen_s, trainable_s = jax.eval_shape(
        lambda k: UR.init(k, cfg), jax.random.PRNGKey(0))
    bf16 = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.bfloat16), t)
    f32 = lambda t: jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, jnp.float32), t)
    frozen_s, trainable_s = bf16(frozen_s), f32(trainable_s)

    lat = RES // 8
    zt = jax.ShapeDtypeStruct((BATCH, lat, lat, 4), jnp.bfloat16)
    l0 = jax.ShapeDtypeStruct((BATCH, lat, lat, 4), jnp.bfloat16)
    ts = jax.ShapeDtypeStruct((BATCH,), jnp.int32)
    h0 = jax.ShapeDtypeStruct((BATCH, lat, lat, 4), jnp.bfloat16)

    sub_s = {k: trainable_s[k] for k in ("controller", "control")
             if k in trainable_s}

    def cn(frozen_p, sub_p, zt, l0, ts_, h0):
        def f(s):
            pred_z0 = UR.predict_z0(frozen_p, s, cfg, sched, zt, l0, ts_)
            return jnp.mean((pred_z0.astype(jnp.float32)
                             - h0.astype(jnp.float32)) ** 2)

        loss, g = jax.value_and_grad(f)(sub_p)
        return loss, g

    with force_xla_attention():
        lowered = jax.jit(cn).lower(frozen_s, sub_s, zt, l0, ts, h0)
    print(f"lowered OK (remat={REMAT}, batch={BATCH}, res={RES}, "
          f"chunk={os.environ.get('UNIRESTORE_TRAIN_ATTN_CHUNK', '512')}, "
          f"backend={jax.default_backend()})", flush=True)
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gb = 1024 ** 3
    print(f"argument_size:  {ma.argument_size_in_bytes / gb:8.3f} GiB")
    print(f"output_size:    {ma.output_size_in_bytes / gb:8.3f} GiB")
    print(f"temp_size:      {ma.temp_size_in_bytes / gb:8.3f} GiB")
    print(f"alias_size:     {ma.alias_size_in_bytes / gb:8.3f} GiB")
    print(f"generated_code: {ma.generated_code_size_in_bytes / gb:8.3f} GiB")
    total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes + ma.generated_code_size_in_bytes
             - ma.alias_size_in_bytes)
    print(f"total (sans aliased): {total / gb:8.3f} GiB")


if __name__ == "__main__":
    main()
