"""Attention-kernel experiment harness: isolated timing of the fused
Pallas kernel and candidate variants at the SD UNet hot shapes.

PERF.md attributes ~5.5 ms/step of exact-mode slack to attention running
at ~70% of its d=64 hardware cap. Each experiment here is a named kernel
variant; the committed results table in PERF.md must cite this tool.

Timing is scan-amortized (ITERS kernel calls inside ONE lax.scan with a
carry perturbation, same protocol as tools/microbench_shapes.py): per-call
dispatch overhead on this platform is ~0.5-1 ms, which would drown the
sub-ms lvl1/lvl2 shapes under per-call timing.

    python tools/bench_attention.py            # all variants, all shapes
    ATTN_VARIANTS=base,avT python tools/bench_attention.py

Shapes: (BH, T, D) for batch 8 at 512px — levels 0/1/2 of the UNet
(heads 5/10/20, T 4096/1024/256, d 64). Per-shape FLOPs = 4*BH*T^2*D.

Variant rationale (cap analysis, PERF.md "Attention is hardware-capped"):
the QK^T contraction is 64-deep (k-dim pad -> 50% MXU cap, unfixable),
but the AV matmul's 50% comes from its OUTPUT lane dim n=d=64 — computing
it transposed (o^T = v^T @ p^T: m=64 is a sublane dim where 64 is a full
multiple of 8) lifts AV to a 100% lane cap at the price of an in-VMEM
transpose of the (BQ, D) result. If avT wins, the attention cap drops
from 2F/P to 1.5F/P (12.7 -> 9.5 ms/step at batch 8).
"""

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from unirestore_tpu.nn import pallas_attention as PA

PEAK = 197e12  # v5e bf16
SHAPES = [  # (name, BH, T, D): B=8, heads (5, 10, 20)
    ("lvl0", 40, 4096, 64),
    ("lvl1", 80, 1024, 64),
    ("lvl2", 160, 256, 64),
]
ITERS = int(os.environ.get("ATTN_ITERS", "30"))


# -- variant kernels ----------------------------------------------------------


def _kernel_avT(q_ref, k_ref, v_ref, o_ref, *, logit_scale):
    """AV computed transposed: o^T = v^T @ p^T puts the 4096-deep T dim on
    the contraction AND the 256-wide q-block on the output lanes; d=64
    lands on the 8-sublane-tiled m dim (64 % 8 == 0 -> no pad waste).
    Costs one (D, BQ) -> (BQ, D) relayout of the fp32 result."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        s = s * logit_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # (BHB, D, T) @ (BHB, T, BQ) -> (BHB, D, BQ): contraction over T
    ot = jax.lax.dot_general(v, p.astype(v.dtype),
                             (((1,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o = ot.transpose(0, 2, 1)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _kernel_bf16exp(q_ref, k_ref, v_ref, o_ref, *, logit_scale):
    """exp2 evaluated in bf16 (max subtraction keeps the argument in
    [-inf, 0], well inside bf16 range); row-sum accumulates the bf16
    probabilities in fp32. Halves the VPU bytes of the exp pass."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        s = s * logit_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _kernel_avT_bf16exp(q_ref, k_ref, v_ref, o_ref, *, logit_scale):
    """avT + bf16 exp combined."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        s = s * logit_scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2((s - m).astype(jnp.bfloat16))
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    ot = jax.lax.dot_general(v, p, (((1,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o = ot.transpose(0, 2, 1)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _kernel_avT_unroll(q_ref, k_ref, v_ref, o_ref, *, logit_scale, nchunk):
    """avT + static-chunked online softmax: transposed AV accumulation
    keeps the (D, BQ) layout until the final store, chunking interleaves
    MXU (next QK^T) with VPU (this chunk's softmax)."""
    q = q_ref[...]
    bhb, bq, d = q.shape
    t = k_ref.shape[1]
    ck = t // nchunk
    acc = jnp.zeros((bhb, d, bq), jnp.float32)
    m_run = jnp.full((bhb, bq, 1), -1e30, jnp.float32)
    l_run = jnp.zeros((bhb, bq, 1), jnp.float32)
    for i in range(nchunk):
        k = k_ref[:, i * ck:(i + 1) * ck, :]
        v = v_ref[:, i * ck:(i + 1) * ck, :]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if logit_scale != 1.0:
            s = s * logit_scale
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m_run - m_new)
        p = jnp.exp2(s - m_new)
        l_run = l_run * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(v, p.astype(v.dtype),
                                 (((1,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        acc = acc * corr.transpose(0, 2, 1) + pv
        m_run = m_new
    o = acc.transpose(0, 2, 1) / l_run
    o_ref[...] = o.astype(o_ref.dtype)


def _kernel_nomax(q_ref, k_ref, v_ref, o_ref, *, logit_scale):
    """UNSAFE upper-bound probe: skip the max pass entirely (softmax
    without stabilization). Measures how much of the gap is the max
    reduction; not a shippable kernel."""
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        s = s * logit_scale
    p = jnp.exp2(s - 20.0).astype(v.dtype)
    l = jnp.sum(p.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o_ref[...] = (o / l).astype(o_ref.dtype)


def _kernel_unroll(q_ref, k_ref, v_ref, o_ref, *, logit_scale, nchunk):
    """Online softmax over K/V chunks with a STATIC python loop (Pallas TC
    cannot lower dynamic_slice): the next chunk's QK^T (MXU) is independent
    of the previous chunk's softmax (VPU), giving Mosaic's scheduler room
    to overlap the units."""
    q = q_ref[...]  # (BHB, BQ, D)
    bhb, bq, d = q.shape
    t = k_ref.shape[1]
    ck = t // nchunk
    acc = jnp.zeros((bhb, bq, d), jnp.float32)
    m_run = jnp.full((bhb, bq, 1), -1e30, jnp.float32)
    l_run = jnp.zeros((bhb, bq, 1), jnp.float32)
    for i in range(nchunk):
        k = k_ref[:, i * ck:(i + 1) * ck, :]
        v = v_ref[:, i * ck:(i + 1) * ck, :]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if logit_scale != 1.0:
            s = s * logit_scale
        m_new = jnp.maximum(m_run, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp2(m_run - m_new)
        p = jnp.exp2(s - m_new)
        l_run = l_run * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v.dtype), v,
                                 (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        m_run = m_new
    o_ref[...] = (acc / l_run).astype(o_ref.dtype)


def _call(kernel, bh, t, d, bq, bhb, **kw):
    grid = (bh // bhb, t // bq)
    q_spec = pl.BlockSpec((bhb, bq, d), lambda i, qi: (i, qi, 0))
    kv_spec = pl.BlockSpec((bhb, t, d), lambda i, qi: (i, 0, 0))

    def f(q, k, v):
        return pl.pallas_call(
            functools.partial(kernel, logit_scale=1.0, **kw),
            grid=grid,
            in_specs=[q_spec, kv_spec, kv_spec],
            out_specs=q_spec,
            out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel")),
        )(q, k, v)

    return f


def _call_stream(bh, t, d, bq=256, ck=1024):
    """The existing grid-streamed kernel (pallas_attention._stream_kernel)
    at the d=64 shapes: K/V chunks arrive over a third 'arbitrary' grid
    dim, so Mosaic double-buffers the chunk DMAs against compute."""
    if t % ck:
        return None
    grid = (bh, t // bq, t // ck)

    def f(q, k, v):
        return pl.pallas_call(
            functools.partial(PA._stream_kernel, logit_scale=1.0),
            grid=grid,
            in_specs=[pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
                      pl.BlockSpec((1, ck, d), lambda i, qi, ki: (i, ki, 0)),
                      pl.BlockSpec((1, ck, d), lambda i, qi, ki: (i, ki, 0))],
            out_specs=pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
            scratch_shapes=[pltpu.VMEM((bq, d), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32),
                            pltpu.VMEM((bq, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary")),
        )(q, k, v)

    return f


def variants(bh, t, d):
    base_bhb, base_bq = PA._pick_blocks(bh, t, d)
    out = {
        "base": _call(PA._kernel, bh, t, d, base_bq, base_bhb),
        "nomax": _call(_kernel_nomax, bh, t, d, base_bq, base_bhb),
        "avT": _call(_kernel_avT, bh, t, d, base_bq, base_bhb),
        "bf16exp": _call(_kernel_bf16exp, bh, t, d, base_bq, base_bhb),
        "avTbf16": _call(_kernel_avT_bf16exp, bh, t, d, base_bq, base_bhb),
    }
    for nc in (2, 4):
        if t // nc >= 256:
            out[f"unroll{nc}"] = _call(_kernel_unroll, bh, t, d, base_bq,
                                       base_bhb, nchunk=nc)
            out[f"avTu{nc}"] = _call(_kernel_avT_unroll, bh, t, d, base_bq,
                                     base_bhb, nchunk=nc)
    stream = _call_stream(bh, t, d)
    if stream is not None:
        out["stream"] = stream
    return out


def time_fn(f, q, k, v):
    """Scan-amortized steady-state ms/call (microbench_shapes protocol):
    ITERS calls inside one jitted lax.scan, the q operand perturbed by the
    carry so iterations can't be hoisted/elided, host-scalar-read sync."""

    @jax.jit
    def many(q, k, v):
        def body(acc, _):
            qq = q + (acc * 1e-30).astype(q.dtype)
            out = f(qq, k, v)
            return acc + out.astype(jnp.float32).mean(), None
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return acc

    float(np.asarray(many(q, k, v)))  # compile + warmup
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(many(q, k, v)))
        best = min(best, (time.perf_counter() - t0) / ITERS)
    return best


# -- projection-chain experiment (the "inter-op copies" bucket) --------------
# PERF.md attributes ~2.8 ms/step to inter-op copies; the prime suspects are
# the head-major relayouts around attention: einsum("btc,chd->bhtd") on the
# way in and ("bhtd,hdc->btc") on the way out. The hslice variant removes
# every bhtd intermediate: plain (B,T,C)@(C,I) projections, and the kernel
# grid head-slices the 64-wide lane windows straight out of (B, T, I).

CHAIN_SHAPES = [  # (name, B, T, heads, C): 512px batch-8 UNet levels
    ("lvl0", 8, 4096, 5, 320),
    ("lvl1", 8, 1024, 10, 640),
    ("lvl2", 8, 256, 20, 1280),
]


def _hslice_attention(q, k, v):
    """(B, T, I) self-attention with NO (B,H,T,D) relayout anywhere —
    this experiment WON (−13% at lvl0 incl. projections, PERF.md) and was
    promoted to production as ``PA._fused_raw_btc`` (in-kernel static
    64-lane head windows; a 64-wide BlockSpec lane block is not
    lowerable, full-I blocks are)."""
    return PA._fused_raw_btc(q, k, v, 64)


def chain_variants(b, t, h, c):
    d = 64
    inner = h * d

    def base(x, wq, wk, wv, wo):
        # the production path (nn/attention.py): head-major projections,
        # (BH, T, D) kernel, head-major out-projection
        def proj(w):
            y = jnp.einsum("btc,chd->bhtd", x, w.reshape(c, h, d))
            return y.reshape(b * h, t, d)
        ob = PA._fused_raw_bh(proj(wq), proj(wk), proj(wv), 1.0,
                              prescaled=True)
        ob = ob.reshape(b, h, t, d)
        return jnp.einsum("bhtd,hdc->btc", ob, wo.reshape(h, d, c))

    def hslice(x, wq, wk, wv, wo):
        q, k, v = x @ wq, x @ wk, x @ wv          # (B, T, I), no relayout
        o = _hslice_attention(q, k, v)
        return o @ wo.reshape(inner, c)

    def hslice_fusedout(x, wq, wk, wv, wo):
        # out-projection fused into the kernel epilogue: the (B, T, I)
        # attention output never leaves VMEM (removes the separate
        # out-proj op + its HBM round trip — PERF.md's ~2 ms/step
        # linear-slack bucket)
        q, k, v = x @ wq, x @ wk, x @ wv
        return PA._fused_raw_btc_out(q, k, v, wo.reshape(inner, c), 64)

    return {"chain_base": base, "chain_hslice": hslice,
            "chain_fusedout": hslice_fusedout}


def chain_main():
    rng = np.random.default_rng(0)
    for name, b, t, h, c in CHAIN_SHAPES:
        inner = h * 64
        x = jnp.asarray(rng.normal(size=(b, t, c)) * 0.3, jnp.bfloat16)
        ws = [jnp.asarray(rng.normal(size=(c, inner)) * c ** -0.5,
                          jnp.bfloat16) for _ in range(3)]
        wo = jnp.asarray(rng.normal(size=(inner, c)) * inner ** -0.5,
                         jnp.bfloat16)
        print(f"== chain {name}: B={b} T={t} H={h} C={c}", flush=True)
        ref = None
        for vname, f in chain_variants(b, t, h, c).items():
            g = lambda x_, f_=f: f_(x_, *ws, wo)
            try:
                ms = time_fn(lambda q, k, v: g(q), x, x, x) * 1e3
            except Exception as e:
                print(f"  {vname:14s}  FAILED: {str(e)[:100]}", flush=True)
                continue
            got = np.asarray(jax.jit(g)(x), np.float32)
            if ref is None:
                ref, err = got, 0.0
            else:
                err = float(np.abs(got - ref).max())
            print(f"  {vname:14s}  {ms:7.3f} ms  maxerr {err:.2e}",
                  flush=True)


def main():
    if os.environ.get("ATTN_CHAIN") == "1":
        chain_main()
        return
    only = os.environ.get("ATTN_VARIANTS")
    only = set(only.split(",")) if only else None
    shapes_only = os.environ.get("ATTN_SHAPES")
    shapes_only = set(shapes_only.split(",")) if shapes_only else None
    rng = np.random.default_rng(0)
    for name, bh, t, d in SHAPES:
        if shapes_only and name not in shapes_only:
            continue
        q = jnp.asarray(rng.normal(size=(bh, t, d)) * 0.3, jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(bh, t, d)) * 0.3, jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(bh, t, d)) * 0.3, jnp.bfloat16)
        flops = 4 * bh * t * t * d
        cap_ms = flops / (0.5 * PEAK) * 1e3  # d=64 50%-MXU cap
        print(f"== {name}: BH={bh} T={t} D={d}  "
              f"({flops / 1e9:.1f} GF, 50%-cap {cap_ms:.2f} ms)", flush=True)
        ref = None
        for vname, f in variants(bh, t, d).items():
            if only and vname not in only:
                continue
            try:
                ms = time_fn(f, q, k, v) * 1e3
            except Exception as e:  # VMEM OOM etc.
                print(f"  {vname:8s}  FAILED: {str(e)[:100]}", flush=True)
                continue
            got = np.asarray(jax.jit(f)(q, k, v), np.float32)
            if ref is None:
                ref = got
                err = 0.0
            else:
                err = float(np.abs(got - ref).max())
            mxu = flops / (ms / 1e3) / PEAK * 100
            print(f"  {vname:8s}  {ms:7.3f} ms  {mxu:5.1f}% MXU"
                  f"  ({ms / cap_ms * 100:5.1f}% of cap)  maxerr {err:.2e}",
                  flush=True)


if __name__ == "__main__":
    main()
