"""Fused self-attention Pallas kernel for the SD UNet/VAE spatial shapes.

Why: XLA's attention materializes the full (T, T) logit matrix in fp32 in
HBM — at T=4096, B=8, H=5 that is 2.7 GB written + read back PER LAYER,
which made attention ~75% of the DDIM step time. The stock
jax.experimental flash kernel was ~2x slower still at these shapes
(d=64, moderate T) due to its dkv-oriented blocking. This kernel computes
one (BQ, T) logit block per program entirely in VMEM: the whole K/V for
one (batch, head) fits on-chip (T <= 4096, d <= 512 -> <= 4 MB), so no
online-softmax streaming is needed and HBM traffic collapses to the
q/k/v/o tensors themselves.

Layout: (B, T, H, D) in/out — the native layout produced by the qkv
projections — with the grid over (B, H, q-blocks); no relayout transposes.
Softmax statistics in fp32, probabilities cast to the input dtype for the
MXU AV matmul (standard flash-attention numerics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_LOG2E = 1.4426950408889634


def _kernel(q_ref, k_ref, v_ref, o_ref, *, logit_scale: float):
    """``logit_scale`` is in log2 space (includes the log2(e) factor for the
    exp2 softmax). 1.0 means q arrives pre-scaled — the scale is folded
    into the q-projection weights upstream (attention.py), removing a VPU
    pass over the (BQ, T) logit block."""
    q = q_ref[...]  # (BH_BLK, BQ, D)
    k = k_ref[...]  # (BH_BLK, T, D)
    v = v_ref[...]  # (BH_BLK, T, D)
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    # softmax via exp2 (measurably faster on the VPU; exp(x) = 2^(x log2 e))
    if logit_scale != 1.0:
        s = s * logit_scale  # (BH_BLK, BQ, T)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    # AV computed TRANSPOSED: o^T = v^T p^T puts the T-deep reduction on
    # the contraction and the BQ-wide q block on the output lanes; d=64
    # lands on the 8-sublane-tiled m dim (64 % 8 == 0, no pad waste). The
    # direct orientation wastes half the MXU on its n=d=64 output lanes —
    # measured 10% faster at T=4096 incl. the (D, BQ) relayout
    # (tools/bench_attention.py avT vs base; PERF.md experiment log).
    ot = jax.lax.dot_general(v, p.astype(v.dtype),
                             (((1,), (2,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)
    o = ot.transpose(0, 2, 1)
    o_ref[...] = (o / l).astype(o_ref.dtype)


# VMEM target for the fp32 logit block; the bf16 probability copy, K/V,
# and pipeline double-buffers ride alongside within the 16 MB budget.
_S_BYTES = 4 * 1024 * 1024


def _pick_blocks(bh: int, t: int, d: int) -> tuple[int, int]:
    """(bh_block, q_block): batch heads together when T is small so each
    program does enough MXU work to amortize grid/DMA overhead."""
    bq = min(t, 256)
    bhb = max(1, _S_BYTES // (bq * t * 4))
    while bhb > 1 and bh % bhb:
        bhb -= 1
    return bhb, bq


def supported(t: int, s: int, d: int) -> bool:
    """Self-attention shapes this kernel handles: the UNet spatial levels
    (T in {256..4096}, head dim 64). The VAE mid block (d=512, 1 head)
    stays on XLA — its K/V alone would crowd VMEM."""
    return t == s and t >= 256 and t % 8 == 0 and d % 64 == 0 and d <= 128


def _stream_kernel(q_ref, k_ref, v_ref, o_ref, acc, m, l, *,
                   logit_scale: float):
    """Online-softmax variant: K/V streamed in chunks over the last grid
    dim (for wide heads whose full K/V would crowd VMEM, e.g. the VAE mid
    block's single 512-d head). ``logit_scale`` as in ``_kernel``."""
    ki = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ki == 0)
    def _init():
        acc[...] = jnp.zeros_like(acc)
        m[...] = jnp.full_like(m, -1e30)
        l[...] = jnp.zeros_like(l)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if logit_scale != 1.0:
        s = s * logit_scale
    m_prev = m[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    corr = jnp.exp2(m_prev - m_new)
    p = jnp.exp2(s - m_new)
    l[...] = l[...] * corr + jnp.sum(p, axis=-1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(v.dtype), v,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    acc[...] = acc[...] * corr + pv
    m[...] = m_new

    @pl.when(ki == nk - 1)
    def _finish():
        o_ref[0] = (acc[...] / l[...]).astype(o_ref.dtype)


def stream_supported(t: int, s: int, d: int) -> bool:
    return (t == s and t >= 1024 and t % 1024 == 0 and 128 < d <= 512
            and d % 128 == 0)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                              "prescaled"))
def _streaming_raw_bh(q, k, v, scale: float, interpret: bool = False,
                      prescaled: bool = False):
    """(BH, T, D) self-attention with chunked K/V for wide heads."""
    bh, t, d = q.shape
    bq, ck = 256, 1024
    grid = (bh, t // bq, t // ck)
    q_spec = pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0))
    kv_spec = pl.BlockSpec((1, ck, d), lambda i, qi, ki: (i, ki, 0))
    return pl.pallas_call(
        functools.partial(_stream_kernel,
                          logit_scale=1.0 if prescaled else scale * _LOG2E),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=pl.BlockSpec((1, bq, d), lambda i, qi, ki: (i, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, d), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(q, k, v)


def _streaming_raw(q, k, v, scale: float, interpret: bool = False):
    """(B, T, H, D) wrapper around the (BH, T, D) streaming kernel."""
    b, t, h, d = q.shape

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    out = _streaming_raw_bh(to_bh(q), to_bh(k), to_bh(v), scale, interpret)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("scale", "interpret",
                                              "prescaled"))
def _fused_raw_bh(q, k, v, scale: float, interpret: bool = False,
                  prescaled: bool = False):
    """q, k, v: (BH, T, D) -> (BH, T, D). Non-causal self-attention.

    Pallas block alignment wants the last two dims to be the
    (sequence, feature) pair, so the head-major flattened layout is the
    kernel-native one.
    """
    bh, t, d = q.shape
    bhb, bq = _pick_blocks(bh, t, d)
    grid = (bh // bhb, t // bq)
    q_spec = pl.BlockSpec((bhb, bq, d), lambda i, qi: (i, qi, 0))
    kv_spec = pl.BlockSpec((bhb, t, d), lambda i, qi: (i, 0, 0))
    return pl.pallas_call(
        functools.partial(_kernel,
                          logit_scale=1.0 if prescaled else scale * _LOG2E),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((bh, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


def _fused_raw(q, k, v, scale: float, interpret: bool = False):
    """(B, T, H, D) wrapper around the (BH, T, D) kernel."""
    b, t, h, d = q.shape

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, t, d)

    out = _fused_raw_bh(to_bh(q), to_bh(k), to_bh(v), scale, interpret)
    return out.reshape(b, h, t, d).transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# channel-flat (B, T, H*D) kernel — no head-major relayout anywhere
# ---------------------------------------------------------------------------
# The bh path above needs head-major activations, which the projections
# emit via a "btc,chd->bhtd" einsum (the transpose rides inside the matmul
# output write) — but that output layout still costs XLA inter-op copies
# around the kernel. This variant keeps q/k/v in the projections' NATIVE
# (B, T, inner) layout: grid blocks span the full inner lanes and the
# kernel statically loops the 64-wide head windows (a 64-wide BlockSpec
# block is not lowerable — Pallas wants lane blocks divisible by 128
# unless they span the array dim). Measured on v5e (tools/bench_attention
# ATTN_CHAIN=1, proj->attn->out chains): -13% at T=4096/C=320, -3% at
# T=1024/C=640, +11% at T=256/C=1280 — routed for T >= _BTC_MIN_SEQ only.

_BTC_MIN_SEQ = 1024


def _btc_kernel(q_ref, k_ref, v_ref, o_ref, *, h: int, d: int):
    """Inner math identical to ``_kernel`` (exp2 softmax, transposed AV),
    once per 64-lane head window. Prescaled-q only (logit_scale folded
    into the q projection upstream)."""
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]  # (BQ, D)
        k = k_ref[0, :, sl]  # (T, D)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ot = jax.lax.dot_general(v, p.astype(v.dtype),
                                 (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = (ot.T / l).astype(o_ref.dtype)


def btc_supported(t: int, s: int, inner: int, dim_head: int) -> bool:
    """Self-attention shapes routed through the channel-flat kernel: the
    UNet's T>=1024 levels with 64-d heads (where it measures faster than
    the head-major path — see module comment)."""
    return (t == s and t >= _BTC_MIN_SEQ and t % 256 == 0
            and dim_head == 64 and inner % 64 == 0)


@functools.partial(jax.jit, static_argnames=("dim_head", "interpret"))
def _fused_raw_btc(q, k, v, dim_head: int = 64, interpret: bool = False):
    """q, k, v: (B, T, inner) -> (B, T, inner), q pre-scaled upstream."""
    b, t, inner = q.shape
    h = inner // dim_head
    bq = min(t, 256)
    grid = (b, t // bq)
    q_spec = pl.BlockSpec((1, bq, inner), lambda bi, qi: (bi, qi, 0))
    kv_spec = pl.BlockSpec((1, t, inner), lambda bi, qi: (bi, 0, 0))
    return pl.pallas_call(
        functools.partial(_btc_kernel, h=h, d=dim_head),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, inner), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)


def _btc_out_kernel(q_ref, k_ref, v_ref, wo_ref, o_ref, acc_ref, *,
                    h: int, d: int):
    """``_btc_kernel`` with the attention OUT-PROJECTION fused as an
    epilogue: per-head outputs land in a VMEM scratch (BQ, inner), then
    one (BQ, inner) @ (inner, C) MXU matmul produces the projected block
    directly — the (B, T, inner) attention output never round-trips HBM
    and the separate out-proj op (pinned at its 69% pad-to-tile cap,
    PERF.md microbench ``out_320``) disappears from the XLA schedule.
    Bias (and the residual) stay outside: XLA fuses a broadcast add for
    free, while a fused bias would force f32 accumulation plumbing here."""
    for hi in range(h):
        sl = slice(hi * d, (hi + 1) * d)
        q = q_ref[0, :, sl]  # (BQ, D)
        k = k_ref[0, :, sl]  # (T, D)
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        ot = jax.lax.dot_general(v, p.astype(v.dtype),
                                 (((0,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        acc_ref[:, sl] = (ot.T / l).astype(acc_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        acc_ref[...], wo_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("dim_head", "interpret"))
def _fused_raw_btc_out(q, k, v, wo, dim_head: int = 64,
                       interpret: bool = False):
    """q, k, v: (B, T, inner); wo: (inner, C) -> (B, T, C).
    q pre-scaled upstream; out-proj bias added by the caller."""
    b, t, inner = q.shape
    c = wo.shape[1]
    h = inner // dim_head
    bq = min(t, 256)
    grid = (b, t // bq)
    q_spec = pl.BlockSpec((1, bq, inner), lambda bi, qi: (bi, qi, 0))
    kv_spec = pl.BlockSpec((1, t, inner), lambda bi, qi: (bi, 0, 0))
    wo_spec = pl.BlockSpec((inner, c), lambda bi, qi: (0, 0))
    return pl.pallas_call(
        functools.partial(_btc_out_kernel, h=h, d=dim_head),
        grid=grid,
        in_specs=[q_spec, kv_spec, kv_spec, wo_spec],
        out_specs=pl.BlockSpec((1, bq, c), lambda bi, qi: (bi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), q.dtype),
        scratch_shapes=[pltpu.VMEM((bq, inner), q.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(q, k, v, wo)


# ---------------------------------------------------------------------------
# autodiff: Pallas forward, XLA-graph backward
# ---------------------------------------------------------------------------
# Training differentiates THROUGH the frozen UNet/VAE attention (CFRM /
# Controller / SC-Tuner gradients flow via the backbone), and Pallas
# kernels have no automatic reverse rule. The backward pass recomputes
# attention as a plain XLA graph and differentiates that — mathematically
# identical, paying the (T, T) materialization only on the training path.
# (A dedicated flash-style backward kernel is a future optimization.)


def _xla_reference(q, k, v, scale: float):
    logits = jnp.einsum("bthd,bshd->bhts", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", p, v)


def _make_diffable(raw):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def f(q, k, v, scale):
        return raw(q, k, v, scale)

    def fwd(q, k, v, scale):
        return raw(q, k, v, scale), (q, k, v)

    def bwd(scale, res, g):
        q, k, v = res
        _, vjp = jax.vjp(lambda a, b, c: _xla_reference(a, b, c, scale),
                         q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def _xla_reference_bh(q, k, v, scale: float):
    logits = jnp.einsum("atd,asd->ats", q, k,
                        preferred_element_type=jnp.float32) * scale
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("ats,asd->atd", p, v)


def _make_diffable_bh(raw):
    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def f(q, k, v, scale):
        return raw(q, k, v, scale)

    def fwd(q, k, v, scale):
        return raw(q, k, v, scale), (q, k, v)

    def bwd(scale, res, g):
        q, k, v = res
        _, vjp = jax.vjp(lambda a, b, c: _xla_reference_bh(a, b, c, scale),
                         q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


_fused_diffable = _make_diffable(_fused_raw)
_streaming_diffable = _make_diffable(_streaming_raw)
_fused_diffable_bh = _make_diffable_bh(_fused_raw_bh)
_streaming_diffable_bh = _make_diffable_bh(_streaming_raw_bh)

# Prescaled entries: the caller folded (dim_head**-0.5 * log2(e)) into the
# q-projection weights, so the kernel skips the logit multiply. For the
# XLA-graph backward, softmax_e(x * ln2) == softmax_2(x), so the natural-
# space scale of the prescaled logits is ln(2).
_LN2 = 0.6931471805599453
_fused_diffable_bh_prescaled = _make_diffable_bh(
    lambda q, k, v, scale: _fused_raw_bh(q, k, v, scale, prescaled=True))
_streaming_diffable_bh_prescaled = _make_diffable_bh(
    lambda q, k, v, scale: _streaming_raw_bh(q, k, v, scale, prescaled=True))


def _xla_reference_btc(q, k, v, scale: float, dim_head: int = 64):
    b, t, inner = q.shape
    h = inner // dim_head
    qh = q.reshape(b, t, h, dim_head)
    kh = k.reshape(b, t, h, dim_head)
    vh = v.reshape(b, t, h, dim_head)
    return _xla_reference(qh, kh, vh, scale).reshape(b, t, inner)


def _make_diffable_btc(raw):
    """custom_vjp over a prescaled (B, T, inner) forward: Pallas forward,
    XLA-graph backward (scale ln 2 — softmax_e(x ln2) == softmax_2(x))."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
    def f(q, k, v, dim_head):
        return raw(q, k, v, dim_head)

    def fwd(q, k, v, dim_head):
        return raw(q, k, v, dim_head), (q, k, v)

    def bwd(dim_head, res, g):
        q, k, v = res
        _, vjp = jax.vjp(
            lambda a, b, c: _xla_reference_btc(a, b, c, _LN2, dim_head),
            q, k, v)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


_fused_diffable_btc_prescaled = _make_diffable_btc(_fused_raw_btc)


def _make_diffable_btc_out(raw):
    """custom_vjp for the out-proj-fused forward: Pallas forward, XLA
    attention+matmul graph backward (prescaled numerics as in
    ``_make_diffable_btc``); grads flow to q/k/v AND wo."""

    @functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
    def f(q, k, v, wo, dim_head):
        return raw(q, k, v, wo, dim_head)

    def fwd(q, k, v, wo, dim_head):
        return raw(q, k, v, wo, dim_head), (q, k, v, wo)

    def bwd(dim_head, res, g):
        q, k, v, wo = res
        _, vjp = jax.vjp(
            lambda a, b, c, w: _xla_reference_btc(a, b, c, _LN2,
                                                  dim_head) @ w,
            q, k, v, wo)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


_fused_diffable_btc_out_prescaled = _make_diffable_btc_out(
    _fused_raw_btc_out)


def fused_attention_btc_out_prescaled(q, k, v, wo, dim_head: int = 64):
    """(B, T, inner) attention with the (inner, C) out-projection fused
    into the kernel epilogue; q pre-scaled by (softmax_scale * log2 e),
    out-proj bias added by the caller."""
    return _fused_diffable_btc_out_prescaled(q, k, v, wo, dim_head)


def fused_attention_btc_prescaled(q, k, v, dim_head: int = 64):
    """(B, T, inner) entry, q pre-scaled by (softmax_scale * log2 e):
    the projections' native channel-flat layout goes straight into the
    kernel — no head-major relayout on either side."""
    return _fused_diffable_btc_prescaled(q, k, v, dim_head)


def fused_attention(q, k, v, scale: float, interpret: bool = False):
    if interpret:
        return _fused_raw(q, k, v, scale, interpret=True)
    return _fused_diffable(q, k, v, scale)


def streaming_attention(q, k, v, scale: float, interpret: bool = False):
    if interpret:
        return _streaming_raw(q, k, v, scale, interpret=True)
    return _streaming_diffable(q, k, v, scale)


def fused_attention_bh(q, k, v, scale: float):
    """(BH, T, D) entry — no relayout when the projections already emit
    head-major activations (attention.py fuses the transpose into the
    projection einsum)."""
    return _fused_diffable_bh(q, k, v, scale)


def streaming_attention_bh(q, k, v, scale: float):
    return _streaming_diffable_bh(q, k, v, scale)


def fused_attention_bh_prescaled(q, k, v):
    """(BH, T, D) entry for q pre-scaled by (softmax_scale * log2 e) —
    fold the scale into the q-projection weights to save a VPU pass over
    the (BQ, T) logit block inside the kernel."""
    return _fused_diffable_bh_prescaled(q, k, v, _LN2)


def streaming_attention_bh_prescaled(q, k, v):
    return _streaming_diffable_bh_prescaled(q, k, v, _LN2)
