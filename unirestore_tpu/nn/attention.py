"""Attention primitives for the SD VAE/UNet/Controller ports (NHWC).

Two flavors are needed for parity with the reference's diffusers backbone:

1. ``spatial_self_attention`` — the "deprecated attn block" style used by the
   VAE mid-block, Controller AttnDownBlock2D / UNetMidBlock2D: GroupNorm on
   the NHWC map, qkv linears WITH bias, residual connection.
2. ``mha`` — transformer attention used inside Transformer2DModel blocks:
   qkv linears WITHOUT bias, out-proj with bias, optional cross-attention.

Compute: sequences are small (<= 4096 tokens at 512px) so we rely on
``jax.nn.dot_product_attention`` which lowers to fused attention on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import layers as L


def mha_init(key, query_dim: int, heads: int, dim_head: int,
             context_dim: int | None = None, qkv_bias: bool = False,
             dtype=jnp.float32):
    inner = heads * dim_head
    ctx = context_dim if context_dim is not None else query_dim
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "to_q": L.linear_init(kq, query_dim, inner, bias=qkv_bias, dtype=dtype),
        "to_k": L.linear_init(kk, ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_v": L.linear_init(kv, ctx, inner, bias=qkv_bias, dtype=dtype),
        "to_out": L.linear_init(ko, inner, query_dim, bias=True, dtype=dtype),
    }


# Measured on v5e (512px pipeline, batch 8): the Pallas flash kernel is
# ~2x SLOWER in situ than XLA's fused attention at seq 4096 / d 64 inside
# the DDIM scan (187 -> 97 ms/step when routed to XLA), so XLA is the
# default for every shape the standard pipeline produces. Flash remains
# the path for very long sequences (large tiled inputs) where O(T^2)
# memory for the logits would blow HBM.
_FLASH_MIN_SEQ = 16384


def _use_flash(t: int, s: int, dim_head: int) -> bool:
    """Route very long spatial self-attention through the Pallas TPU flash
    kernel; everything the 512px pipeline produces (<= 4096 tokens, and
    77-token cross-attention) stays on the XLA path (faster, see above)."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    import os
    min_seq = int(os.environ.get("UNIRESTORE_FLASH_MIN_SEQ",
                                 _FLASH_MIN_SEQ))
    return (t == s and t >= min_seq and t % 512 == 0
            and dim_head <= 256)


import contextlib as _contextlib

_FORCE_XLA = False


@_contextlib.contextmanager
def force_xla_attention():
    """Trace-time switch to the pure-XLA attention path.

    Training steps trace inside this context: the Pallas kernels carry a
    custom VJP whose backward is an XLA graph anyway, and the mixed
    pallas-forward/XLA-backward training graph is what overwhelms this
    platform's remote compiler. Inference keeps the Pallas kernels.
    """
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


def _pallas_enabled() -> bool:
    import os
    return (not _FORCE_XLA
            and jax.default_backend() in ("tpu", "axon")
            and os.environ.get("UNIRESTORE_DISABLE_PALLAS_ATTN") != "1")


def _use_fused(t: int, s: int, dim_head: int) -> bool:
    """Route spatial self-attention through our Pallas kernel (keeps the
    (T, T) logits in VMEM instead of a fp32 HBM round-trip — measured
    2-3x faster than XLA attention at the SD UNet shapes on v5e)."""
    if not _pallas_enabled():
        return False
    from . import pallas_attention as PA
    return PA.supported(t, s, dim_head)


def _use_btc(t: int, s: int, inner: int, dim_head: int) -> bool:
    """Within the fused-kernel shapes, the T >= 1024 levels run the
    channel-flat (B, T, inner) kernel (no head-major relayout; measured
    faster there, slower at T=256 — pallas_attention.py module comment).
    Knob: UNIRESTORE_DISABLE_BTC_ATTN=1 reverts to the head-major path."""
    import os
    if os.environ.get("UNIRESTORE_DISABLE_BTC_ATTN") == "1":
        return False
    from . import pallas_attention as PA
    return PA.btc_supported(t, s, inner, dim_head)


def _use_btc_fused_out(c_out: int) -> bool:
    """Fuse the (inner, C) out-projection into the btc kernel's epilogue
    (per-head outputs accumulate in a VMEM scratch; one MXU matmul emits
    the projected block, so the attention output never round-trips HBM
    and the separate out-proj op — pinned at its 69% pad-to-tile cap —
    disappears from the schedule). Targeted the roofline's ~2 ms/step
    linear-slack bucket; the 2026-08-20 in-situ A/B measured it NEGATIVE
    end-to-end (exact 5.743 vs 5.889 img/s, -2.5% — the epilogue matmul
    serializes against the softmax/AV pipeline; PERF.md attention log),
    so it stays opt-in-off (UNIRESTORE_FUSED_OUT_ATTN=1), kept as the
    recorded experiment + kernel infrastructure."""
    import os
    if os.environ.get("UNIRESTORE_FUSED_OUT_ATTN") != "1":
        return False
    # lane-tiled output block: the epilogue writes (BQ, C) straight to HBM
    return c_out % 128 == 0 or c_out in (320, 640)


def _use_streaming(t: int, s: int, dim_head: int) -> bool:
    """Wide-head self-attention (VAE mid block: one 512-d head at 4096
    tokens) goes through the online-softmax K/V-streaming kernel."""
    if not _pallas_enabled():
        return False
    from . import pallas_attention as PA
    return PA.stream_supported(t, s, dim_head)


def _train_attn_chunk(t: int, s: int) -> int:
    """Query-chunk size for the TRAINING attention path (0 = off).

    The training graphs trace under ``force_xla_attention``; there the
    XLA attention backward stores the full (T, S) probability matrix per
    head — at 512px (T=4096, 5 heads, batch 8) that is ~1.3 GB per
    self-attention layer and exhausts HBM even with per-unit remat. The
    fix is Rabe-Staats query chunking: a ``lax.map`` over query blocks
    with ``jax.checkpoint`` per block, so forward AND backward only ever
    hold one (chunk, S) slab. Cross-attention (S=77) and short sequences
    are unaffected. Knob: UNIRESTORE_TRAIN_ATTN_CHUNK (0 disables)."""
    import os
    if not _FORCE_XLA:
        return 0
    chunk = int(os.environ.get("UNIRESTORE_TRAIN_ATTN_CHUNK", "512"))
    if chunk <= 0 or t != s or t <= 2 * chunk:
        return 0
    if t % chunk:
        # snap to the LARGEST divisor of t that is <= chunk, so non-pow2
        # resolutions (384px -> t=2304 -> chunk 384; 288px -> t=1296 ->
        # 432) still chunk instead of silently reverting to the full S^2
        # backward (which OOMs at scale). A gcd(t, chunk) snap only
        # extracted t's powers of two and bailed for most non-pow2 sizes.
        best = 0
        d = 1
        while d * d <= t:
            if t % d == 0:
                if d <= chunk:
                    best = max(best, d)
                q = t // d
                if q <= chunk:
                    best = max(best, q)
            d += 1
        chunk = best
        if chunk < 64:
            return 0
    return chunk


def _chunked_attention(q, k, v, chunk: int):
    """dot_product_attention over query chunks ((B, T, H, D) layout),
    numerically identical to the unchunked op (softmax is per-query-row)."""
    b, t, h, d = q.shape
    qc = q.reshape(b, t // chunk, chunk, h, d).transpose(1, 0, 2, 3, 4)

    @jax.checkpoint
    def one(qi):
        return jax.nn.dot_product_attention(qi, k, v)

    out = jax.lax.map(one, qc)  # (T/chunk, B, chunk, H, D)
    return out.transpose(1, 0, 2, 3, 4).reshape(b, t, h, d)


def _proj_head_major(pp, src, heads: int, dim_head: int, gain: float = 1.0):
    """Project (B, T, C) -> (B*heads, T, dim_head) in one einsum — the
    head transpose rides inside the matmul output write, so no relayout
    copy is materialized around the Pallas kernels.

    ``gain`` is folded into the weights/bias (used to pre-scale q by
    softmax_scale * log2(e): weight-side folding is free at runtime and
    removes a VPU pass over the (BQ, T) logits inside the kernel)."""
    b, t, c = src.shape
    w = pp["w"].astype(src.dtype).reshape(c, heads, dim_head)
    if gain != 1.0:
        w = w * jnp.asarray(gain, src.dtype)
    y = jnp.einsum("btc,chd->bhtd", src, w)
    if "b" in pp:
        bias = pp["b"].astype(src.dtype).reshape(heads, dim_head)
        if gain != 1.0:
            bias = bias * jnp.asarray(gain, src.dtype)
        y = y + bias[None, :, None, :]
    return y.reshape(b * heads, t, dim_head)


def mha(p, x, context=None, heads: int = 8):
    """Multi-head attention over (B, T, C) with optional (B, S, Cctx) context."""
    ctx = x if context is None else context
    b, t, _ = x.shape
    s = ctx.shape[1]
    inner = p["to_q"]["w"].shape[1]
    dim_head = inner // heads
    scale = float(dim_head) ** -0.5

    use_fused = _use_fused(t, s, dim_head)
    if use_fused and _use_btc(t, s, inner, dim_head):
        # channel-flat kernel: plain (B, T, C) @ (C, inner) projections,
        # heads sliced inside the kernel — removes every head-major
        # relayout copy (measured -13% at T=4096 incl. projections,
        # tools/bench_attention.py ATTN_CHAIN=1).
        from .pallas_attention import (_LOG2E,
                                       fused_attention_btc_out_prescaled,
                                       fused_attention_btc_prescaled)
        scale_gain = jnp.asarray(scale * _LOG2E, x.dtype)
        pq = p["to_q"]
        qf = x @ (pq["w"].astype(x.dtype) * scale_gain)
        if "b" in pq:
            qf = qf + pq["b"].astype(x.dtype) * scale_gain
        kf = L.linear(p["to_k"], ctx)
        vf = L.linear(p["to_v"], ctx)
        po = p["to_out"]
        if _use_btc_fused_out(po["w"].shape[1]):
            out = fused_attention_btc_out_prescaled(
                qf, kf, vf, po["w"].astype(x.dtype), dim_head)
            if "b" in po:
                out = out + po["b"].astype(x.dtype)
            return out
        of = fused_attention_btc_prescaled(qf, kf, vf, dim_head)
        return L.linear(p["to_out"], of)
    use_streaming = not use_fused and _use_streaming(t, s, dim_head)
    if use_fused or use_streaming:
        from .pallas_attention import (_LOG2E,
                                       fused_attention_bh_prescaled,
                                       streaming_attention_bh_prescaled)
        qb = _proj_head_major(p["to_q"], x, heads, dim_head,
                              gain=scale * _LOG2E)
        kb = _proj_head_major(p["to_k"], ctx, heads, dim_head)
        vb = _proj_head_major(p["to_v"], ctx, heads, dim_head)
        kernel = (fused_attention_bh_prescaled if use_fused
                  else streaming_attention_bh_prescaled)
        ob = kernel(qb, kb, vb)  # (B*H, T, D)
        ob = ob.reshape(b, heads, t, dim_head)
        wo = p["to_out"]["w"].astype(x.dtype).reshape(heads, dim_head, -1)
        out = jnp.einsum("bhtd,hdc->btc", ob, wo)
        if "b" in p["to_out"]:
            out = out + p["to_out"]["b"].astype(x.dtype)
        return out

    q = L.linear(p["to_q"], x).reshape(b, t, heads, dim_head)
    k = L.linear(p["to_k"], ctx).reshape(b, s, heads, dim_head)
    v = L.linear(p["to_v"], ctx).reshape(b, s, heads, dim_head)
    chunk = _train_attn_chunk(t, s)
    if chunk:
        o = _chunked_attention(q, k, v, chunk)
    elif _use_flash(t, s, dim_head):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention)
        o = flash_attention(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3), causal=False, sm_scale=scale)
        o = o.transpose(0, 2, 1, 3)
    else:
        o = jax.nn.dot_product_attention(q, k, v)
    o = o.reshape(b, t, inner)
    return L.linear(p["to_out"], o)


def spatial_self_attention_init(key, channels: int, heads: int, dtype=jnp.float32):
    kn, ka = jax.random.split(key)
    return {
        "group_norm": L.norm_init(channels, dtype),
        "attn": mha_init(ka, channels, heads, channels // heads, qkv_bias=True,
                         dtype=dtype),
    }


def spatial_self_attention(p, x, heads: int, groups: int = 32, eps: float = 1e-6):
    """VAE/Controller-style residual spatial self-attention on an NHWC map."""
    b, h, w, c = x.shape
    residual = x
    y = L.group_norm(p["group_norm"], x, groups=groups, eps=eps)
    y = y.reshape(b, h * w, c)
    y = mha(p["attn"], y, heads=heads)
    return residual + y.reshape(b, h, w, c)
