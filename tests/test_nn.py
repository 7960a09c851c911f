import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirestore_tpu.nn import attention as A
from unirestore_tpu.nn import embeddings as E
from unirestore_tpu.nn import layers as L
from unirestore_tpu.nn import resnet as R
from unirestore_tpu.nn import transformer as T


def test_conv2d_matches_torch():
    torch = pytest.importorskip("torch")
    key = jax.random.PRNGKey(0)
    p = L.conv2d_init(key, 8, 16, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 10, 12, 8))
    y = L.conv2d(p, x, padding=1)

    tw = torch.tensor(np.asarray(p["w"]).transpose(3, 2, 0, 1))  # HWIO->OIHW
    tb = torch.tensor(np.asarray(p["b"]))
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ty = torch.nn.functional.conv2d(tx, tw, tb, padding=1)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_group_norm_matches_torch():
    torch = pytest.importorskip("torch")
    p = L.norm_init(32)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 6, 6, 32)) * 3 + 1
    y = L.group_norm(p, x, groups=8, eps=1e-6)
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ty = torch.nn.functional.group_norm(tx, 8, torch.ones(32), torch.zeros(32),
                                        eps=1e-6)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_gelu_exact_matches_torch():
    torch = pytest.importorskip("torch")
    x = jnp.linspace(-4, 4, 101)
    y = L.gelu(x)
    ty = torch.nn.functional.gelu(torch.tensor(np.asarray(x)))
    np.testing.assert_allclose(np.asarray(y), ty.numpy(), atol=1e-6)


def test_instance_norm_matches_torch():
    torch = pytest.importorskip("torch")
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 5, 12)) * 2 + 3
    y = L.instance_norm(x)
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ty = torch.nn.functional.instance_norm(tx)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5)


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 3, 4, 16))
    y = L.pixel_shuffle(x, 2)
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ty = torch.nn.functional.pixel_shuffle(tx, 2)
    np.testing.assert_allclose(np.asarray(y), ty.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_simple_gate():
    x = jnp.arange(8.0).reshape(1, 1, 1, 8)
    y = L.simple_gate(x)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0], [0, 5, 12, 21])


def test_sinusoidal_embedding_shape_and_values():
    t = jnp.array([0, 999])
    emb = E.sinusoidal_timestep_embedding(t, 320)
    assert emb.shape == (2, 320)
    # t=0: cos part = 1, sin part = 0 (flip_sin_to_cos=True -> cos first)
    np.testing.assert_allclose(np.asarray(emb[0, :160]), np.ones(160), atol=1e-6)
    np.testing.assert_allclose(np.asarray(emb[0, 160:]), np.zeros(160), atol=1e-6)


def test_resnet_block_shapes():
    key = jax.random.PRNGKey(0)
    p = R.resnet_block_init(key, 32, 64, temb_dim=128)
    x = jnp.ones((2, 8, 8, 32))
    temb = jnp.ones((2, 128))
    y = R.resnet_block(p, x, temb)
    assert y.shape == (2, 8, 8, 64)


def test_down_up_sample_shapes():
    key = jax.random.PRNGKey(0)
    pd = R.downsample_init(key, 16)
    pu = R.upsample_init(key, 16)
    x = jnp.ones((1, 8, 8, 16))
    assert R.downsample(pd, x).shape == (1, 4, 4, 16)
    assert R.downsample(pd, x, pad_mode="asym").shape == (1, 4, 4, 16)
    assert R.upsample(pu, x).shape == (1, 16, 16, 16)


def test_spatial_attention_residual_at_zero_out():
    key = jax.random.PRNGKey(0)
    p = A.spatial_self_attention_init(key, 64, heads=1)
    # zero the out-projection -> block must be the identity (residual path)
    p["attn"]["to_out"]["w"] = jnp.zeros_like(p["attn"]["to_out"]["w"])
    p["attn"]["to_out"]["b"] = jnp.zeros_like(p["attn"]["to_out"]["b"])
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 64))
    y = A.spatial_self_attention(p, x, heads=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_transformer_2d_shapes():
    key = jax.random.PRNGKey(0)
    p = T.transformer_2d_init(key, 64, heads=4, context_dim=96)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 96))
    y = T.transformer_2d(p, x, ctx, heads=4)
    assert y.shape == x.shape


def test_fused_attention_matches_reference():
    """Pallas fused attention (interpret mode on CPU) == XLA attention."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn.pallas_attention import fused_attention, supported

    assert supported(4096, 4096, 64)
    assert supported(256, 256, 64)
    assert not supported(4096, 77, 64)   # cross-attention
    assert not supported(4096, 4096, 512)  # VAE mid stays on XLA

    b, t, h, d = 1, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)
    ours = fused_attention(q, k, v, d ** -0.5, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_streaming_attention_matches_reference():
    """Online-softmax K/V-streaming kernel (interpret mode) == XLA."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn.pallas_attention import (streaming_attention,
                                                    stream_supported)

    assert stream_supported(4096, 4096, 512)
    assert not stream_supported(4096, 4096, 64)   # handled by fused kernel
    assert not stream_supported(4096, 77, 512)    # cross-attention

    b, t, h, d = 1, 1024, 1, 256
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)
    ours = streaming_attention(q, k, v, d ** -0.5, interpret=True)
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)


def test_prescaled_attention_matches_reference():
    """Weight-side scale folding: kernel fed q * (scale * log2 e) with
    logit_scale=1 must equal plain softmax(q k^T scale) v, in both the
    Pallas forward (interpret) and the XLA backward (scale = ln 2)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn import pallas_attention as PA

    bh, t, d = 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (bh, t, d), jnp.float32)
    k = jax.random.normal(ks[1], (bh, t, d), jnp.float32)
    v = jax.random.normal(ks[2], (bh, t, d), jnp.float32)
    scale = d ** -0.5
    q_pre = q * (scale * PA._LOG2E)
    ours = PA._fused_raw_bh(q_pre, k, v, PA._LN2, interpret=True,
                            prescaled=True)
    ref = PA._xla_reference_bh(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)
    # backward consistency: softmax_e(x * ln2) == softmax_2(x)
    ref2 = PA._xla_reference_bh(q_pre, k, v, PA._LN2)
    np.testing.assert_allclose(np.asarray(ref2), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_attention_gradients():
    """Custom-VJP wrapper: grads through the Pallas forward must match
    grads of the XLA reference (training differentiates THROUGH the
    frozen backbone attention)."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn import pallas_attention as PA

    raw = functools.partial(PA._fused_raw, interpret=True)
    f = PA._make_diffable(lambda q, k, v, s: raw(q, k, v, s))
    b, t, h, d = 1, 256, 2, 64
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, h, d), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, h, d), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, h, d), jnp.float32)
    scale = d ** -0.5

    def loss_pallas(q):
        return (f(q, k, v, scale) ** 2).sum()

    def loss_ref(q):
        return (PA._xla_reference(q, k, v, scale) ** 2).sum()

    g1 = jax.grad(loss_pallas)(q)
    g2 = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-2,
                               rtol=2e-2)


def test_btc_attention_matches_reference():
    """Channel-flat (B, T, H*D) kernel (interpret mode): in-kernel head
    slicing + prescaled exp2 softmax must equal plain multi-head
    softmax(q k^T scale) v, forward and (custom-VJP) gradients."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn import pallas_attention as PA

    b, t, h, d = 2, 256, 2, 64
    inner = h * d
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (b, t, inner), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, inner), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, inner), jnp.float32)
    scale = d ** -0.5
    q_pre = q * (scale * PA._LOG2E)
    ours = PA._fused_raw_btc(q_pre, k, v, d, interpret=True)
    ref = PA._xla_reference_btc(q, k, v, scale, d)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)

    # gradient path: interpret-mode diffable must match the XLA reference
    f = PA._make_diffable_btc(functools.partial(PA._fused_raw_btc,
                                                interpret=True))

    def loss_pallas(qp):
        return (f(qp, k, v, d) ** 2).sum()

    def loss_ref(qp):
        return (PA._xla_reference_btc(qp, k, v, PA._LN2, d) ** 2).sum()

    g1 = jax.grad(loss_pallas)(q_pre)
    g2 = jax.grad(loss_ref)(q_pre)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=2e-2,
                               rtol=2e-2)

    # routing predicate: flat-layout path only where it measured faster
    assert PA.btc_supported(4096, 4096, 320, 64)
    assert PA.btc_supported(1024, 1024, 640, 64)
    assert not PA.btc_supported(256, 256, 1280, 64)   # head-major wins
    assert not PA.btc_supported(4096, 77, 320, 64)    # cross-attention
    assert not PA.btc_supported(4096, 4096, 512, 512)  # VAE wide head


def test_btc_fused_out_attention_matches_reference():
    """Out-projection-fused channel-flat kernel (interpret mode): the
    in-kernel (BQ, inner) @ (inner, C) epilogue must equal attention
    followed by a separate out-proj matmul, forward and (custom-VJP)
    gradients incl. the wo grad."""
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn import pallas_attention as PA

    b, t, h, d, c = 2, 256, 2, 64, 96
    inner = h * d
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    q = jax.random.normal(ks[0], (b, t, inner), jnp.float32)
    k = jax.random.normal(ks[1], (b, t, inner), jnp.float32)
    v = jax.random.normal(ks[2], (b, t, inner), jnp.float32)
    wo = jax.random.normal(ks[3], (inner, c), jnp.float32) * inner ** -0.5
    scale = d ** -0.5
    q_pre = q * (scale * PA._LOG2E)
    ours = PA._fused_raw_btc_out(q_pre, k, v, wo, d, interpret=True)
    ref = PA._xla_reference_btc(q, k, v, scale, d) @ wo
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               atol=2e-3, rtol=2e-3)

    # gradient path incl. the fused weight: diffable == XLA reference
    f = PA._make_diffable_btc_out(functools.partial(PA._fused_raw_btc_out,
                                                    interpret=True))

    def loss_pallas(qp, w):
        return (f(qp, k, v, w, d) ** 2).sum()

    def loss_ref(qp, w):
        return ((PA._xla_reference_btc(qp, k, v, PA._LN2, d) @ w) ** 2).sum()

    g1q, g1w = jax.grad(loss_pallas, argnums=(0, 1))(q_pre, wo)
    g2q, g2w = jax.grad(loss_ref, argnums=(0, 1))(q_pre, wo)
    np.testing.assert_allclose(np.asarray(g1q), np.asarray(g2q), atol=2e-2,
                               rtol=2e-2)
    np.testing.assert_allclose(np.asarray(g1w), np.asarray(g2w), atol=2e-2,
                               rtol=2e-2)


def test_chunked_train_attention_matches_unchunked():
    """The training-path query-chunked attention (Rabe-Staats lax.map over
    query blocks, attention.py:_chunked_attention) must be numerically
    identical to the unchunked op in both forward and gradients — softmax
    is per-query-row, so chunking changes only the schedule."""
    import os

    p = A.mha_init(jax.random.PRNGKey(0), 32, 2, 16)
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 32))

    def run(chunk):
        old = os.environ.get("UNIRESTORE_TRAIN_ATTN_CHUNK")
        os.environ["UNIRESTORE_TRAIN_ATTN_CHUNK"] = chunk
        try:
            with A.force_xla_attention():
                out = A.mha(p, x, heads=2)
                g = jax.grad(
                    lambda p_: jnp.sum(A.mha(p_, x, heads=2) ** 2))(p)
        finally:
            if old is None:
                del os.environ["UNIRESTORE_TRAIN_ATTN_CHUNK"]
            else:
                os.environ["UNIRESTORE_TRAIN_ATTN_CHUNK"] = old
        return out, g

    out_c, g_c = run("128")
    out_u, g_u = run("0")
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(out_u),
                               atol=1e-5)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), g_c, g_u)


def test_chunked_attention_not_used_outside_training():
    """Outside force_xla_attention (inference traces) the chunk gate must
    stay off regardless of sequence length."""
    assert A._train_attn_chunk(4096, 4096) == 0
    with A.force_xla_attention():
        assert A._train_attn_chunk(4096, 4096) == 512
        assert A._train_attn_chunk(4096, 77) == 0    # cross-attention
        assert A._train_attn_chunk(512, 512) == 0    # too short to matter


def test_chunk_snap_non_pow2_resolutions():
    """The chunk size must snap to the largest divisor of t <= the knob
    for non-pow2 token counts (288px -> t=1296, 352px -> 1936, ...) —
    a gcd snap only extracted t's powers of two and silently fell back
    to the full S^2 backward for most of these."""
    with A.force_xla_attention():
        assert A._train_attn_chunk(4096, 4096) == 512   # pow2: exact
        assert A._train_attn_chunk(2304, 2304) == 384   # 384px
        assert A._train_attn_chunk(1296, 1296) == 432   # 288px
        assert A._train_attn_chunk(1936, 1936) == 484   # 352px
        assert A._train_attn_chunk(4900, 4900) == 490   # 560px
        # snapped chunk always divides t (lax.map requires it)
        for t in (1296, 1600, 1936, 2304, 2704, 3136, 3600, 4900):
            c = A._train_attn_chunk(t, t)
            assert c and t % c == 0 and c <= 512


def test_pallas_grouped_conv_matches_xla():
    """Supergroup-matmul grouped-conv kernel (interpret mode on CPU) ==
    XLA's feature_group_count conv, forward and custom-VJP backward (the
    CFRM AdaNAF grouped 3x3, cfrm.py:30-style shapes scaled down)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.nn.pallas_grouped_conv import (grouped_conv3_pallas,
                                                       _xla_reference,
                                                       supported)

    assert supported((8, 256, 256, 512), (3, 3, 32, 512), 16)
    assert supported((8, 64, 64, 2048), (3, 3, 128, 2048), 16)
    assert not supported((8, 256, 256, 320), (3, 3, 20, 320), 16)  # lanes
    assert not supported((8, 256, 256, 512), (3, 3, 32, 256), 16)  # cout
    assert not supported((8, 250, 256, 512), (3, 3, 32, 512), 16)  # rows

    rng = np.random.default_rng(0)
    for (b, h, w, c, g) in [(2, 8, 16, 256, 16), (1, 8, 32, 128, 16),
                            (2, 16, 16, 256, 2)]:
        x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.3, jnp.float32)
        wk = jnp.asarray(rng.normal(size=(3, 3, c // g, c)) * 0.05,
                         jnp.float32)
        assert supported(x.shape, wk.shape, g)
        want = _xla_reference(x, wk, g)
        for variant in ("v2", "v3"):
            got = grouped_conv3_pallas(x, wk, g, True, variant)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-4,
                                       err_msg=variant)
        # custom VJP (XLA-graph backward) must match grads of the native op
        f = lambda xx, ww: (grouped_conv3_pallas(xx, ww, g, True) ** 2).sum()
        fr = lambda xx, ww: (_xla_reference(xx, ww, g) ** 2).sum()
        gx, gw = jax.grad(f, argnums=(0, 1))(x, wk)
        rx, rw = jax.grad(fr, argnums=(0, 1))(x, wk)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx),
                                   atol=2e-3, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(rw),
                                   atol=2e-3, rtol=2e-3)
