"""Golden numerical parity for the frozen SD backbone blocks.

The reference loads its frozen backbone via
``AutoencoderKL/UNet2DConditionModel.from_pretrained("stabilityai/sd-turbo")``
(reference unifie.py:40,60). diffusers is not installed in this image, so
these tests transcribe the exact diffusers modules the checkpoint targets
(torch, eval mode, state-dict keys named identically to diffusers):

- ``ResnetBlock2D`` (diffusers models/resnet.py: pre_norm, SiLU,
  time_embedding_norm="default", output_scale_factor=1)
- ``Transformer2DModel`` with use_linear_projection=True + one
  ``BasicTransformerBlock`` (self-attn, cross-attn, GEGLU FF) — the SD2.1
  attention block
- the VAE mid-block ``Attention`` (1 head, qkv bias, residual connection)
- ``Downsample2D`` (VAE asymmetric pad variant) / ``Upsample2D``
- ``get_timestep_embedding`` (flip_sin_to_cos=True, shift=0)

Each transcription's randomly-initialized state_dict is mapped through the
SAME converter helpers a real sd-turbo checkpoint would use
(tools/convert_sd_turbo.py), loaded into our init templates via
tree_unflatten_dict, and compared in fp64 on identical inputs. A converter
key mismatch fails the coverage assert; a math mismatch fails the allclose.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_sd_turbo as CS  # noqa: E402

from unirestore_tpu.train.checkpoints import (SEP, tree_flatten_dict,  # noqa: E402
                                              tree_unflatten_dict)


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _n(y_torch):
    return np.transpose(y_torch.detach().numpy(), (0, 2, 3, 1))


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _randomize(mod, seed):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.5, generator=g))
    return mod.double().eval()


def _x64(fn, *args):
    with jax.enable_x64(True):
        return np.asarray(fn(*(jnp.asarray(a) for a in args)))


def _load(template, put, sd):
    """Map ``sd`` through a convert_sd_turbo helper into ``template``,
    asserting the converter covers the template's every leaf."""
    flat = {}
    put(flat, "m", "m", {f"m.{k}": v for k, v in sd.items()})
    want = {f"m{SEP}{k}" for k in tree_flatten_dict(template)}
    assert set(flat) == want, (sorted(set(flat) - want),
                               sorted(want - set(flat)))
    return tree_unflatten_dict(flat, {"m": template})["m"]


# -- torch transcriptions (state-dict keys == diffusers') --------------------


class TResnetBlock2D(torch.nn.Module):
    """diffusers ResnetBlock2D: norm1-silu-conv1 (+temb proj) -norm2-silu-
    [dropout]-conv2, 1x1 conv_shortcut when channels change."""

    def __init__(self, cin, cout, temb_dim=None, eps=1e-5):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(32, cin, eps=eps)
        self.conv1 = torch.nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = torch.nn.Linear(temb_dim, cout)
        self.norm2 = torch.nn.GroupNorm(32, cout, eps=eps)
        self.conv2 = torch.nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = torch.nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None:
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TAttention(torch.nn.Module):
    """diffusers Attention core: per-head softmax(qk^T/sqrt(d))v, to_out.0
    output projection (to_out.1 is dropout, identity at eval)."""

    def __init__(self, dim, heads, dim_head, ctx_dim=None, qkv_bias=False):
        super().__init__()
        inner, ctx = heads * dim_head, ctx_dim if ctx_dim else dim
        self.heads, self.dim_head = heads, dim_head
        self.to_q = torch.nn.Linear(dim, inner, bias=qkv_bias)
        self.to_k = torch.nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_v = torch.nn.Linear(ctx, inner, bias=qkv_bias)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(inner, dim)])

    def forward(self, x, ctx=None):
        ctx = x if ctx is None else ctx
        b, t, _ = x.shape

        def split(y):
            return y.view(b, -1, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = split(self.to_q(x)), split(self.to_k(ctx)), split(
            self.to_v(ctx))
        att = torch.softmax(
            q @ k.transpose(-1, -2) * self.dim_head ** -0.5, dim=-1)
        o = (att @ v).transpose(1, 2).reshape(b, t, -1)
        return self.to_out[0](o)


class TBasicTransformerBlock(torch.nn.Module):
    """diffusers BasicTransformerBlock: LN-selfattn, LN-crossattn, LN-GEGLU
    feed-forward (ff.net = [GEGLU proj, dropout, linear]), all residual."""

    def __init__(self, dim, heads, dim_head, ctx_dim):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(dim)
        self.attn1 = TAttention(dim, heads, dim_head)
        self.norm2 = torch.nn.LayerNorm(dim)
        self.attn2 = TAttention(dim, heads, dim_head, ctx_dim=ctx_dim)
        self.norm3 = torch.nn.LayerNorm(dim)
        geglu = torch.nn.Module()
        geglu.proj = torch.nn.Linear(dim, dim * 8)
        self.ff = torch.nn.Module()
        self.ff.net = torch.nn.ModuleList(
            [geglu, torch.nn.Identity(), torch.nn.Linear(dim * 4, dim)])

    def forward(self, x, ctx):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), ctx)
        h, gate = self.ff.net[0].proj(self.norm3(x)).chunk(2, dim=-1)
        return x + self.ff.net[2](h * F.gelu(gate))


class TTransformer2D(torch.nn.Module):
    """diffusers Transformer2DModel with use_linear_projection=True
    (the SD2.1/sd-turbo configuration): GroupNorm(eps 1e-6) -> flatten ->
    Linear proj_in -> blocks -> Linear proj_out -> + residual."""

    def __init__(self, c, heads, ctx_dim):
        super().__init__()
        self.norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.proj_in = torch.nn.Linear(c, c)
        self.transformer_blocks = torch.nn.ModuleList(
            [TBasicTransformerBlock(c, heads, c // heads, ctx_dim)])
        self.proj_out = torch.nn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        return res + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TVaeAttention(torch.nn.Module):
    """The AutoencoderKL mid-block Attention: GroupNorm(eps 1e-6), one head
    over HW tokens, qkv bias, residual connection."""

    def __init__(self, c):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(32, c, eps=1e-6)
        self.inner = TAttention(c, 1, c, qkv_bias=True)
        # alias submodules so state_dict keys match diffusers (to_q at top)
        self.to_q, self.to_k = self.inner.to_q, self.inner.to_k
        self.to_v, self.to_out = self.inner.to_v, self.inner.to_out

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.inner(h)
        return x + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)

    def state_dict(self, *a, **k):  # drop the duplicate "inner.*" keys
        sd = super().state_dict(*a, **k)
        return {k2: v for k2, v in sd.items() if not k2.startswith("inner.")}


# -- tests --------------------------------------------------------------------


@pytest.mark.parametrize("cin,cout,temb,eps", [
    (64, 64, 96, 1e-5),    # UNet same-width block (time conditioning)
    (64, 96, 96, 1e-5),    # UNet widening block (conv_shortcut)
    (64, 96, None, 1e-6),  # VAE block (no temb, eps 1e-6)
])
def test_sd_resnet_block_matches_transcription(cin, cout, temb, eps):
    from unirestore_tpu.nn import resnet as R

    ref = _randomize(TResnetBlock2D(cin, cout, temb, eps), 20)
    p = _load(R.resnet_block_init(jax.random.PRNGKey(0), cin, cout, temb),
              CS._put_resnet, _sd(ref))

    rng = np.random.default_rng(21)
    x = rng.normal(size=(2, 8, 6, cin))
    if temb is None:
        theirs = _n(ref(_t(x)))
        ours = _x64(lambda a: R.resnet_block(
            jax.tree.map(jnp.asarray, p), a, eps=eps), x)
    else:
        emb = rng.normal(size=(2, temb))
        theirs = _n(ref(_t(x), torch.from_numpy(emb)))
        ours = _x64(lambda a, e: R.resnet_block(
            jax.tree.map(jnp.asarray, p), a, e, eps=eps), x, emb)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_sd_transformer2d_matches_transcription():
    from unirestore_tpu.nn import transformer as T

    c, heads, ctx_dim = 64, 2, 48
    ref = _randomize(TTransformer2D(c, heads, ctx_dim), 22)
    p = _load(T.transformer_2d_init(jax.random.PRNGKey(0), c, heads, ctx_dim),
              CS._put_tblock, _sd(ref))

    rng = np.random.default_rng(23)
    x = rng.normal(size=(2, 4, 6, c)) * 0.5
    ctx = rng.normal(size=(2, 7, ctx_dim)) * 0.5
    theirs = _n(ref(_t(x), torch.from_numpy(ctx)))
    ours = _x64(lambda a, s: T.transformer_2d(
        jax.tree.map(jnp.asarray, p), a, s, heads=heads), x, ctx)
    # jax.nn.dot_product_attention performs its softmax in fp32 even for
    # f64 operands, capping attainable agreement at ~fp32 eps per token
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_vae_mid_attention_matches_transcription():
    from unirestore_tpu.nn import attention as A

    c = 64
    ref = _randomize(TVaeAttention(c), 24)
    p = _load(A.spatial_self_attention_init(jax.random.PRNGKey(0), c, heads=1),
              CS._put_vae_attn, _sd(ref))

    rng = np.random.default_rng(25)
    x = rng.normal(size=(2, 5, 6, c)) * 0.5
    theirs = _n(ref(_t(x)))
    ours = _x64(lambda a: A.spatial_self_attention(
        jax.tree.map(jnp.asarray, p), a, heads=1), x)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["asym", "sym"])
def test_downsample_matches_transcription(mode):
    """VAE Downsample2D zero-pads (0,1,0,1) then runs a VALID stride-2 conv
    (diffusers downsampling.py); the UNet variant uses symmetric padding."""
    from unirestore_tpu.nn import resnet as R

    conv = _randomize(torch.nn.Conv2d(32, 32, 3, stride=2,
                                      padding=0 if mode == "asym" else 1), 26)
    flat = {}
    CS._put_conv(flat, f"m{SEP}conv", "m.conv",
                 {f"m.conv.{k}": v for k, v in _sd(conv).items()})
    p = tree_unflatten_dict(
        {k: v for k, v in flat.items()},
        {"m": R.downsample_init(jax.random.PRNGKey(0), 32)})["m"]

    rng = np.random.default_rng(27)
    x = rng.normal(size=(2, 9, 7, 32))
    xt = _t(x)
    if mode == "asym":
        xt = F.pad(xt, (0, 1, 0, 1))
    theirs = _n(conv(xt))
    ours = _x64(lambda a: R.downsample(
        jax.tree.map(jnp.asarray, p), a, pad_mode=mode), x)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_upsample_matches_transcription():
    """Upsample2D: nearest 2x then 3x3 conv (diffusers upsampling.py)."""
    from unirestore_tpu.nn import resnet as R

    conv = _randomize(torch.nn.Conv2d(32, 32, 3, padding=1), 28)
    flat = {}
    CS._put_conv(flat, f"m{SEP}conv", "m.conv",
                 {f"m.conv.{k}": v for k, v in _sd(conv).items()})
    p = tree_unflatten_dict(
        flat, {"m": R.upsample_init(jax.random.PRNGKey(0), 32)})["m"]

    rng = np.random.default_rng(29)
    x = rng.normal(size=(2, 5, 4, 32))
    theirs = _n(conv(F.interpolate(_t(x), scale_factor=2, mode="nearest")))
    ours = _x64(lambda a: R.upsample(jax.tree.map(jnp.asarray, p), a), x)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_sinusoidal_timestep_embedding_matches_diffusers_formula():
    """Independent numpy transcription of diffusers get_timestep_embedding
    with the UNet2DConditionModel flags (flip_sin_to_cos=True,
    downscale_freq_shift=0): emb = [cos, sin](t * exp(-ln(1e4) * i/half))."""
    from unirestore_tpu.nn import embeddings as E

    ts = np.array([0, 1, 249, 999], np.int32)
    for dim in (320, 160):
        half = dim // 2
        freqs = np.exp(-math.log(10000.0) * np.arange(half) / half)
        args = ts[:, None].astype(np.float64) * freqs[None, :]
        want = np.concatenate([np.cos(args), np.sin(args)], axis=-1)
        got = np.asarray(E.sinusoidal_timestep_embedding(
            jnp.asarray(ts), dim))
        # fp32 phase: t*freq at t=999 carries ~999*eps_f32 ≈ 6e-5 rounding
        np.testing.assert_allclose(got, want.astype(np.float32), atol=2e-4)
