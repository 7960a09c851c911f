"""Composed-model golden parity: full VAE / UNet / Controller forwards.

test_golden_parity.py proves the adapter math and test_golden_backbone.py
proves the backbone block math — but block wiring (which resnet receives
which skip, down/up ordering, mid placement, control injection sites) is
where a rebuild silently diverges. These tests transcribe the COMPLETE
composites in torch, splice in the reference's own adapter modules
(imported read-only from /root/reference), map the randomly-initialized
state_dicts through the production converters
(tools/convert_sd_turbo.py + tools/convert_adapters.py), and compare full
forwards in fp64 at tiny channel widths / small spatial dims:

- SkipConnectedAutoEncoder encode+decode: diffusers AutoencoderKL
  Encoder/Decoder with CFRM after the first three down blocks and TFA
  threading before the first three up blocks (reference
  autoencoder.py:11-110, 132-176).
- ControlledUNet forward: hand-unrolled UNet2DConditionModel with the 12
  CSCEAdapter skip injections keyed by spatial size (reference
  base_model.py:94-245).
- Controller forward: StableSR-config control encoder with the
  ``output[-2]`` per-stage capture, mid replacement, and size-keyed
  fea_tran outputs (reference controller.py:65-220).

Any wiring/order mistake in our composition fails the allclose; any
converter key drift fails the coverage assert.
"""

import math
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_adapters as CA  # noqa: E402
import convert_sd_turbo as CS  # noqa: E402

from test_golden_parity import _ref_module  # noqa: E402
from unirestore_tpu.train.checkpoints import (SEP, tree_flatten_dict,  # noqa: E402
                                              tree_unflatten_dict)

REF = "/root/reference/src/modules/diffuie"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not available")


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _n(y_torch):
    return np.transpose(y_torch.detach().numpy(), (0, 2, 3, 1))


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _randomize(mod, seed, std=0.2):
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, std, generator=g))
    return mod.double().eval()


def _unflatten_covered(flat, template, label):
    want = set(tree_flatten_dict(template))
    assert set(flat) == want, (label, sorted(set(flat) - want)[:8],
                               sorted(want - set(flat))[:8])
    return jax.tree.map(jnp.asarray, tree_unflatten_dict(flat, template))


def _timesteps_embed(ts, dim):
    """diffusers Timesteps(dim, flip_sin_to_cos=True, shift=0) in float64."""
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0)
                      * torch.arange(half, dtype=torch.float64) / half)
    args = ts.double()[:, None] * freqs[None, :]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)


# -- torch composite transcriptions (state-dict keys == diffusers') ----------


class TResnet(nn.Module):
    """diffusers ResnetBlock2D (same data path as base_model.py:56-92),
    parameterized GroupNorm groups/eps for tiny configs."""

    def __init__(self, cin, cout, temb_dim=None, groups=32, eps=1e-5):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        if temb_dim is not None:
            self.time_emb_proj = nn.Linear(temb_dim, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        if cin != cout:
            self.conv_shortcut = nn.Conv2d(cin, cout, 1)

    def forward(self, x, temb=None):
        h = self.conv1(F.silu(self.norm1(x)))
        if temb is not None and hasattr(self, "time_emb_proj"):
            h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if hasattr(self, "conv_shortcut"):
            x = self.conv_shortcut(x)
        return x + h


class TSpatialAttention(nn.Module):
    """Deprecated-style diffusers Attention over HW tokens (AttnDownBlock2D /
    UNetMidBlock2D / VAE mid): group_norm, biased qkv, residual."""

    def __init__(self, c, heads, groups=32, eps=1e-5):
        super().__init__()
        self.heads, self.dim_head = heads, c // heads
        self.group_norm = nn.GroupNorm(groups, c, eps=eps)
        self.to_q = nn.Linear(c, c, bias=True)
        self.to_k = nn.Linear(c, c, bias=True)
        self.to_v = nn.Linear(c, c, bias=True)
        self.to_out = nn.ModuleList([nn.Linear(c, c)])

    def forward(self, x):
        b, c, hh, ww = x.shape
        h = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)

        def split(y):
            return y.view(b, -1, self.heads, self.dim_head).transpose(1, 2)

        q, k, v = split(self.to_q(h)), split(self.to_k(h)), split(self.to_v(h))
        att = torch.softmax(q @ k.transpose(-1, -2) * self.dim_head ** -0.5,
                            dim=-1)
        o = (att @ v).transpose(1, 2).reshape(b, hh * ww, c)
        o = self.to_out[0](o)
        return x + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


class TTransformer2D(nn.Module):
    """diffusers Transformer2DModel (use_linear_projection=True) with one
    BasicTransformerBlock — self-attn, cross-attn, GEGLU FF."""

    class Block(nn.Module):
        def __init__(self, dim, heads, ctx_dim):
            super().__init__()
            h, d = heads, dim // heads

            def attn(ctx):
                m = nn.Module()
                m.to_q = nn.Linear(dim, dim, bias=False)
                m.to_k = nn.Linear(ctx, dim, bias=False)
                m.to_v = nn.Linear(ctx, dim, bias=False)
                m.to_out = nn.ModuleList([nn.Linear(dim, dim)])
                m.heads, m.dim_head = h, d
                return m

            self.norm1, self.attn1 = nn.LayerNorm(dim), attn(dim)
            self.norm2, self.attn2 = nn.LayerNorm(dim), attn(ctx_dim)
            self.norm3 = nn.LayerNorm(dim)
            geglu = nn.Module()
            geglu.proj = nn.Linear(dim, dim * 8)
            self.ff = nn.Module()
            self.ff.net = nn.ModuleList(
                [geglu, nn.Identity(), nn.Linear(dim * 4, dim)])

        @staticmethod
        def _attend(m, x, ctx):
            b, t, _ = x.shape

            def split(y):
                return y.view(b, -1, m.heads, m.dim_head).transpose(1, 2)

            q, k, v = split(m.to_q(x)), split(m.to_k(ctx)), split(m.to_v(ctx))
            att = torch.softmax(
                q @ k.transpose(-1, -2) * m.dim_head ** -0.5, dim=-1)
            o = (att @ v).transpose(1, 2).reshape(b, t, -1)
            return m.to_out[0](o)

        def forward(self, x, ctx):
            x = x + self._attend(self.attn1, self.norm1(x), self.norm1(x))
            x = x + self._attend(self.attn2, self.norm2(x), ctx)
            h, gate = self.ff.net[0].proj(self.norm3(x)).chunk(2, dim=-1)
            return x + self.ff.net[2](h * F.gelu(gate))

    def __init__(self, c, heads, ctx_dim, groups=32):
        super().__init__()
        self.norm = nn.GroupNorm(groups, c, eps=1e-6)
        self.proj_in = nn.Linear(c, c)
        self.transformer_blocks = nn.ModuleList(
            [self.Block(c, heads, ctx_dim)])
        self.proj_out = nn.Linear(c, c)

    def forward(self, x, ctx):
        b, c, hh, ww = x.shape
        res = x
        h = self.norm(x).permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = self.proj_in(h)
        for blk in self.transformer_blocks:
            h = blk(h, ctx)
        h = self.proj_out(h)
        return res + h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def _downsampler(c, padding):
    m = nn.Module()
    m.conv = nn.Conv2d(c, c, 3, stride=2, padding=padding)
    m.padding = padding
    m.forward = (lambda x, m=m: m.conv(F.pad(x, (0, 1, 0, 1)))
                 if m.padding == 0 else m.conv(x))
    return m


def _upsampler(c):
    m = nn.Module()
    m.conv = nn.Conv2d(c, c, 3, padding=1)
    m.forward = lambda x, m=m: m.conv(
        F.interpolate(x, scale_factor=2, mode="nearest"))
    return m


# -- composed VAE (reference autoencoder.py semantics) ------------------------


class TVae(nn.Module):
    """AutoencoderKL Encoder+Decoder transcription (diffusers vae.py) with
    the reference's monkey-patched forwards made explicit:
    encoder: conv_in -> 3x(DownEncoderBlock2D -> CFRM -> capture skip) ->
    last block -> mid -> head -> quant_conv (autoencoder.py:11-35);
    decoder: post_quant -> conv_in -> mid -> 3x(TFA -> UpDecoderBlock2D) ->
    last block -> head (autoencoder.py:37-72)."""

    SCALING = 0.18215

    def __init__(self, chans, latent, groups, fr_blocks, task_editors,
                 task_prompts):
        super().__init__()
        eps = 1e-6
        enc = nn.Module()
        enc.conv_in = nn.Conv2d(3, chans[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = chans[0]
        for i, cout in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, None, groups, eps)
                 for j in range(2)])
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([_downsampler(cout, 0)])
            enc.down_blocks.append(blk)
            cin = cout
        enc.mid_block = nn.Module()
        enc.mid_block.resnets = nn.ModuleList(
            [TResnet(chans[-1], chans[-1], None, groups, eps)
             for _ in range(2)])
        enc.mid_block.attentions = nn.ModuleList(
            [TSpatialAttention(chans[-1], 1, groups, eps)])
        enc.conv_norm_out = nn.GroupNorm(groups, chans[-1], eps=eps)
        enc.conv_out = nn.Conv2d(chans[-1], 2 * latent, 3, padding=1)
        self.encoder = enc
        self.quant_conv = nn.Conv2d(2 * latent, 2 * latent, 1)
        self.post_quant_conv = nn.Conv2d(latent, latent, 1)

        dec = nn.Module()
        rev = list(reversed(chans))
        dec.conv_in = nn.Conv2d(latent, rev[0], 3, padding=1)
        dec.mid_block = nn.Module()
        dec.mid_block.resnets = nn.ModuleList(
            [TResnet(rev[0], rev[0], None, groups, eps) for _ in range(2)])
        dec.mid_block.attentions = nn.ModuleList(
            [TSpatialAttention(rev[0], 1, groups, eps)])
        dec.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, cout in enumerate(rev):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, None, groups, eps)
                 for j in range(3)])
            if i < len(rev) - 1:
                blk.upsamplers = nn.ModuleList([_upsampler(cout)])
            dec.up_blocks.append(blk)
            cin = cout
        dec.conv_norm_out = nn.GroupNorm(groups, rev[-1], eps=eps)
        dec.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

        # adapters: the reference's own modules, spliced as in
        # autoencoder.py:92-98 (encoder) and :117-126 (decoder)
        self.fr_blocks = fr_blocks
        self.task_editors = task_editors
        self.task_prompts = task_prompts

    @staticmethod
    def _block(blk, x, attr):
        for res in blk.resnets:
            x = res(x)
        for s in getattr(blk, attr, []):
            x = s(x)
        return x

    def _mid(self, mid, x):
        x = mid.resnets[0](x)
        x = mid.attentions[0](x)
        return mid.resnets[1](x)

    def encode(self, images, enable_fr=True):
        """autoencoder.py:132-156 with posterior MODE (deterministic)."""
        h = self.encoder.conv_in(images * 2 - 1)
        skips = []
        for i, blk in enumerate(self.encoder.down_blocks[:-1]):
            h = self._block(blk, h, "downsamplers")
            if enable_fr:
                h = self.fr_blocks[i](h)
            skips.append(h)
        h = self._block(self.encoder.down_blocks[-1], h, "downsamplers")
        h = self._mid(self.encoder.mid_block, h)
        h = self.encoder.conv_out(F.silu(self.encoder.conv_norm_out(h)))
        moments = self.quant_conv(h)
        mean, _ = moments.chunk(2, dim=1)
        return mean * self.SCALING, skips

    def decode(self, latents, skips, task):
        """autoencoder.py:37-72, 158-176."""
        h = self.post_quant_conv(latents / self.SCALING)
        h = self.decoder.conv_in(h)
        h = self._mid(self.decoder.mid_block, h)
        b = h.shape[0]
        cond = self.task_prompts[task].unsqueeze(0).expand(b, -1, -1)
        for idx, blk in enumerate(self.decoder.up_blocks[:-1]):
            h, cond = self.task_editors[idx](h, skips[-idx - 1], cond)
            h = self._block(blk, h, "upsamplers")
        h = self._block(self.decoder.up_blocks[-1], h, "upsamplers")
        h = self.decoder.conv_out(F.silu(self.decoder.conv_norm_out(h)))
        return (h + 1) / 2


def test_composed_vae_encode_decode_matches_reference_wiring():
    from unirestore_tpu.models import vae as VAE

    naf = _ref_module("nafnet_arch")
    cfrm = _ref_module("cfrm")
    ted = _ref_module("taskeditor")

    chans, latent, groups, depths = (16, 32, 64, 64), 4, 8, (1, 1, 2)
    fr_blocks = nn.ModuleList([
        nn.Sequential(*[naf.NAFBlock(c) for _ in range(d)], cfrm.AdaNAFV2(c))
        for c, d in zip(chans[:3], depths)])
    # c_skip per editor = reversed skip channels (autoencoder.py:122-126)
    task_editors = nn.ModuleList([
        ted.TaskFeatureAdapter(chans[-1], chans[2], prompt_len=1),
        ted.TaskFeatureAdapter(chans[-1], chans[1], prompt_len=1),
        ted.TaskFeatureAdapter(chans[-1], chans[0], prompt_len=1,
                               last_layer=True)])
    task_prompts = nn.ParameterDict(
        {t: nn.Parameter(torch.zeros(1, chans[-1])) for t in ("ir", "cls")})
    ref = _randomize(
        TVae(chans, latent, groups, fr_blocks, task_editors, task_prompts), 40)

    sd = _sd(ref)
    vae_sd = {k: v for k, v in sd.items()
              if k.split(".")[0] in ("encoder", "decoder", "quant_conv",
                                     "post_quant_conv")}
    cfg = VAE.VAEConfig(block_out_channels=chans, cfrm_depths=depths,
                        norm_num_groups=groups)
    p = _unflatten_covered(CS.convert_vae(vae_sd),
                           VAE.vae_init(jax.random.PRNGKey(0), cfg), "vae")
    fr = jax.tree.map(jnp.asarray, CA.convert_cfrm(
        {f"model.ae.vae.encoder.{k}": v for k, v in sd.items()
         if k.startswith("fr_blocks.")}, depths=depths))
    tfa = jax.tree.map(jnp.asarray, CA.convert_tfa(
        {f"model.ae.vae.decoder.{k}": v for k, v in sd.items()
         if k.startswith(("task_editors.", "task_prompts."))}))

    rng = np.random.default_rng(41)
    x = rng.uniform(0.1, 0.9, size=(2, 32, 32, 3))
    lat_t, skips_t = ref.encode(_t(x))
    out_t = ref.decode(lat_t, skips_t, "ir")

    with jax.enable_x64(True):
        lat, skips = VAE.encode(p, jnp.asarray(x), cfg, fr_params=fr,
                                enable_fr=True, sample=False)
        out = VAE.decode(p, lat, cfg, skips=skips, tfa_params=tfa, task="ir",
                         prompt_len=1)
    np.testing.assert_allclose(np.asarray(lat), _n(lat_t), atol=1e-5,
                               rtol=1e-5)
    for ours_s, theirs_s in zip(skips, skips_t):
        np.testing.assert_allclose(np.asarray(ours_s), _n(theirs_s),
                                   atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), _n(out_t), atol=1e-5,
                               rtol=1e-5)

    # task routing: a different prompt must change the output (and match)
    out_t2 = ref.decode(lat_t, skips_t, "cls")
    with jax.enable_x64(True):
        out2 = VAE.decode(p, lat, cfg, skips=skips, tfa_params=tfa,
                          task="cls", prompt_len=1)
    assert np.abs(np.asarray(out2) - np.asarray(out)).max() > 1e-8
    np.testing.assert_allclose(np.asarray(out2), _n(out_t2), atol=1e-5,
                               rtol=1e-5)


# -- composed ControlledUNet (reference base_model.py semantics) --------------


class TControlledUNet(nn.Module):
    """UNet2DConditionModel transcription with the reference's hand-unrolled
    forward and the 12 CSCEAdapter injections (base_model.py:94-245)."""

    def __init__(self, chans, heads, ctx_dim, cross, csc_editors, groups=32):
        super().__init__()
        eps, temb_dim = 1e-5, chans[0] * 4
        self.chans, self.heads, self.cross = chans, heads, cross
        self.conv_in = nn.Conv2d(4, chans[0], 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(chans[0], temb_dim)
        self.time_embedding.linear_2 = nn.Linear(temb_dim, temb_dim)

        self.down_blocks = nn.ModuleList()
        skip_chans = [chans[0]]
        cin = chans[0]
        for i, cout in enumerate(chans):
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, temb_dim, groups, eps)
                 for j in range(2)])
            if cross[i]:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(cout, heads[i], ctx_dim, groups)
                     for _ in range(2)])
            skip_chans += [cout, cout]
            if i < len(chans) - 1:
                blk.downsamplers = nn.ModuleList([_downsampler(cout, 1)])
                skip_chans.append(cout)
            self.down_blocks.append(blk)
            cin = cout

        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(chans[-1], chans[-1], temb_dim, groups, eps)
             for _ in range(2)])
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(chans[-1], heads[-1], ctx_dim, groups)])

        self.up_blocks = nn.ModuleList()
        rev = list(reversed(chans))
        pops = list(skip_chans)
        prev = chans[-1]
        for i, cout in enumerate(rev):
            lvl = len(chans) - 1 - i
            blk = nn.Module()
            blk.resnets = nn.ModuleList()
            for j in range(3):
                skip_c = pops.pop()
                blk.resnets.append(TResnet((prev if j == 0 else cout) + skip_c,
                                           cout, temb_dim, groups, eps))
            if cross[lvl]:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(cout, heads[lvl], ctx_dim, groups)
                     for _ in range(3)])
            if i < len(chans) - 1:
                blk.upsamplers = nn.ModuleList([_upsampler(cout)])
            self.up_blocks.append(blk)
            prev = cout

        self.conv_norm_out = nn.GroupNorm(groups, chans[0], eps=eps)
        self.conv_out = nn.Conv2d(chans[0], 4, 3, padding=1)
        self.csc_editors = csc_editors

    def forward(self, sample, control, timesteps, ctx):
        """base_model.py:211-245: encoder -> csc injection -> decoder."""
        temb = _timesteps_embed(timesteps, self.chans[0])
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        sample = self.conv_in(sample)
        skips = [sample]
        for i, blk in enumerate(self.down_blocks):
            if hasattr(blk, "attentions"):
                for res, attn in zip(blk.resnets, blk.attentions):
                    sample = attn(res(sample, emb), ctx)
                    skips.append(sample)
            else:
                for res in blk.resnets:
                    sample = res(sample, emb)
                    skips.append(sample)
            if hasattr(blk, "downsamplers"):
                sample = blk.downsamplers[0](sample)
                skips.append(sample)

        sample = self.mid_block.resnets[0](sample, emb)
        sample = self.mid_block.attentions[0](sample, ctx)
        sample = self.mid_block.resnets[1](sample, emb)

        for i, csce in enumerate(self.csc_editors):
            skips[i] = csce(skips[i], control[skips[i].shape[-1]])

        for blk in self.up_blocks:
            res_samples, skips = skips[-3:], skips[:-3]
            for j, res in enumerate(blk.resnets):
                sample = torch.cat([sample, res_samples[-j - 1]], dim=1)
                sample = res(sample, emb)
                if hasattr(blk, "attentions"):
                    sample = blk.attentions[j](sample, ctx)
            if hasattr(blk, "upsamplers"):
                sample = blk.upsamplers[0](sample)

        return self.conv_out(F.silu(self.conv_norm_out(sample)))


def test_composed_controlled_unet_matches_reference_wiring():
    from unirestore_tpu.models import unet as UN

    sc = _ref_module("scedit")
    chans, heads, ctx_dim = (32, 64, 64, 64), (2, 2, 2, 2), 64
    cross, cc = (True, True, True, False), 32
    # the 12 injection channels (base_model.py:39): [c0]*4 + [c1]*3 + [c2]*5
    csc_chans = [chans[0]] * 4 + [chans[1]] * 3 + [chans[2]] * 5
    csc = nn.ModuleList([sc.CSCEAdapter(c, c, cc) for c in csc_chans])
    ref = _randomize(
        TControlledUNet(chans, heads, ctx_dim, cross, csc), 50)

    sd = _sd(ref)
    cfg = UN.UNetConfig(block_out_channels=chans, cross_attention=cross,
                        heads=heads, cross_attention_dim=ctx_dim,
                        control_channels=cc)
    backbone_sd = {k: v for k, v in sd.items()
                   if not k.startswith("csc_editors.")}
    p = _unflatten_covered(CS.convert_unet(backbone_sd),
                           UN.unet_init(jax.random.PRNGKey(0), cfg), "unet")
    ctrl = jax.tree.map(jnp.asarray, {"csc_editors": CA.convert_sc_tuner(
        {f"model.base_model.{k}": v for k, v in sd.items()
         if k.startswith("csc_editors.")})})

    rng = np.random.default_rng(51)
    z = rng.normal(size=(2, 16, 16, 4)) * 0.3
    ctx = rng.normal(size=(2, 7, ctx_dim)) * 0.3
    control = [rng.normal(size=(2, 16 >> s, 16 >> s, cc)) * 0.3
               for s in range(4)]
    ts = np.array([249.0, 999.0])

    control_t = {c.shape[1]: _t(c) for c in control}
    out_t = ref(_t(z), control_t, torch.from_numpy(ts),
                torch.from_numpy(ctx))

    with jax.enable_x64(True):
        out = UN.unet_apply(p, cfg, jnp.asarray(z),
                            jnp.asarray(ts.astype(np.int32)),
                            jnp.asarray(ctx),
                            control=[jnp.asarray(c) for c in control],
                            control_params=ctrl)
    # fp32 softmax inside jax.nn.dot_product_attention caps agreement
    np.testing.assert_allclose(np.asarray(out), _n(out_t), atol=2e-4,
                               rtol=2e-4)


# -- composed Controller (reference controller.py semantics) ------------------


class TController(nn.Module):
    """StableSR-config Controller transcription (controller.py:65-220):
    AttnDownBlock2D x3 + DownBlock2D, UNetMidBlock2D, per-stage fea_tran,
    output[-2] capture with mid replacement, size-keyed dict."""

    def __init__(self, model_ch, out_ch, mult, heads, groups=32):
        super().__init__()
        eps, temb_dim = 1e-5, model_ch * 4
        self.model_ch, self.heads = model_ch, heads
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(model_ch, temb_dim)
        self.time_embedding.linear_2 = nn.Linear(temb_dim, temb_dim)
        self.conv_in = nn.Conv2d(4, model_ch, 3, padding=1)

        self.down_blocks = nn.ModuleList()
        stage_chans = []
        cin = model_ch
        for i, m in enumerate(mult):
            cout = model_ch * m
            is_final = i == len(mult) - 1
            blk = nn.Module()
            blk.resnets = nn.ModuleList(
                [TResnet(cin if j == 0 else cout, cout, temb_dim, groups, eps)
                 for j in range(2)])
            if not is_final:  # AttnDownBlock2D stages
                blk.attentions = nn.ModuleList(
                    [TSpatialAttention(cout, heads, groups, eps)
                     for _ in range(2)])
                blk.downsamplers = nn.ModuleList([_downsampler(cout, 1)])
            self.down_blocks.append(blk)
            stage_chans.append(cout)
            cin = cout

        self.middle_block = nn.Module()
        self.middle_block.resnets = nn.ModuleList(
            [TResnet(cin, cin, temb_dim, groups, eps) for _ in range(2)])
        self.middle_block.attentions = nn.ModuleList(
            [TSpatialAttention(cin, heads, groups, eps)])

        self.fea_tran = nn.ModuleList(
            [TResnet(c, out_ch, temb_dim, groups, eps) for c in stage_chans])

    def forward(self, x, timesteps):
        """controller.py:193-220 with encoder_hidden_states=None."""
        temb = _timesteps_embed(timesteps, self.model_ch)
        emb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(temb)))

        captures = []
        h = self.conv_in(x)
        for blk in self.down_blocks:
            outputs = []
            for j, res in enumerate(blk.resnets):
                h = res(h, emb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h)
                outputs.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0](h)
                outputs.append(h)
            captures.append(outputs[-2])  # controller.py:205

        h = self.middle_block.resnets[0](h, emb)
        h = self.middle_block.attentions[0](h)
        h = self.middle_block.resnets[1](h, emb)
        captures[-1] = h  # controller.py:211

        return {c.size(-1): ft(c, emb)
                for c, ft in zip(captures, self.fea_tran)}


def test_composed_controller_matches_reference_wiring():
    from unirestore_tpu.models import controller as CT

    model_ch, out_ch, heads = 32, 32, 2
    ref = _randomize(TController(model_ch, out_ch, (1, 1, 2, 2), heads), 60)

    cfg = CT.ControllerConfig(model_channels=model_ch, out_channels=out_ch,
                              num_heads=heads)
    p = jax.tree.map(jnp.asarray, CA.convert_controller(
        {f"model.controller.{k}": v for k, v in _sd(ref).items()}))
    # converter coverage against our init template
    want = set(tree_flatten_dict(
        CT.controller_init(jax.random.PRNGKey(0), cfg)))
    got = set(tree_flatten_dict(p))
    assert got == want, (sorted(got - want)[:8], sorted(want - got)[:8])

    rng = np.random.default_rng(61)
    x = rng.normal(size=(2, 16, 16, 4)) * 0.5
    ts = np.array([0.0, 749.0])
    out_t = ref(_t(x), torch.from_numpy(ts))

    with jax.enable_x64(True):
        outs = CT.controller_apply(p, cfg, jnp.asarray(x),
                                   jnp.asarray(ts.astype(np.int32)))
    sizes = [16, 8, 4, 2]
    assert set(out_t.keys()) == set(sizes)
    for i, s in enumerate(sizes):
        # fp32 softmax inside the attention caps agreement at ~1e-4 here
        np.testing.assert_allclose(np.asarray(outs[i]), _n(out_t[s]),
                                   atol=1e-4, rtol=1e-4,
                                   err_msg=f"control scale {s}")
