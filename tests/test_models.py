import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unirestore_tpu.models import cfrm as CFRM
from unirestore_tpu.models import controller as CTRL
from unirestore_tpu.models import nafnet as NAF
from unirestore_tpu.models import scedit as SC
from unirestore_tpu.models import spade as SP
from unirestore_tpu.models import tfa as TFA
from unirestore_tpu.models import unet as UN
from unirestore_tpu.models import unirestore as UR
from unirestore_tpu.models import vae as VAE


def test_naf_block_identity_at_init():
    # beta/gamma zero-init -> fresh NAFBlock is the identity
    p = NAF.naf_block_init(jax.random.PRNGKey(0), 16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 16))
    y = NAF.naf_block(p, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_nafnet_runs():
    p = NAF.nafnet_init(jax.random.PRNGKey(0), width=8, middle_blk_num=1,
                        enc_blk_nums=(1, 1), dec_blk_nums=(1, 1))
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 16, 3))
    y = NAF.nafnet(p, x)
    assert y.shape == x.shape


def test_ada_naf_v2_shapes():
    p = CFRM.ada_naf_v2_init(jax.random.PRNGKey(0), 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 32))
    assert CFRM.ada_naf_v2(p, x).shape == x.shape


def test_dense_block_diag_equals_grouped_conv():
    """The TPU fast path for AdaNAFV2's grouped 3x3 (dense block-diagonal
    kernel) must match the grouped conv in forward AND gradient w.r.t. the
    grouped parameter."""
    import numpy as np
    from unirestore_tpu.nn import layers as L

    p = L.conv2d_init(jax.random.PRNGKey(0), 64, 64, 3, groups=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64))
    a = L.conv2d(p, x, padding=1, groups=16)
    b = CFRM._dense_grouped_conv(p, x, 16, padding=1)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-3)
    ga = jax.grad(lambda w: (L.conv2d({"w": w, "b": p["b"]}, x, padding=1,
                                      groups=16) ** 2).sum())(p["w"])
    gb = jax.grad(lambda w: (CFRM._dense_grouped_conv(
        {"w": w, "b": p["b"]}, x, 16, 1) ** 2).sum())(p["w"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-2)


def test_super_block_fold_equals_grouped_conv():
    """The 4-group fold (TPU lowering for the narrow AdaNAF stage) must
    match the native 16-group conv in forward and grouped-param gradient."""
    import numpy as np
    from unirestore_tpu.nn import layers as L

    p = L.conv2d_init(jax.random.PRNGKey(0), 64, 64, 3, groups=16)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64))
    a = L.conv2d(p, x, padding=1, groups=16)

    def fold4(w):
        return L.conv2d({"w": CFRM._super_block_kernel(w, 16, 4),
                         "b": p["b"]}, x, padding=1, groups=4)

    np.testing.assert_allclose(np.asarray(a), np.asarray(fold4(p["w"])),
                               rtol=1e-5, atol=1e-3)
    ga = jax.grad(lambda w: (L.conv2d({"w": w, "b": p["b"]}, x, padding=1,
                                      groups=16) ** 2).sum())(p["w"])
    gb = jax.grad(lambda w: (fold4(w) ** 2).sum())(p["w"])
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                               rtol=1e-4, atol=1e-2)


def test_loop128_slices_equal_grouped_conv():
    """The 128-lane supergroup-slice lowering (r4 TPU default for the
    dw<=1024 AdaNAF stages) must match the native 16-group conv in
    forward and grouped-param gradient, with and without bias."""
    import numpy as np
    from unirestore_tpu.nn import layers as L

    for c, bias in [(256, True), (128, False)]:
        p = L.conv2d_init(jax.random.PRNGKey(0), c, c, 3, groups=16,
                          bias=bias)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, c))
        want = L.conv2d(p, x, padding=1, groups=16)
        got = CFRM._loop128_grouped_conv(p, x, padding=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-3)
        ga = jax.grad(lambda w: (L.conv2d({**p, "w": w}, x, padding=1,
                                          groups=16) ** 2).sum())(p["w"])
        gb = jax.grad(lambda w: (CFRM._loop128_grouped_conv(
            {**p, "w": w}, x, 1) ** 2).sum())(p["w"])
        np.testing.assert_allclose(np.asarray(ga), np.asarray(gb),
                                   rtol=1e-4, atol=1e-2)


def test_csce_adapter_shapes():
    p = SC.csce_adapter_init(jax.random.PRNGKey(0), 64, 64, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    c = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 32))
    assert SC.csce_adapter(p, x, c).shape == x.shape


def test_spade_resizes_control():
    p = SP.spade_init(jax.random.PRNGKey(0), 64, 32)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 64))
    seg = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, 32))
    assert SP.spade(p, x, seg).shape == x.shape


def test_tfa_threads_condition():
    editors = TFA.tfa_init(jax.random.PRNGKey(0), c_out=64,
                           skip_channels=(64, 32, 16))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))
    cond = jnp.zeros((2, 1, 64))
    skips = [jax.random.normal(jax.random.PRNGKey(i), (2, 8, 8, c))
             for i, c in enumerate((64, 32, 16))]
    for i, ed in enumerate(editors):
        x, cond = TFA.task_feature_adapter(ed, x, skips[i], cond)
        if i < 2:
            assert cond.shape == (2, 1, (64, 32)[i] // 2)
    assert cond is None


def test_vae_roundtrip_and_skips():
    cfg = VAE.tiny_vae_config()
    key = jax.random.PRNGKey(0)
    p = VAE.vae_init(key, cfg)
    fr = VAE.cfrm_adapter_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3))
    z, skips = VAE.encode(p, x, cfg, rng=jax.random.PRNGKey(3), fr_params=fr,
                          enable_fr=True)
    assert z.shape == (1, 8, 8, 4)
    assert [s.shape for s in skips] == [(1, 32, 32, 16), (1, 16, 16, 32),
                                        (1, 8, 8, 64)]
    y = VAE.decode(p, z, cfg)
    assert y.shape == x.shape

    tfa = VAE.tfa_adapter_init(jax.random.PRNGKey(4), cfg, ("ir", "cls"))
    y2 = VAE.decode(p, z, cfg, skips=skips, tfa_params=tfa, task="ir")
    assert y2.shape == x.shape
    # zero-init prompts: different tasks give identical outputs only until
    # prompts are trained; at init conv paths still make TFA != plain decode
    assert not np.allclose(np.asarray(y), np.asarray(y2))


def test_cfrm_gradient_firewall():
    """CFRM grads must flow from skips, not from the latent (detach at
    autoencoder.py:27)."""
    cfg = VAE.tiny_vae_config()
    p = VAE.vae_init(jax.random.PRNGKey(0), cfg)
    fr = VAE.cfrm_adapter_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))

    def latent_loss(fr_params):
        z, _ = VAE.encode(p, x, cfg, fr_params=fr_params, enable_fr=True,
                          sample=False)
        return (z ** 2).mean()

    def skip_loss(fr_params):
        _, skips = VAE.encode(p, x, cfg, fr_params=fr_params, enable_fr=True,
                              sample=False)
        return sum((s ** 2).mean() for s in skips)

    g_lat = jax.grad(latent_loss)(fr)
    g_skip = jax.grad(skip_loss)(fr)
    lat_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_lat))
    skip_norm = sum(float(jnp.abs(g).sum()) for g in jax.tree.leaves(g_skip))
    assert lat_norm == 0.0  # firewall: no grad through the latent path
    assert skip_norm > 0.0


def test_controller_zero_init_outputs_time_bias_only():
    """Zero conv2 everywhere -> fea_tran output is shortcut(capture) + f(temb),
    and captures themselves are shortcut chains; two different inputs with the
    same t must differ only via the (zeroed-conv2) resnet shortcut path."""
    cfg = CTRL.tiny_controller_config()
    p = CTRL.controller_init(jax.random.PRNGKey(0), cfg)
    t = jnp.array([999])
    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    out = CTRL.controller_apply(p, cfg, x1, t)
    assert [o.shape for o in out] == [(1, 16, 16, 32), (1, 8, 8, 32),
                                     (1, 4, 4, 32), (1, 2, 2, 32)]


def test_unet_skip_channels_match_reference():
    cfg = UN.UNetConfig()
    assert cfg.skip_channels() == [320] * 4 + [640] * 3 + [1280] * 5
    assert cfg.skip_scale_indices() == [0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 3]


@pytest.mark.parametrize("control_type", ["scedit", "spade"])
def test_unet_controlled_forward(control_type):
    cfg = UN.tiny_unet_config(control_type)
    p = UN.unet_init(jax.random.PRNGKey(0), cfg)
    cp = UN.control_adapters_init(jax.random.PRNGKey(1), cfg)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    t = jnp.array([999])
    ctx = jax.random.normal(jax.random.PRNGKey(3), (1, 77, 64))
    control = [jax.random.normal(jax.random.PRNGKey(4 + i),
                                 (1, 8 // (2 ** i), 8 // (2 ** i), 32))
               for i in range(4)]
    y = UN.unet_apply(p, cfg, x, t, ctx, control=control, control_params=cp)
    assert y.shape == x.shape


def test_unirestore_end_to_end_tiny():
    cfg = UR.tiny_config()
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 48, 56, 3))
    out = UR.restore(frozen, trainable, cfg, sched, img, "ir",
                     jax.random.PRNGKey(2))
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()


def test_unirestore_jit_per_task():
    cfg = UR.tiny_config()
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))

    @jax.jit
    def run_ir(fz, tr, x, rng):
        return UR.restore_padded(fz, tr, cfg, sched, x, "ir", rng)

    out = run_ir(frozen, trainable, img, jax.random.PRNGKey(2))
    assert out.shape == img.shape


def test_remat_grads_match_no_remat_unet():
    """UNetConfig.remat is pure scheduling (jax.checkpoint): grads must
    match the non-remat graph to float tolerance."""
    import dataclasses

    from unirestore_tpu.models import unet as UN

    # UNet: grads w.r.t. the control adapters through the decode path
    cfg = UN.tiny_unet_config()
    k = jax.random.PRNGKey(0)
    p = UN.unet_init(k, cfg)
    cp = UN.control_adapters_init(jax.random.fold_in(k, 1), cfg)
    x = jax.random.uniform(k, (2, 8, 8, 4))
    ehs = jax.random.uniform(k, (2, 77, cfg.cross_attention_dim))
    ts = jnp.array([100, 200])
    ctrl = [jax.random.uniform(jax.random.fold_in(k, i),
                               (2, 8 // (2 ** min(i, 3)),
                                8 // (2 ** min(i, 3)), 32))
            for i in range(len(cfg.block_out_channels))]

    def unet_loss(cp_, cfg_):
        return jnp.sum(UN.unet_apply(p, cfg_, x, ts, ehs, control=ctrl,
                                     control_params=cp_) ** 2)

    cfg_r = dataclasses.replace(cfg, remat=True)
    g0 = jax.grad(lambda c: unet_loss(c, cfg))(cp)
    g1 = jax.grad(lambda c: unet_loss(c, cfg_r))(cp)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), g0, g1)


# the jax.checkpoint-is-a-no-op property is already pinned fast by the
# UNet half above; the VAE+CFRM half re-checks the same property through a
# second wiring and pays two more grad compiles -> slow tier (1-vCPU box)
@pytest.mark.slow
def test_remat_grads_match_no_remat_vae_cfrm():
    """VAEConfig.remat / cfrm_stage(remat=) grads must match the non-remat
    graphs to float tolerance."""
    import dataclasses

    from unirestore_tpu.models import cfrm as CFRM
    from unirestore_tpu.models import vae as V

    k = jax.random.PRNGKey(0)
    # VAE encode + CFRM: grads w.r.t. the CFRM stages through the skips
    vcfg = V.tiny_vae_config()
    vp = V.vae_init(jax.random.fold_in(k, 2), vcfg)
    fr = CFRM.cfrm_init(jax.random.fold_in(k, 3),
                        channels=vcfg.skip_channels,
                        depths=vcfg.cfrm_depths)
    img = jax.random.uniform(jax.random.fold_in(k, 4), (2, 32, 32, 3))

    def enc_loss(fr_, cfg_):
        _, _, skips = V.encode_moments(vp, img, cfg_, fr_params=fr_,
                                       enable_fr=True)
        return sum(jnp.sum(s.astype(jnp.float32) ** 2) for s in skips)

    vcfg_r = dataclasses.replace(vcfg, remat=True)
    g0 = jax.grad(lambda f: enc_loss(f, vcfg))(fr)
    g1 = jax.grad(lambda f: enc_loss(f, vcfg_r))(fr)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4), g0, g1)
