"""Golden numerical parity against the reference's OWN torch modules.

The reference's value rests on exact adapter math around frozen sd-turbo
weights. These tests instantiate the reference's torch modules (read-only
from /root/reference), map their randomly-initialized state_dicts through the
SAME converter functions a real checkpoint would use
(tools/convert_adapters.py), run both implementations on identical inputs,
and assert the outputs agree to <=1e-5 (fp64 inputs; our norm layers keep
fp32 statistics, which bounds the attainable agreement).

Covered: CSCEAdapter (scedit.py:24-38), SPADE (spade.py:29-71),
TaskFeatureAdapter (taskeditor.py:10-108), NAFBlock (nafnet_arch.py:28-131),
AdaNAFV2 (cfrm.py:12-54), and the DDPM/DDIM schedule math vs an independent
transcription of the published DDIM update (diffusers DDIMScheduler
semantics, unifie.py:69-75).

timm and diffusers are not installed in this image; the reference modules
that need them are imported under two minimal stubs:
- timm.layers.LayerNorm2d == nn.LayerNorm applied channels-last on NCHW with
  eps=1e-6 (timm/layers/norm.py; the ConvNeXt convention).
- diffusers.AutoencoderKL: imported but unused by the modules under test.
"""

import importlib
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference/src/modules/diffuie"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import convert_adapters as CA  # noqa: E402

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference not available")


def _install_stubs():
    if "timm" not in sys.modules:
        class LayerNorm2d(torch.nn.LayerNorm):
            def __init__(self, num_channels, eps=1e-6, affine=True):
                super().__init__(num_channels, eps=eps,
                                 elementwise_affine=affine)

            def forward(self, x):
                x = x.permute(0, 2, 3, 1)
                x = torch.nn.functional.layer_norm(
                    x, self.normalized_shape, self.weight, self.bias,
                    self.eps)
                return x.permute(0, 3, 1, 2)

        timm = types.ModuleType("timm")
        timm.layers = types.ModuleType("timm.layers")
        timm.layers.LayerNorm2d = LayerNorm2d
        sys.modules["timm"] = timm
        sys.modules["timm.layers"] = timm.layers
    if "diffusers" not in sys.modules:
        diffusers = types.ModuleType("diffusers")
        diffusers.AutoencoderKL = type("AutoencoderKL", (), {})
        sys.modules["diffusers"] = diffusers


def _ref_module(name):
    """Import a module from the reference's diffuie package (relative
    imports intact) without executing its package __init__."""
    _install_stubs()
    if "refdiffuie" not in sys.modules:
        pkg = types.ModuleType("refdiffuie")
        pkg.__path__ = [REF]
        sys.modules["refdiffuie"] = pkg
    return importlib.import_module(f"refdiffuie.{name}")


def _t(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _n(y_torch):
    return np.transpose(y_torch.detach().numpy(), (0, 2, 3, 1))


def _sd(mod):
    return {k: v.detach().numpy() for k, v in mod.state_dict().items()}


def _randomize(mod, seed):
    """Non-trivial weights everywhere (defaults zero-init some params)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in mod.parameters():
            p.copy_(torch.empty_like(p).normal_(0.0, 0.5, generator=g))
    return mod.double().eval()


def _x64(fn, *args):
    with jax.enable_x64(True):
        return np.asarray(fn(*(jnp.asarray(a) for a in args)))


def _agree(ours, theirs, atol=1e-5, rtol=1e-5):
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=rtol)


def test_csce_adapter_matches_reference():
    from unirestore_tpu.models import scedit as SC

    ref = _randomize(_ref_module("scedit").CSCEAdapter(32, 32, 16), 0)
    p = CA.convert_csce_adapter(
        {f"a.{k}": v for k, v in _sd(ref).items()}, "a")

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 7, 5, 32))
    cond = rng.normal(size=(2, 7, 5, 16))
    theirs = _n(ref(_t(x), _t(cond)))
    ours = _x64(lambda a, b: SC.csce_adapter(
        jax.tree.map(jnp.asarray, p), a, b), x, cond)
    _agree(ours, theirs)


def test_spade_matches_reference():
    from unirestore_tpu.models import spade as SP

    ref = _randomize(_ref_module("spade").SPADE(64, label_nc=16), 2)
    p = CA.convert_spade({f"a.{k}": v for k, v in _sd(ref).items()}, "a")

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 8, 6, 64))
    # control map at a DIFFERENT resolution exercises the nearest resize
    for seg_hw in ((8, 6), (4, 3), (16, 12)):
        seg = rng.normal(size=(2, *seg_hw, 16))
        theirs = _n(ref(_t(x), _t(seg)))
        ours = _x64(lambda a, b: SP.spade(
            jax.tree.map(jnp.asarray, p), a, b), x, seg)
        _agree(ours, theirs)


@pytest.mark.parametrize("last_layer", [False, True])
def test_task_feature_adapter_matches_reference(last_layer):
    from unirestore_tpu.models import tfa as TFA

    ref = _randomize(_ref_module("taskeditor").TaskFeatureAdapter(
        c_out=24, c_skip=16, prompt_len=2, last_layer=last_layer), 4)
    p = CA.convert_tfa_level({f"a.{k}": v for k, v in _sd(ref).items()}, "a",
                             last_layer=last_layer)

    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 6, 6, 24))
    skip = rng.normal(size=(2, 6, 6, 16))
    cond = rng.normal(size=(2, 2, 16))
    y_t, c_t = ref(_t(x), _t(skip), torch.from_numpy(cond))
    with jax.enable_x64(True):
        y, c = TFA.task_feature_adapter(
            jax.tree.map(jnp.asarray, p), jnp.asarray(x), jnp.asarray(skip),
            jnp.asarray(cond), prompt_len=2)
    _agree(np.asarray(y), _n(y_t))
    if last_layer:
        assert c is None and c_t is None
    else:
        _agree(np.asarray(c), c_t.detach().numpy())


def test_naf_block_matches_reference():
    from unirestore_tpu.models import nafnet as NAF

    ref = _randomize(_ref_module("nafnet_arch").NAFBlock(16), 6)
    p = CA.convert_naf_block({f"a.{k}": v for k, v in _sd(ref).items()}, "a")

    rng = np.random.default_rng(7)
    x = rng.normal(size=(2, 9, 5, 16))
    theirs = _n(ref(_t(x)))
    ours = _x64(lambda a: NAF.naf_block(jax.tree.map(jnp.asarray, p), a), x)
    _agree(ours, theirs)


def test_ada_naf_v2_matches_reference():
    from unirestore_tpu.models import cfrm as CFRM

    ref = _randomize(_ref_module("cfrm").AdaNAFV2(32), 8)
    p = CA.convert_ada_naf_v2({f"a.{k}": v for k, v in _sd(ref).items()}, "a")

    rng = np.random.default_rng(9)
    x = rng.normal(size=(2, 8, 8, 32))
    theirs = _n(ref(_t(x)))
    ours = _x64(lambda a: CFRM.ada_naf_v2(jax.tree.map(jnp.asarray, p), a), x)
    _agree(ours, theirs)


def test_cfrm_stage_matches_reference():
    """Full fr_blocks stage: Sequential(NAFBlock, AdaNAFV2)
    (autoencoder.py:92-98), mapped through convert_cfrm exactly as a stage-1
    checkpoint would be."""
    from unirestore_tpu.models import cfrm as CFRM

    naf_mod = _ref_module("nafnet_arch")
    cfrm_mod = _ref_module("cfrm")
    stage = torch.nn.Sequential(naf_mod.NAFBlock(16), cfrm_mod.AdaNAFV2(16))
    _randomize(stage, 10)
    sd = {f"model.ae.vae.encoder.fr_blocks.0.{k}": v
          for k, v in _sd(stage).items()}
    tree = CA.convert_cfrm(sd, depths=(1,))

    rng = np.random.default_rng(11)
    x = rng.normal(size=(1, 8, 8, 16))
    theirs = _n(stage(_t(x)))
    ours = _x64(lambda a: CFRM.cfrm_stage(
        jax.tree.map(jnp.asarray, tree[0]), a), x)
    _agree(ours, theirs)


# -- diffusion schedule vs hand-checked DDIM formulas ------------------------


def _np_schedule(T=1000, b0=0.00085, b1=0.012):
    """Independent transcription of the sd-turbo scheduler table
    (scaled_linear betas; diffusers scheduling_ddim.py semantics)."""
    betas = np.linspace(b0 ** 0.5, b1 ** 0.5, T, dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def test_schedule_table_matches_independent_formula():
    from unirestore_tpu.diffusion import schedules as D

    sched = D.make_schedule()
    acp = _np_schedule()
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp,
                               rtol=1e-6)
    # set_alpha_to_one=False: the "step -1" alpha-bar is alphas_cumprod[0]
    np.testing.assert_allclose(float(sched.final_alpha_cumprod), acp[0],
                               rtol=1e-6)


def test_add_noise_and_x0_formula_roundtrip():
    from unirestore_tpu.diffusion import schedules as D

    sched = D.make_schedule()
    acp = _np_schedule()
    rng = np.random.default_rng(12)
    x0 = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
    noise = rng.normal(size=x0.shape).astype(np.float32)
    for t in (0, 249, 499, 749, 999):
        ts = np.full((2,), t, np.int32)
        zt = np.asarray(D.add_noise(sched, jnp.asarray(x0),
                                    jnp.asarray(noise), jnp.asarray(ts)))
        want = np.sqrt(acp[t]) * x0 + np.sqrt(1 - acp[t]) * noise
        np.testing.assert_allclose(zt, want, atol=1e-5)
        # x0 formula (unifie.py:98-105) inverts add_noise exactly
        back = np.asarray(D.predict_x0_from_eps(
            sched, jnp.asarray(zt), jnp.asarray(noise), jnp.asarray(ts)))
        np.testing.assert_allclose(back, x0, atol=2e-4)


def test_ddim_step_matches_published_update():
    """eta=0 DDIM: z_{t-1} = sqrt(a_prev) x0_hat + sqrt(1-a_prev) eps
    (Song et al. eq. 12; diffusers DDIMScheduler.step with
    set_alpha_to_one=False and trailing spacing)."""
    from unirestore_tpu.diffusion import schedules as D

    sched = D.make_schedule()
    acp = _np_schedule()
    rng = np.random.default_rng(13)
    zt = rng.normal(size=(1, 4, 4, 3)).astype(np.float32)
    eps = rng.normal(size=zt.shape).astype(np.float32)
    for n in (1, 4, 20):
        ts = D.ddim_timesteps(n)
        # trailing spacing: round(arange(T, 0, -T/n)) - 1
        want_ts = np.round(np.arange(1000, 0, -1000.0 / n)).astype(int) - 1
        np.testing.assert_array_equal(ts, want_ts)
        step = 1000 // n
        for t in ts:
            a_t = acp[t]
            a_prev = acp[t - step] if t - step >= 0 else acp[0]
            x0 = (zt - np.sqrt(1 - a_t) * eps) / np.sqrt(a_t)
            want = np.sqrt(a_prev) * x0 + np.sqrt(1 - a_prev) * eps
            got = np.asarray(D.ddim_step(sched, jnp.asarray(zt),
                                         jnp.asarray(eps), int(t), n))
            np.testing.assert_allclose(got, want, atol=1e-4)


def test_train_timestep_buffer_matches_reference():
    """The fixed train-noising buffer [249,499,749,999,999,999]
    (unifie.py:65-68) biases noising toward t=999."""
    from unirestore_tpu.models import unirestore as UR

    assert list(UR.TRAIN_TIMESTEPS) == [249, 499, 749, 999, 999, 999]
