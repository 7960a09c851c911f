import jax
import jax.numpy as jnp
import numpy as np

from unirestore_tpu.diffusion import (
    DiffusionSchedule,
    ddim_step,
    ddim_timesteps,
    make_schedule,
    predict_x0_from_eps,
)
from unirestore_tpu.diffusion.schedules import add_noise


def test_trailing_timesteps_match_reference_buffer():
    # reference train-noise buffer [249, 499, 749, 999] = 4-step trailing DDIM
    np.testing.assert_array_equal(ddim_timesteps(4), [999, 749, 499, 249])
    np.testing.assert_array_equal(ddim_timesteps(1), [999])
    ts20 = ddim_timesteps(20)
    assert ts20[0] == 999 and ts20[-1] == 49 and len(ts20) == 20


def test_schedule_values():
    s = make_schedule()
    assert s.alphas_cumprod.shape == (1000,)
    # scaled_linear betas: acp[0] = 1 - 0.00085
    np.testing.assert_allclose(float(s.alphas_cumprod[0]), 1 - 0.00085, rtol=1e-6)
    assert float(s.alphas_cumprod[999]) < 5e-3  # heavily noised at t=999
    # set_alpha_to_one=False -> final is acp[0]
    np.testing.assert_allclose(float(s.final_alpha_cumprod),
                               float(s.alphas_cumprod[0]))


def test_add_noise_and_x0_roundtrip():
    s = make_schedule()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (2, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([249, 999])
    zt = add_noise(s, x0, noise, t)
    x0_rec = predict_x0_from_eps(s, zt, noise, t)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-4)


def test_ddim_single_step_with_perfect_eps_recovers_x0():
    # 1-step DDIM from t=999 with the true eps: prev_t < 0 -> a_prev = acp[0]
    s = make_schedule()
    x0 = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([999])
    zt = add_noise(s, x0, noise, t)
    z_prev = ddim_step(s, zt, noise, jnp.int32(999), num_inference_steps=1)
    # z_prev = sqrt(acp0) x0 + sqrt(1-acp0) eps; acp0 ~ 0.99915
    expect = (jnp.sqrt(s.alphas_cumprod[0]) * x0
              + jnp.sqrt(1 - s.alphas_cumprod[0]) * noise)
    np.testing.assert_allclose(np.asarray(z_prev), np.asarray(expect), atol=1e-4)


def test_ddim_chain_is_scan_compatible():
    s = make_schedule()
    ts = jnp.asarray(ddim_timesteps(4))
    z = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))

    def body(z, t):
        eps = z * 0.1  # stand-in "model"
        return ddim_step(s, z, eps, t, num_inference_steps=4), None

    out, _ = jax.lax.scan(body, z, ts)
    assert out.shape == z.shape and np.isfinite(np.asarray(out)).all()


def test_unet_encode_decode_composition():
    """unet_apply must equal unet_encode + unet_decode (refactor guard)."""
    import jax
    import jax.numpy as jnp
    from unirestore_tpu.models import unet as UN

    cfg = UN.tiny_unet_config("scedit")
    p = UN.unet_init(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ts = jnp.full((1,), 499, jnp.int32)
    ehs = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 77, cfg.cross_attention_dim))
    full = UN.unet_apply(p, cfg, x, ts, ehs)
    emb = UN.unet_time_embedding(p, cfg, ts, x.dtype)
    h, skips = UN.unet_encode(p, cfg, x, emb, ehs)
    split = UN.unet_decode(p, cfg, h, skips, emb, ehs)
    assert jnp.allclose(full, split), "encode+decode != apply"


def test_unet_shallow_path_matches_full_forward():
    """DeepCache refactor guard: with the deep feature taken from the SAME
    step, unet_down_shallow + unet_up_shallow must reproduce unet_apply
    exactly (the approximation only comes from reusing ``deep`` across
    steps)."""
    import jax
    import jax.numpy as jnp
    from unirestore_tpu.models import unet as UN

    cfg = UN.tiny_unet_config("scedit")
    p = UN.unet_init(jax.random.PRNGKey(0), cfg)
    ctrl_p = UN.control_adapters_init(jax.random.PRNGKey(3), cfg)
    # non-zero adapters so the SC-Tuner path is actually exercised
    ctrl_p = jax.tree.map(
        lambda x: x + 0.01 * jax.random.normal(jax.random.PRNGKey(4), x.shape),
        ctrl_p)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 4))
    ts = jnp.full((1,), 499, jnp.int32)
    ehs = jax.random.normal(jax.random.PRNGKey(2),
                            (1, 77, cfg.cross_attention_dim))
    control = [jax.random.normal(jax.random.PRNGKey(10 + i),
                                 (1, 16 // 2**i, 16 // 2**i,
                                  cfg.control_channels)) * 0.1
               for i in range(4)]
    emb = UN.unet_time_embedding(p, cfg, ts, x.dtype)
    h, skips = UN.unet_encode(p, cfg, x, emb, ehs, control, ctrl_p)
    full, deep = UN.unet_decode(p, cfg, h, skips, emb, ehs, control, ctrl_p,
                                return_deep=True)
    skips0 = UN.unet_down_shallow(p, cfg, x, emb, ehs, control, ctrl_p)
    shallow = UN.unet_up_shallow(p, cfg, deep, skips0, emb, ehs, control,
                                 ctrl_p)
    assert jnp.allclose(full, shallow, atol=1e-5), "shallow path != full"


def test_ddim_deep_cache_runs_and_bounded():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from unirestore_tpu.models import unirestore as UR

    cfg = UR.tiny_config()
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.3
    zt, _, _ = UR.diffuse(sched, z0, jax.random.PRNGKey(2),
                          jnp.full((1,), 999, jnp.int32))
    full = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                           num_inference_steps=6)
    for stride in (2, 3):
        fast = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                               num_inference_steps=6, cache_mode="deep",
                               cache_stride=stride)
        assert fast.shape == full.shape
        a = np.asarray(full, np.float64)
        b = np.asarray(fast, np.float64)
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert np.isfinite(rel)
    # stride that doesn't divide the step count exercises the full-step tail
    fast5 = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                            num_inference_steps=5, cache_mode="deep",
                            cache_stride=3)
    assert fast5.shape == full.shape
    # stride > 1 with mode "none" stays exact
    exact = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                            num_inference_steps=6, cache_mode="none",
                            cache_stride=3)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(full), atol=1e-6)
    # warmup covering all steps degenerates to the exact loop
    warm_all = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                               num_inference_steps=6, cache_mode="deep",
                               cache_stride=3, cache_warmup=6)
    np.testing.assert_allclose(np.asarray(warm_all), np.asarray(full),
                               atol=1e-6)
    # partial warmup (2 exact + groups over the remaining 4) runs and is
    # closer to exact than no warmup at the same stride
    warm2 = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                            num_inference_steps=6, cache_mode="deep",
                            cache_stride=2, cache_warmup=2)
    assert warm2.shape == full.shape
    assert np.isfinite(np.asarray(warm2, np.float64)).all()
    # warmup not divisible into groups exercises the cached-tail path
    warm1 = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                            num_inference_steps=6, cache_mode="deep",
                            cache_stride=3, cache_warmup=1)
    assert warm1.shape == full.shape
    # negative warmup must be a clear validation error, not a trace-time
    # shape failure
    import pytest
    with pytest.raises(ValueError, match="cache_warmup"):
        UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                        num_inference_steps=6, cache_mode="deep",
                        cache_stride=3, cache_warmup=-1)
    # remainder-runs-full semantics (what the (stride 17, warmup 3)
    # headline schedule relies on — PERF.md "Knee"): a stride larger
    # than n - warmup leaves zero groups, so EVERY step runs full and
    # the output is bit-comparable to the exact loop
    all_tail = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                               num_inference_steps=6, cache_mode="deep",
                               cache_stride=5, cache_warmup=2)
    np.testing.assert_allclose(np.asarray(all_tail), np.asarray(full),
                               atol=1e-6)
    # the headline shape: one cached group exactly covering n - warmup
    # (no remainder) runs and stays bounded
    one_group = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                                num_inference_steps=6, cache_mode="deep",
                                cache_stride=4, cache_warmup=2)
    assert one_group.shape == full.shape
    a = np.asarray(full, np.float64)
    g = np.asarray(one_group, np.float64)
    assert np.isfinite(g).all()
    assert np.linalg.norm(a - g) / max(np.linalg.norm(a), 1e-9) < 0.5


def test_ddim_encoder_propagation_runs_and_bounded():
    import jax
    import jax.numpy as jnp
    from unirestore_tpu.models import unirestore as UR

    cfg = UR.tiny_config()
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    sched = UR.schedule(cfg)
    z0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.3
    zt, _, _ = UR.diffuse(sched, z0, jax.random.PRNGKey(2),
                          jnp.full((1,), 999, jnp.int32))
    full = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                           num_inference_steps=4)
    fast = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                           num_inference_steps=4, encoder_propagation=True)
    assert fast.shape == full.shape
    import numpy as np
    a, b = np.asarray(full, np.float64), np.asarray(fast, np.float64)
    rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
    assert np.isfinite(rel)
    # odd step count exercises the trailing full step
    fast3 = UR.ddim_denoise(frozen, trainable, cfg, sched, zt, z0,
                            num_inference_steps=3, encoder_propagation=True)
    assert fast3.shape == full.shape
