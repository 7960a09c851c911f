"""Pure-function DDPM/DDIM schedulers over an alphas-cumprod table.

The reference delegates to diffusers DDPMScheduler (train-time noising) and
DDIMScheduler (inference stepping), both loaded from the sd-turbo scheduler
config (unifie.py:69-75). We reproduce that math as stateless functions:

- sd-turbo scheduler config: 1000 train timesteps, scaled_linear betas
  [0.00085, 0.012], epsilon prediction, trailing timestep spacing,
  ``set_alpha_to_one=False``, no sample clipping.
- ``ddim_timesteps(n)`` with trailing spacing yields e.g. [999] for n=1 and
  [999, 749, 499, 249] for n=4 (matching the reference train-time noising
  buffer, unifie.py:65-68).
- ``ddim_step`` is the eta=0 DDIM update used in the inference loop
  (unifie.py:146-150).

Everything is static-shape and lax.scan-friendly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DiffusionSchedule:
    alphas_cumprod: jnp.ndarray  # (T,) fp32
    final_alpha_cumprod: jnp.ndarray  # scalar, alpha_bar for "step -1"
    num_train_timesteps: int


def make_schedule(num_train_timesteps: int = 1000, beta_start: float = 0.00085,
                  beta_end: float = 0.012, beta_schedule: str = "scaled_linear",
                  set_alpha_to_one: bool = False) -> DiffusionSchedule:
    if beta_schedule == "scaled_linear":
        betas = np.linspace(beta_start ** 0.5, beta_end ** 0.5,
                            num_train_timesteps, dtype=np.float64) ** 2
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps,
                            dtype=np.float64)
    else:
        raise ValueError(f"unknown beta_schedule: {beta_schedule}")
    acp = np.cumprod(1.0 - betas).astype(np.float32)
    final = np.float32(1.0) if set_alpha_to_one else acp[0]
    return DiffusionSchedule(
        alphas_cumprod=jnp.asarray(acp),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
    )


def add_noise(sched: DiffusionSchedule, x0, noise, timesteps):
    """DDPM forward noising: sqrt(a_t) x0 + sqrt(1-a_t) n (per-sample t)."""
    a = sched.alphas_cumprod[timesteps].astype(x0.dtype)
    a = a.reshape((-1,) + (1,) * (x0.ndim - 1))
    return jnp.sqrt(a) * x0 + jnp.sqrt(1.0 - a) * noise


def predict_x0_from_eps(sched: DiffusionSchedule, zt, eps, timesteps):
    """x0 = (z_t - sqrt(1-a_t) eps) / sqrt(a_t)   (unifie.py:98-105)."""
    a = sched.alphas_cumprod[timesteps].astype(jnp.float32)
    a = a.reshape((-1,) + (1,) * (zt.ndim - 1))
    zt32, eps32 = zt.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (zt32 - jnp.sqrt(1.0 - a) * eps32) / jnp.sqrt(a)
    return x0.astype(zt.dtype)


def ddim_timesteps(num_inference_steps: int, num_train_timesteps: int = 1000,
                   spacing: str = "trailing", steps_offset: int = 1) -> np.ndarray:
    """Static inference timestep table (descending), diffusers semantics."""
    n, big_t = num_inference_steps, num_train_timesteps
    if spacing == "trailing":
        ts = np.round(np.arange(big_t, 0, -big_t / n)).astype(np.int64) - 1
    elif spacing == "leading":
        step = big_t // n
        ts = (np.arange(0, n) * step).round().astype(np.int64)[::-1] + steps_offset
    elif spacing == "linspace":
        ts = np.linspace(0, big_t - 1, n).round().astype(np.int64)[::-1]
    else:
        raise ValueError(f"unknown spacing: {spacing}")
    return ts.astype(np.int32)


def ddim_step(sched: DiffusionSchedule, zt, eps, t, num_inference_steps: int):
    """One deterministic (eta=0) DDIM update from timestep ``t``.

    ``t`` may be a traced scalar (from lax.scan over the timestep table).
    ``final_alpha_cumprod`` handles the t - step < 0 boundary with
    set_alpha_to_one=False semantics (alpha_bar[0]).
    """
    step = sched.num_train_timesteps // num_inference_steps
    prev_t = t - step
    a_t = sched.alphas_cumprod[t].astype(jnp.float32)
    a_prev = jnp.where(prev_t >= 0,
                       sched.alphas_cumprod[jnp.maximum(prev_t, 0)],
                       sched.final_alpha_cumprod).astype(jnp.float32)
    zt32, eps32 = zt.astype(jnp.float32), eps.astype(jnp.float32)
    x0 = (zt32 - jnp.sqrt(1.0 - a_t) * eps32) / jnp.sqrt(a_t)
    z_prev = jnp.sqrt(a_prev) * x0 + jnp.sqrt(1.0 - a_prev) * eps32
    return z_prev.astype(zt.dtype)
