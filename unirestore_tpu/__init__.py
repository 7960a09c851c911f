"""UniRestore-TPU: a TPU-native JAX framework for unified perceptual and
task-oriented image restoration with a diffusion prior.

Re-designed from scratch for TPU (JAX/XLA/Pallas/pjit) with the capabilities of
the UniRestore reference (CVPR 2025, arXiv:2501.13134):

- Frozen Stable-Diffusion (sd-turbo) VAE + UNet backbone, implemented natively
  in JAX with NHWC layouts and explicit parameter pytrees.
- Trainable adapter families: CFRM (NAFNet feature restoration in the VAE
  encoder), Controller (StableSR-style control encoder), SC-Tuner (skip
  connection adapters in the UNet), and TFA (task feature adapters with
  learned task prompts in the VAE decoder).
- Pure-function DDPM/DDIM schedulers driving a `lax.scan` denoising loop.
- Data-parallel training over a `jax.sharding.Mesh` with psum-averaged grads.

Parameters are organized as two pytrees: `frozen` (SD backbone ports) and
`trainable` (adapters); the entire train step is a single jitted function.
"""

__version__ = "0.1.0"
