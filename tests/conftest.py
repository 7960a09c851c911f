"""Test configuration: force an 8-device virtual CPU mesh.

This is the JAX-native "fake backend" for validating data-parallel semantics
(sharded batches, psum grads, metric reduction) without TPU hardware.

Note: this image's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon, so plain env-var overrides are too late — we must go
through jax.config before any backend is initialized.
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
