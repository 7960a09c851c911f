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

# Persistent compile cache: the suite's cost on a small host is dominated
# by repeated XLA CPU compiles of the same tiny-config modules; cached
# re-runs skip them. Opt out with UNIRESTORE_TEST_NO_CACHE=1 (e.g. when
# hunting a compile-time bug).
if os.environ.get("UNIRESTORE_TEST_NO_CACHE") != "1":
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("UNIRESTORE_TEST_CACHE_DIR",
                                     "/tmp/unirestore_test_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
