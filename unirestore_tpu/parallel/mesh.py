"""Device mesh + sharding utilities (TPU-native data parallelism).

The reference's only distribution strategy is Lightning DDP over NCCL
(configs/train_stage1.yaml:10-11, SURVEY §2.6). The TPU-native equivalent:
a 1-D ``data`` mesh; batches sharded over it, parameters replicated; jit
inserts the gradient all-reduce over ICI automatically. There is no
"unused parameter" problem — grads are per-pytree-leaf.

Multi-slice scaling works through the same API (the mesh spans slices; XLA
routes collectives over ICI within a slice and DCN across).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_mesh_2d(data: int, spatial: int, devices=None) -> Mesh:
    """(data, spatial) mesh for spatially sharded inference: NHWC batches
    sharded as P('data', 'spatial') split both the batch AND the image
    height across chips. GSPMD inserts the conv halo exchanges and
    partial-reduction collectives automatically (verified exact vs
    single-device at the encoder level), so per-chip HBM for the 512px VAE
    activations — the memory hot spot (SURVEY §2.6) — drops by the
    spatial factor with no model changes."""
    devices = devices if devices is not None else jax.devices()
    if data * spatial != len(devices):
        raise ValueError(f"{data}x{spatial} mesh needs {data * spatial} "
                         f"devices, have {len(devices)}")
    return Mesh(np.asarray(devices).reshape(data, spatial),
                ("data", "spatial"))


def spatial_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch on 'data', image height on 'spatial' (NHWC axis 1)."""
    return NamedSharding(mesh, P("data", "spatial"))


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis_name: str = "data"):
    """Place host arrays as global device arrays sharded on the leading axis.

    Multi-host: every process materializes the same deterministic global
    batch; each contributes its contiguous process-local row block via
    ``jax.make_array_from_process_local_data`` (see parallel/distributed.py).
    """
    sh = batch_sharding(mesh, axis_name)
    if jax.process_count() > 1:
        from .distributed import process_local_rows

        def put(x):
            local = x[process_local_rows(x.shape[0])]
            return jax.make_array_from_process_local_data(
                sh, np.asarray(local), x.shape)

        return jax.tree.map(put, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sh = replicated_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)


def unreplicate(tree):
    """Fetch one copy of a replicated pytree to host."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


def local_batch_size(global_batch: int, mesh: Mesh, axis_name: str = "data"):
    n = mesh.shape[axis_name]
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{axis_name} axis size {n}")
    return global_batch // n
