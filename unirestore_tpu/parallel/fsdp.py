"""FSDP-style (ZeRO-3) parameter + optimizer-state sharding.

The reference replicates all state per GPU (Lightning DDP,
configs/train_stage1.yaml:10-11): every rank holds full params, grads and
Adam moments. The TPU-native upgrade: place each large pytree leaf sharded
over the ``data`` mesh axis and let GSPMD do the rest — weights are
all-gathered just-in-time for each layer's compute, gradients arrive as
reduce-scatters into the sharded optimizer update, and per-chip memory for
params + fp32 master state + moments drops by the mesh size. No model or
step-function changes: the jitted train step receives sharded arguments and
XLA propagates the shardings through the (elementwise) optimizer update, so
the state stays sharded across steps.

Sharding rule: each leaf is split along its largest mesh-divisible axis;
leaves smaller than ``min_size`` elements (biases, norm scales, scalar
schedule counters) stay replicated — gathering those costs more in latency
than the bytes saved.
"""

from __future__ import annotations

import math

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Leaves below this many elements are replicated (a 128x128 matrix is the
# smallest worth a per-step all-gather).
DEFAULT_MIN_SIZE = 16384


def fsdp_spec(x, n_shards: int, axis_name: str = "data",
              min_size: int = DEFAULT_MIN_SIZE) -> P:
    """PartitionSpec splitting ``x``'s largest ``n_shards``-divisible axis."""
    shape = tuple(getattr(x, "shape", ()) or ())
    if not shape or math.prod(shape) < max(min_size, 1):
        return P()
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % n_shards == 0 and shape[i] >= n_shards:
            spec = [None] * len(shape)
            spec[i] = axis_name
            return P(*spec)
    return P()


def fsdp_shard(mesh: Mesh, tree, axis_name: str = "data",
               min_size: int = DEFAULT_MIN_SIZE):
    """Place a pytree with each leaf sharded per :func:`fsdp_spec`."""
    n = mesh.shape[axis_name]

    def place(x):
        sh = NamedSharding(mesh, fsdp_spec(x, n, axis_name, min_size))
        return jax.device_put(x, sh)

    return jax.tree.map(place, tree)


def sharded_fraction(tree) -> float:
    """Fraction of the tree's elements on non-replicated placements —
    observability for tests and logs."""
    total = sharded = 0
    for leaf in jax.tree.leaves(tree):
        size = math.prod(tuple(getattr(leaf, "shape", ()) or ())) or 1
        total += size
        sharding = getattr(leaf, "sharding", None)
        if sharding is not None and not sharding.is_fully_replicated:
            sharded += size
    return sharded / total if total else 0.0


__all__ = ["fsdp_spec", "fsdp_shard", "sharded_fraction",
           "DEFAULT_MIN_SIZE"]
