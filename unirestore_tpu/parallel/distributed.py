"""Multi-host (TPU pod / multi-slice) runtime initialization.

The reference's distribution story ends at single-node DDP (Lightning,
``devices: 8`` on one machine — configs/train_stage1.yaml:10-11). The
TPU-native scaling path beyond one host is ``jax.distributed.initialize``:
after it, ``jax.devices()`` returns the GLOBAL device list, so the
existing mesh helpers (``make_mesh``/``make_mesh_2d``) and the jitted
steps work unchanged — XLA routes collectives over ICI within a slice and
DCN across slices through the same ``psum``/all-gather lowering
(SURVEY §2.6, §5 "Distributed communication backend").

What changes on multi-host is only the HOST side of batch feeding: each
process holds its own slice of the global batch, assembled into a global
array via ``jax.make_array_from_process_local_data``
(:func:`unirestore_tpu.parallel.mesh.shard_batch` handles this
transparently — the dataloaders are deterministic per global step, so
every process materializes the same global batch and contributes its
process-local rows).
"""

from __future__ import annotations

import os

import jax


def init_distributed(force: bool = False) -> bool:
    """Initialize the JAX distributed runtime for multi-host execution.

    Called from ``main.py`` before any backend use. Auto-detection: on
    Cloud TPU pods ``jax.distributed.initialize()`` discovers coordinator
    and process ranks from the TPU metadata. Because this repo must also
    run on single-chip and CPU test environments where initialize() would
    fail or hang, the call is gated: it runs when ``force`` is true, when
    ``UNIRESTORE_DISTRIBUTED=1``, or when an explicit coordinator is
    configured. Generic (non-TPU-metadata) clusters set
    ``COORDINATOR_ADDRESS``/``PROCESS_ID``/``NUM_PROCESSES``; those are
    passed to ``initialize()`` explicitly — JAX itself only auto-reads the
    ``JAX_``-prefixed forms.

    Returns True when the distributed runtime was initialized.
    """
    addr = os.environ.get("COORDINATOR_ADDRESS")
    want = (force
            or os.environ.get("UNIRESTORE_DISTRIBUTED") == "1"
            or os.environ.get("JAX_COORDINATOR_ADDRESS")
            or addr)
    if not want:
        return False
    kw = {}
    if addr and not os.environ.get("JAX_COORDINATOR_ADDRESS"):
        kw["coordinator_address"] = addr
        if os.environ.get("PROCESS_ID"):
            kw["process_id"] = int(os.environ["PROCESS_ID"])
        if os.environ.get("NUM_PROCESSES"):
            kw["num_processes"] = int(os.environ["NUM_PROCESSES"])
    jax.distributed.initialize(**kw)
    print(f"[distributed] process {jax.process_index()}/"
          f"{jax.process_count()}, {jax.local_device_count()} local / "
          f"{jax.device_count()} global devices")
    return True


def process_local_rows(n_rows: int) -> slice:
    """This process's slice of a leading-axis-sharded global batch.

    Processes own contiguous equal row blocks in ``process_index`` order —
    the layout ``jax.make_array_from_process_local_data`` expects for a
    batch sharded over a mesh built from ``jax.devices()`` (global devices
    are ordered by process).
    """
    n_proc = jax.process_count()
    if n_rows % n_proc:
        raise ValueError(f"global batch {n_rows} not divisible by "
                         f"{n_proc} processes")
    per = n_rows // n_proc
    lo = jax.process_index() * per
    return slice(lo, lo + per)


__all__ = ["init_distributed", "process_local_rows"]
