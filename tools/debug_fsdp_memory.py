"""Per-chip state-memory accounting: replicated vs FSDP placement.

Computes, WITHOUT materializing any weights (jax.eval_shape over the
full-scale init + optimizer init), how many bytes of persistent state each
chip holds under the default replicated placement vs `trainer.fsdp`
(parallel/fsdp.py: each large leaf sharded over the data axis). This is
the ZeRO-3 claim made concrete for this model: frozen sd-turbo backbone
(bf16), trainable adapters (fp32 master), and AdamW moments.

The reference replicates everything per GPU (Lightning DDP,
train_stage1.yaml:10-11); activations/temp buffers are a separate budget
(tools/debug_train_memory.py).

Usage: python tools/debug_fsdp_memory.py [--devices 8]
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _bytes(tree, per_device_divisors=None):
    total = 0
    for leaf in jax.tree.leaves(tree):
        total += math.prod(leaf.shape) * leaf.dtype.itemsize
    return total


def _fsdp_bytes(tree, n):
    from unirestore_tpu.parallel import fsdp_spec

    total = 0
    for leaf in jax.tree.leaves(tree):
        size = math.prod(leaf.shape) * leaf.dtype.itemsize
        spec = fsdp_spec(leaf, n)
        total += size // n if any(s is not None for s in spec) else size
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    args = ap.parse_args()
    jax.config.update("jax_platforms", "cpu")

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.train import optim as OPT

    cfg = UR.UniRestoreConfig(use_tfa=True, tasks=("ir", "cls", "seg"))

    def build():
        frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
        frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
        return frozen, trainable

    frozen, trainable = jax.eval_shape(build)
    tx = OPT.make_optimizer(lr=1e-4)
    opt_state = jax.eval_shape(tx.init, trainable)

    n = args.devices
    rows = [("frozen backbone (bf16)", frozen),
            ("trainable adapters (fp32 master)", trainable),
            ("optimizer state (AdamW moments)", opt_state)]
    print(f"{'state':<34} {'replicated/chip':>16} {'fsdp/chip':>12} "
          f"{'factor':>7}   (mesh = {n} devices)")
    tot_r = tot_f = 0
    for name, tree in rows:
        r, f = _bytes(tree), _fsdp_bytes(tree, n)
        tot_r += r
        tot_f += f
        print(f"{name:<34} {r / 2**20:>13.1f} MB {f / 2**20:>9.1f} MB "
              f"{r / max(f, 1):>6.1f}x")
    print(f"{'TOTAL persistent state':<34} {tot_r / 2**20:>13.1f} MB "
          f"{tot_f / 2**20:>9.1f} MB {tot_r / max(tot_f, 1):>6.1f}x")


if __name__ == "__main__":
    main()
