"""Checkpointing: adapter-only param trees with stage-surgery loading.

The reference prunes all frozen weights from checkpoints and re-whitelists
adapter prefixes (base.py:129-136, engine_unifie.py:47-133); cross-stage
loading is manual key-prefix surgery (engine_unifie.py:50-126). Here the
partition is structural: checkpoints contain the ``trainable`` pytree (plus
optimizer state and step), and stage surgery is top-level-key selection:

- frenc ckpt  -> "cfrm" subtree
- cnet ckpt   -> "controller" + "control" subtrees
- tedit ckpt  -> "tfa" subtree ("task_prompts" merged non-strictly so new
  tasks keep their fresh zero-init prompts, engine_unifie.py:112-114)

Format: flat numpy .npz ("path//to//leaf" keys + a JSON __meta__ entry) —
self-contained, portable, and fast enough for adapter-sized trees (the
checkpoints deliberately exclude the frozen SD backbone, so they are
~100 MB, not ~5 GB; orbax would only pay off at full-model scale).
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np

SEP = "//"


def tree_flatten_dict(tree, prefix=""):
    """Flatten a nested dict/list pytree into {path: leaf}."""
    out = {}
    if isinstance(tree, dict):
        it = tree.items()
    elif isinstance(tree, (list, tuple)):
        it = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix.rstrip(SEP): tree}
    for k, v in it:
        out.update(tree_flatten_dict(v, f"{prefix}{k}{SEP}"))
    return out


def tree_unflatten_dict(flat, template):
    """Rebuild ``template``-shaped pytree from {path: leaf}; missing paths
    keep template values (non-strict load)."""
    def rebuild(node, prefix=""):
        if isinstance(node, dict):
            return {k: rebuild(v, f"{prefix}{k}{SEP}") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            seq = [rebuild(v, f"{prefix}{i}{SEP}") for i, v in enumerate(node)]
            return type(node)(seq) if isinstance(node, tuple) else seq
        key = prefix.rstrip(SEP)
        return flat.get(key, node)

    return rebuild(template)


def save_checkpoint(path: str, trainable, step: int, opt_state=None,
                    metadata: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = tree_flatten_dict(jax.tree.map(np.asarray, trainable), "trainable" + SEP)
    meta_opt = {}
    if opt_state is not None:
        opt_leaves = jax.tree.leaves(opt_state)
        meta_opt["opt_num_leaves"] = len(opt_leaves)
        for i, leaf in enumerate(opt_leaves):
            arr = np.asarray(leaf)
            if arr.dtype != object:
                flat[f"opt{SEP}{i}"] = arr
    meta = {"step": int(step), **meta_opt, **(metadata or {})}
    np.savez(path, __meta__=json.dumps(meta), **flat)


def load_checkpoint(path: str):
    """Returns (flat_dict, meta)."""
    data = np.load(path, allow_pickle=False)
    meta = json.loads(str(data["__meta__"]))
    flat = {k: data[k] for k in data.files if k != "__meta__"}
    return flat, meta


def load_trainable(path: str, template):
    """Non-strict restore of the trainable tree from a checkpoint file."""
    flat, meta = load_checkpoint(path)
    tflat = {k[len("trainable" + SEP):]: v for k, v in flat.items()
             if k.startswith("trainable" + SEP)}
    return tree_unflatten_dict(tflat, template), meta


def load_subtree(path: str, template, keys):
    """Stage surgery: restore only the given top-level keys from ``path``
    into a fresh ``template`` (reference prefix surgery,
    engine_unifie.py:50-126)."""
    flat, _ = load_checkpoint(path)
    selected = {}
    for k, v in flat.items():
        parts = k.split(SEP)
        if parts[0] == "trainable" and len(parts) > 1 and parts[1] in keys:
            selected[SEP.join(parts[1:])] = v
    return tree_unflatten_dict(selected, template)


def restore_opt_state(path: str, opt_state_template):
    """Restore optimizer state by flat leaf index, refusing to restore into
    a structurally different optimizer (chain/schedule changed between save
    and resume would silently fill wrong slots otherwise)."""
    flat, meta = load_checkpoint(path)
    leaves, treedef = jax.tree.flatten(opt_state_template)
    n_saved = meta.get("opt_num_leaves")
    if n_saved is not None and n_saved != len(leaves):
        print(f"[checkpoint] optimizer structure changed ({n_saved} saved "
              f"leaves vs {len(leaves)} in template); starting optimizer "
              "state fresh")
        return opt_state_template
    out = []
    for i, leaf in enumerate(leaves):
        arr = flat.get(f"opt{SEP}{i}")
        if arr is not None and np.shape(arr) != np.shape(leaf):
            print(f"[checkpoint] optimizer leaf {i} shape {np.shape(arr)} "
                  f"!= template {np.shape(leaf)}; keeping fresh value")
            arr = None
        out.append(arr if arr is not None else leaf)
    return jax.tree.unflatten(treedef, out)


class CheckpointManager:
    """save_top_k by a monitored metric (ModelCheckpoint equivalent,
    train_stage1.yaml:36-43)."""

    def __init__(self, directory: str, save_top_k: int = 5, mode: str = "max",
                 monitor: str = "val_monitor"):
        self.dir = directory
        self.save_top_k = save_top_k
        self.mode = mode
        self.monitor = monitor
        self._saved: list[tuple[float, str]] = []
        os.makedirs(directory, exist_ok=True)
        # Adopt checkpoints left by a previous run (trainer.resume) so
        # top-k pruning spans restarts instead of only this process's saves.
        for fname in sorted(os.listdir(directory)):
            m = re.fullmatch(r"step=\d+-val=(-?[\d.]+(?:[eE][+-]?\d+)?)\.npz",
                             fname)
            if m:
                v = float(m.group(1))
                self._saved.append((v if mode == "max" else -v,
                                    os.path.join(directory, fname)))
        self._saved.sort(key=lambda t: -t[0])

    def save(self, trainable, step: int, metric_value: float, opt_state=None,
             metadata=None):
        fname = os.path.join(
            self.dir, f"step={step}-val={metric_value:.4f}.npz")
        save_checkpoint(fname, trainable, step, opt_state,
                        {**(metadata or {}), self.monitor: metric_value})
        key = metric_value if self.mode == "max" else -metric_value
        # a resumed run can re-save an identical step/val filename (the
        # file was just overwritten) — replace the entry, never duplicate
        # it, or one duplicate eats a top-k slot and popping it deletes
        # the file out from under the surviving entry
        self._saved = [t for t in self._saved if t[1] != fname]
        self._saved.append((key, fname))
        self._saved.sort(key=lambda t: -t[0])
        while len(self._saved) > self.save_top_k:
            _, worst = self._saved.pop()
            if os.path.exists(worst):
                os.remove(worst)
        return fname

    @property
    def best_path(self):
        return self._saved[0][1] if self._saved else None
