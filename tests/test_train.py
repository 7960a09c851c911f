import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from unirestore_tpu.models import unirestore as UR
from unirestore_tpu.parallel import make_mesh, replicate, shard_batch
from unirestore_tpu.train import checkpoints as CKPT
from unirestore_tpu.train import optim as OPT
from unirestore_tpu.train import steps as ST


import functools


@functools.lru_cache(maxsize=None)
def _tiny_init(tasks, use_tfa):
    """Session-shared tiny-model init: jax arrays are immutable and every
    test uses donate=False, so sharing one init per (tasks, use_tfa)
    signature is safe and saves a re-init per test on this 1-vCPU box."""
    cfg = UR.tiny_config(use_tfa=use_tfa, tasks=tasks)
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    return cfg, frozen, trainable, UR.schedule(cfg)


def _tiny_setup(stage=None, tasks=("ir",), use_tfa=False, multi_task=False):
    cfg, frozen, trainable, sched = _tiny_init(tuple(tasks), use_tfa)
    stage = stage or ST.StageConfig(train_cfrm=True, train_cnet=True,
                                    train_tfa=use_tfa,
                                    multi_task=multi_task)
    return cfg, frozen, trainable, sched, stage


def _batch(key, b=2, hw=64):
    k1, k2 = jax.random.split(key)
    return {"lq": jax.random.uniform(k1, (b, hw, hw, 3)),
            "hq": jax.random.uniform(k2, (b, hw, hw, 3))}


def test_sqrt_lr_scaling():
    # stage-1 numbers: base_lr 1e-4 @ base 64; 8 devs x bs 3 x accum 2 = 48
    lr = OPT.effective_lr(1e-4, 64, 3, 2, 8)
    np.testing.assert_allclose(lr, 1e-4 * (48 / 64) ** 0.5, rtol=1e-9)


def test_optimizer_name_surface():
    """timm create_optimizer_v2 name surface (reference base.py:62-73):
    every supported name builds and takes one step; 1D params are exempt
    from decoupled weight decay."""
    params = {"w": jnp.ones((4, 4)), "b": jnp.ones((4,))}
    grads = jax.tree.map(jnp.zeros_like, params)
    names = ["adamw", "nadamw", "radam", "lamb", "lion", "adafactor",
             "lars", "sgdw", "adam", "nadam", "adamax", "sgd", "momentum",
             "rmsprop", "adagrad", "adadelta"]
    for name in names:
        tx = OPT.make_optimizer(opt=name, lr=1e-2, weight_decay=0.1)
        state = tx.init(params)
        upd, _ = tx.update(grads, state, params)
        new = optax.apply_updates(params, upd)
        assert all(np.isfinite(x).all() for x in jax.tree.leaves(new)), name
        if name in ("adamw", "sgdw", "lamb", "lion", "nadamw"):
            # zero grad + decoupled decay: 2D decays, 1D untouched
            assert float(np.abs(new["b"] - 1).max()) < 1e-7, name
            assert float(np.abs(new["w"] - 1).max()) > 1e-6, name
    with pytest.raises(ValueError):
        OPT.make_optimizer(opt="fused_madgrad", lr=1e-2)


def test_stage1_step_updates_only_stage1_params():
    cfg, frozen, trainable, sched, stage = _tiny_setup(use_tfa=True)
    stage = ST.StageConfig(train_cfrm=True, train_cnet=True, train_tfa=False)
    tx = OPT.make_optimizer(lr=1e-3)
    opt_state = tx.init(trainable)
    step = ST.make_train_step(frozen, cfg, sched, stage, tx, "ir",
                              donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    new_tr, _, logs = step(trainable, opt_state, batch, jax.random.PRNGKey(2))

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert changed(trainable["cfrm"], new_tr["cfrm"])
    assert changed(trainable["controller"], new_tr["controller"])
    assert changed(trainable["control"], new_tr["control"])
    assert not changed(trainable["tfa"], new_tr["tfa"])  # frozen in stage 1
    assert float(logs["train/loss"]) > 0


@pytest.mark.parametrize("stage_kw", [
    dict(train_cfrm=True, train_cnet=True, train_tfa=False),   # stage 1
    # the split-vs-monolithic equality logic is stage-independent (the cut
    # points are the same detach boundaries in every stage); stage-2/MTL
    # partition semantics are covered fast by test_stage2_trains_tfa_only /
    # test_stage3_prompts_only, so only stage 1 pays the ~90 s double
    # train-step compile in the fast tier on this 1-vCPU box
    pytest.param(dict(train_cfrm=False, train_cnet=False, train_tfa=True),
                 marks=pytest.mark.slow),                      # stage 2
    pytest.param(dict(train_cfrm=True, train_cnet=True, train_tfa=True,
                      multi_task=True),
                 marks=pytest.mark.slow),                      # joint MTL
])
def test_split_step_matches_monolithic(stage_kw):
    """make_split_train_step must be numerically identical to
    make_train_step: the reference's detach boundaries
    (engine_unifie.py:135-225) make the three loss subgraphs disjoint, so
    splitting the backward changes nothing but module size."""
    cfg, frozen, trainable, sched, _ = _tiny_setup(use_tfa=True,
                                                   tasks=("ir", "cls"))
    stage = ST.StageConfig(**stage_kw)
    task = "cls" if stage_kw.get("multi_task") else "ir"
    batch = _batch(jax.random.PRNGKey(1))
    if task == "cls":
        batch["gt"] = jnp.zeros((2,), jnp.int32)

    def te_fn(preds, hq, gt, t):
        if t == "ir":
            return 10.0 * jnp.mean(jnp.abs(preds - hq))
        return 0.1 * jnp.mean(preds.astype(jnp.float32) ** 2)

    outs = []
    for maker in (ST.make_train_step, ST.make_split_train_step):
        # plain SGD: the update is LINEAR in the grads, so float
        # reduction-order noise between the two backward partitions stays
        # within rtol (Adam's 1/sqrt(v) normalizer would amplify
        # near-zero-grad noise to full step size)
        tx = OPT.make_optimizer(opt="momentum", lr=1e-3, momentum=0.0,
                                weight_decay=0.0)
        opt_state = tx.init(trainable)
        step = maker(frozen, cfg, sched, stage, tx, task,
                     te_loss_fn=te_fn, donate=False)
        outs.append(step(trainable, opt_state, batch, jax.random.PRNGKey(2)))
    (tr_a, opt_a, logs_a), (tr_b, opt_b, logs_b) = outs
    assert set(logs_a) == set(logs_b)
    for k in logs_a:
        np.testing.assert_allclose(float(logs_a[k]), float(logs_b[k]),
                                   rtol=2e-5, atol=1e-6, err_msg=k)
    for xa, xb in zip(jax.tree.leaves(tr_a), jax.tree.leaves(tr_b)):
        np.testing.assert_allclose(np.asarray(xa, np.float32),
                                   np.asarray(xb, np.float32),
                                   rtol=2e-5, atol=2e-6)


def test_stage2_trains_tfa_only():
    cfg, frozen, trainable, sched, _ = _tiny_setup(
        use_tfa=True, tasks=("ir", "cls", "seg"), multi_task=True)
    stage = ST.StageConfig(train_cfrm=False, train_cnet=False, train_tfa=True,
                           multi_task=True)
    tx = OPT.make_optimizer(lr=1e-3)
    opt_state = tx.init(trainable)
    step = ST.make_train_step(frozen, cfg, sched, stage, tx, "ir",
                              donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    new_tr, _, logs = step(trainable, opt_state, batch, jax.random.PRNGKey(2))

    def changed(a, b):
        return any(not np.allclose(x, y) for x, y in
                   zip(jax.tree.leaves(a), jax.tree.leaves(b)))

    assert not changed(trainable["cfrm"], new_tr["cfrm"])
    assert not changed(trainable["controller"], new_tr["controller"])
    assert changed(new_tr["tfa"], trainable["tfa"])
    # ir prompt got gradient; other prompts move only via the shared editors
    assert not np.allclose(np.asarray(new_tr["tfa"]["task_prompts"]["ir"]),
                           np.asarray(trainable["tfa"]["task_prompts"]["ir"]))


def test_stage3_prompts_only():
    cfg, frozen, trainable, sched, _ = _tiny_setup(use_tfa=True,
                                                   tasks=("ir", "det"))
    stage = ST.StageConfig(train_cfrm=False, train_cnet=False, train_tfa=True,
                           tfa_prompts_only=True)
    tx = OPT.make_optimizer(lr=1e-3)
    opt_state = tx.init(trainable)
    step = ST.make_train_step(frozen, cfg, sched, stage, tx, "det",
                              donate=False)
    batch = _batch(jax.random.PRNGKey(1))
    new_tr, _, _ = step(trainable, opt_state, batch, jax.random.PRNGKey(2))

    eds_same = all(np.allclose(x, y) for x, y in zip(
        jax.tree.leaves(trainable["tfa"]["task_editors"]),
        jax.tree.leaves(new_tr["tfa"]["task_editors"])))
    assert eds_same
    assert not np.allclose(np.asarray(new_tr["tfa"]["task_prompts"]["det"]),
                           np.asarray(trainable["tfa"]["task_prompts"]["det"]))


def test_data_parallel_step_on_8_device_mesh():
    """DP semantics: batch sharded over the mesh, params replicated, grads
    all-reduced by XLA. Must match the single-device step numerically."""
    cfg, frozen, trainable, sched, stage = _tiny_setup()
    # SGD: update is linear in the grad, so single-device vs all-reduced
    # grads must agree to float tolerance (adam would amplify reduction-order
    # noise of near-zero grads to lr scale)
    tx = OPT.make_optimizer(opt="sgd", lr=1e-3)
    opt_state = tx.init(trainable)
    batch = _batch(jax.random.PRNGKey(1), b=8)
    rng = jax.random.PRNGKey(2)

    step = ST.make_train_step(frozen, cfg, sched, stage, tx, "ir",
                              donate=False)
    tr_single, _, logs_single = step(trainable, opt_state, batch, rng)

    mesh = make_mesh()
    assert mesh.shape["data"] == 8
    frozen_r = replicate(mesh, frozen)
    trainable_r = replicate(mesh, trainable)
    opt_r = replicate(mesh, tx.init(trainable_r))
    batch_r = shard_batch(mesh, batch)
    step_r = ST.make_train_step(frozen_r, cfg, sched, stage, tx, "ir",
                                donate=False)
    tr_dp, _, logs_dp = step_r(trainable_r, opt_r, batch_r, rng)

    np.testing.assert_allclose(float(logs_dp["train/loss"]),
                               float(logs_single["train/loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(tr_single), jax.tree.leaves(tr_dp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


@pytest.mark.slow  # two full train-step compiles (~10 min on 1 vCPU)
def test_fsdp_step_matches_replicated():
    """FSDP (ZeRO-3) placement must be numerically a no-op: leaves sharded
    over the data axis, GSPMD all-gathers weights just-in-time and
    reduce-scatters grads into the sharded update (parallel/fsdp.py). Two
    consecutive steps also verify the state STAYS sharded across steps
    rather than silently collapsing to replicated."""
    from unirestore_tpu.parallel import fsdp_shard, sharded_fraction

    cfg, frozen, trainable, sched, stage = _tiny_setup()
    # SGD: linear in grads (see test_data_parallel_step_on_8_device_mesh)
    tx = OPT.make_optimizer(opt="sgd", lr=1e-3)
    mesh = make_mesh()
    batches = [_batch(jax.random.PRNGKey(i), b=8) for i in (1, 3)]
    rng = jax.random.PRNGKey(2)

    outs = []
    for mode in ("replicated", "fsdp"):
        place = ((lambda t: fsdp_shard(mesh, t, min_size=64))
                 if mode == "fsdp" else (lambda t: replicate(mesh, t)))
        tr, fr = place(trainable), place(frozen)
        opt = place(tx.init(trainable))
        if mode == "fsdp":
            assert sharded_fraction(tr) > 0.5
            assert sharded_fraction(fr) > 0.5
        step = ST.make_train_step(fr, cfg, sched, stage, tx, "ir",
                                  donate=False)
        logs = None
        for b in batches:
            tr, opt, logs = step(tr, opt, shard_batch(mesh, b), rng)
        outs.append((tr, logs))
    (tr_rep, logs_rep), (tr_fsdp, logs_fsdp) = outs

    # the updated state kept its sharded placement across steps
    assert sharded_fraction(tr_fsdp) > 0.5
    np.testing.assert_allclose(float(logs_fsdp["train/loss"]),
                               float(logs_rep["train/loss"]), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(tr_rep), jax.tree.leaves(tr_fsdp)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_distributed_helpers_single_process():
    """Multi-host helpers must be exact no-ops in a single process: the
    gated init does not touch the runtime, and the process-local slice is
    the whole batch (parallel/distributed.py)."""
    from unirestore_tpu.parallel import init_distributed, process_local_rows

    assert init_distributed() is False  # no env gate, no force
    assert process_local_rows(8) == slice(0, 8)


def test_fsdp_spec_rules():
    """Sharding rule: largest mesh-divisible axis; small/indivisible leaves
    replicated; scalars untouched."""
    from jax.sharding import PartitionSpec as P

    from unirestore_tpu.parallel import fsdp_spec

    w = np.zeros((3, 3, 64, 129))  # 129 not divisible by 8 -> 64 wins
    assert fsdp_spec(w, 8, min_size=1) == P(None, None, "data", None)
    assert fsdp_spec(np.zeros((128, 256)), 8, min_size=1) == \
        P(None, "data")
    assert fsdp_spec(np.zeros((7, 11)), 8, min_size=1) == P()  # indivisible
    assert fsdp_spec(np.zeros((1024,)), 8) == P()  # < min_size: replicated
    assert fsdp_spec(np.float32(0.0), 8) == P()  # scalar (schedule count)


def test_checkpoint_roundtrip_and_surgery():
    cfg, frozen, trainable, sched, _ = _tiny_setup(use_tfa=True,
                                                   tasks=("ir", "cls"))
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        CKPT.save_checkpoint(path, trainable, step=123, metadata={"stage": 1})
        restored, meta = CKPT.load_trainable(path, jax.tree.map(
            jnp.zeros_like, trainable))
        assert meta["step"] == 123
        for a, b in zip(jax.tree.leaves(trainable), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # stage surgery: fresh tree, restore only cfrm
        fresh = jax.tree.map(jnp.zeros_like, trainable)
        merged = CKPT.load_subtree(path, fresh, keys={"cfrm"})
        assert np.allclose(
            np.asarray(jax.tree.leaves(merged["cfrm"])[0]),
            np.asarray(jax.tree.leaves(trainable["cfrm"])[0]))
        assert all(float(np.abs(x).sum()) == 0.0
                   for x in jax.tree.leaves(merged["controller"]))


def test_checkpoint_manager_top_k():
    cfg, frozen, trainable, sched, _ = _tiny_setup()
    with tempfile.TemporaryDirectory() as d:
        mgr = CKPT.CheckpointManager(d, save_top_k=2, mode="max")
        for step, val in [(1, 10.0), (2, 30.0), (3, 20.0), (4, 5.0)]:
            mgr.save(trainable, step, val)
        files = sorted(os.listdir(d))
        assert len(files) == 2
        assert any("val=30.0000" in f for f in files)
        assert any("val=20.0000" in f for f in files)
        assert "val=30.0000" in mgr.best_path


def test_checkpoint_manager_adopts_previous_run():
    """On resume, checkpoints from a previous run must participate in
    top-k pruning (not accumulate forever)."""
    cfg, frozen, trainable, sched, _ = _tiny_setup()
    with tempfile.TemporaryDirectory() as d:
        mgr = CKPT.CheckpointManager(d, save_top_k=2, mode="max")
        for step, val in [(1, 10.0), (2, 30.0)]:
            mgr.save(trainable, step, val)
        # simulate a restart: a fresh manager over the same directory
        mgr2 = CKPT.CheckpointManager(d, save_top_k=2, mode="max")
        assert "val=30.0000" in mgr2.best_path
        mgr2.save(trainable, 3, 20.0)  # beats 10.0 from the previous run
        files = sorted(os.listdir(d))
        assert len(files) == 2
        assert any("val=30.0000" in f for f in files)
        assert any("val=20.0000" in f for f in files)


def test_restore_opt_state_structure_mismatch_is_fresh():
    """Changing the optimizer chain between save and resume must not
    restore shape-compatible leaves into wrong slots."""
    import optax

    cfg, frozen, trainable, sched, _ = _tiny_setup()
    tx_a = optax.adamw(1e-4)
    state_a = tx_a.init(trainable)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        CKPT.save_checkpoint(path, trainable, step=1, opt_state=state_a)
        # same structure restores exactly
        same = CKPT.restore_opt_state(path, jax.tree.map(
            lambda x: jnp.zeros_like(x) if hasattr(x, "shape") else x,
            state_a))
        a_leaves = [x for x in jax.tree.leaves(state_a)
                    if hasattr(x, "shape")]
        s_leaves = [x for x in jax.tree.leaves(same) if hasattr(x, "shape")]
        for a, s in zip(a_leaves, s_leaves):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(s))
        # different chain (extra leaves) -> fresh template, no mis-slotting
        tx_b = optax.chain(optax.clip_by_global_norm(1.0),
                           optax.adamw(1e-4), optax.adamw(1e-4))
        state_b = tx_b.init(trainable)
        restored = CKPT.restore_opt_state(path, state_b)
        for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state_b)):
            if hasattr(a, "shape"):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_engine_jit_cache_is_bounded():
    """restore_fn compiles one program per (shape, task); the cache must
    evict LRU entries instead of growing without bound on arbitrary-size
    predict streams."""
    from unirestore_tpu.train.engine import UniFIEEngine

    eng = UniFIEEngine({"frenc": {"type": "CFRM"},
                        "cnet": {"type": "scedit", "num_inference_steps": 1}},
                       tiny=True, compute_dtype="float32")
    eng._jit_cache_max = 2
    run = eng.restore_fn(num_inference_steps=1)
    for hw in (64, 96, 128):
        img = np.zeros((1, hw, hw, 3), np.float32)
        out = run(img, "ir")
        assert out.shape == img.shape
    assert len(eng._jit_cache) == 2
    keys = list(eng._jit_cache)
    assert all(k[1][1] in (96, 128) for k in keys)  # 64 evicted (LRU)


def test_onecycle_schedule_shape():
    sched = OPT.make_lr_schedule("onecycle", peak_lr=1e-3, total_steps=1000)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-5)  # peak @10%
    np.testing.assert_allclose(float(sched(0)), 1e-4, rtol=1e-5)  # div 10
    assert float(sched(50)) > float(sched(0))  # warmup rises
    assert float(sched(999)) < 1e-6  # final anneal


def test_data_parallel_inference_on_8_device_mesh():
    """Sharded restore: batch split over the data mesh axis must equal the
    single-device restore (pure data parallelism, no cross-sample ops)."""
    from unirestore_tpu.models import unirestore as UR

    cfg, frozen, trainable, sched, _ = _tiny_setup(use_tfa=True,
                                                   tasks=("ir",))
    images = jax.random.uniform(jax.random.PRNGKey(0), (8, 64, 64, 3))
    rng = jax.random.PRNGKey(1)

    def run(fz, tr, im):
        return UR.restore_padded(fz, tr, cfg, sched, im, "ir", rng,
                                 num_inference_steps=2)

    single = jax.jit(run)(frozen, trainable, images)

    mesh = make_mesh()
    fz_r = replicate(mesh, frozen)
    tr_r = replicate(mesh, trainable)
    im_r = shard_batch(mesh, {"x": images})["x"]
    sharded = jax.jit(run)(fz_r, tr_r, im_r)
    # GSPMD partitioning reassociates reductions, so tiny float diffs
    # amplify through the diffusion loop; 5e-3 on a [0,1] image is far
    # below perceptual relevance while still catching any routing bug
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=5e-3)


@pytest.mark.slow
def test_predict_cli_writes_outputs(tmp_path):
    """End-to-end `main.py predict` on the tiny smoke config: restores the
    val set and writes one PNG per input (reference: LightningCLI predict
    surface, src/main.py:17-28)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    smoke = tmp_path / "smoke"
    env = dict(os.environ, JAX_PLATFORMS="")
    # hermetic vs the caller's harness: an inherited
    # --xla_force_host_platform_device_count would give the child an
    # 8-device mesh against a tiny smoke batch (conftest sets device
    # count for in-process tests; children must configure their own)
    env.pop("XLA_FLAGS", None)
    subprocess.run([sys.executable,
                    os.path.join(root, "tools", "make_smoke_data.py"),
                    str(smoke)], check=True, cwd=root, env=env)
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "main.py"), "predict",
         "--config", str(smoke / "smoke.yaml"), "--tiny", "--platform",
         "cpu"],
        cwd=root, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out_dirs = list(smoke.glob("**/predict"))
    assert out_dirs, proc.stdout[-2000:]
    pngs = list(out_dirs[0].glob("*.png"))
    assert pngs, "predict wrote no images"


@pytest.mark.slow
def test_fit_resume_from_last_checkpoint(tmp_path):
    """Restart-based recovery: a second fit with trainer.resume continues
    from last.npz (trainable + optimizer state + step counter) instead of
    restarting at step 0 (the reference delegates this to Lightning
    ckpt_path resume)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    smoke = tmp_path / "smoke"
    env = dict(os.environ, JAX_PLATFORMS="")
    # hermetic vs the caller's harness: an inherited
    # --xla_force_host_platform_device_count would give the child an
    # 8-device mesh against a tiny smoke batch (conftest sets device
    # count for in-process tests; children must configure their own)
    env.pop("XLA_FLAGS", None)
    subprocess.run([sys.executable,
                    os.path.join(root, "tools", "make_smoke_data.py"),
                    str(smoke)], check=True, cwd=root, env=env)

    def fit(extra):
        return subprocess.run(
            [sys.executable, os.path.join(root, "main.py"), "fit",
             "--config", str(smoke / "smoke.yaml"), "--tiny",
             "--platform", "cpu"] + extra,
            cwd=root, env=env, capture_output=True, text=True, timeout=900)

    p1 = fit(["--trainer.max_steps", "2"])
    assert p1.returncode == 0, p1.stderr[-2000:]
    assert "[fit] done at step 2" in p1.stdout

    p2 = fit(["--trainer.max_steps", "4", "--trainer.resume", "true"])
    assert p2.returncode == 0, p2.stderr[-2000:]
    assert "[resume]" in p2.stdout and "@ step 2" in p2.stdout, \
        p2.stdout[-2000:]
    assert "[fit] done at step 4" in p2.stdout
    assert "[step 1]" not in p2.stdout  # did not restart from scratch


@pytest.mark.slow
def test_fit_stop_after_cache_warm(tmp_path):
    """`--trainer.stop_after <phase> --trainer.max_steps 1` runs one
    truncated split-step (compile-cache warming for the axon remote
    compiler, one big XLA module per subprocess) and must NOT plant a
    resume checkpoint — the truncated step never updates anything."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    smoke = tmp_path / "smoke"
    env = dict(os.environ, JAX_PLATFORMS="")
    # hermetic vs the caller's harness: an inherited
    # --xla_force_host_platform_device_count would give the child an
    # 8-device mesh against a tiny smoke batch (conftest sets device
    # count for in-process tests; children must configure their own)
    env.pop("XLA_FLAGS", None)
    subprocess.run([sys.executable,
                    os.path.join(root, "tools", "make_smoke_data.py"),
                    str(smoke)], check=True, cwd=root, env=env)

    p = subprocess.run(
        [sys.executable, os.path.join(root, "main.py"), "fit",
         "--config", str(smoke / "smoke.yaml"), "--tiny",
         "--platform", "cpu", "--trainer.max_steps", "1",
         "--trainer.split_step", "true", "--trainer.stop_after", "fr"],
        cwd=root, env=env, capture_output=True, text=True, timeout=900)
    assert p.returncode == 0, p.stderr[-2000:]
    assert "cache-warm pass" in p.stdout, p.stdout[-2000:]
    assert not (smoke / "logs" / "checkpoints" / "last.npz").exists()


def test_spatially_sharded_encode_matches_single_device():
    """2-D (data, spatial) mesh: sharding NHWC height across chips must be
    numerically transparent — GSPMD inserts the conv halo exchanges and
    GroupNorm partial reductions (SURVEY §2.6 'optional headroom': spatial
    sharding of the 512px VAE activations)."""
    from unirestore_tpu.parallel import (make_mesh_2d, replicate,
                                         spatial_batch_sharding)

    cfg, frozen, trainable, sched, _ = _tiny_setup()
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    rng = jax.random.PRNGKey(1)

    def enc(fz, tr, x):
        return UR.encode(fz, tr, cfg, x, rng=rng)[0]

    single = jax.jit(enc)(frozen, trainable, images)

    mesh = make_mesh_2d(2, 4)
    fz = replicate(mesh, frozen)
    tr = replicate(mesh, trainable)
    im = jax.device_put(images, spatial_batch_sharding(mesh))
    sharded = jax.jit(enc)(fz, tr, im)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single),
                               atol=1e-5)

    # and the full restore pipeline compiles + runs under the 2-D sharding
    out = jax.jit(lambda f, t, x: UR.restore_padded(
        f, t, cfg, sched, x, "ir", rng, num_inference_steps=2))(fz, tr, im)
    assert out.shape == images.shape
    assert np.isfinite(np.asarray(out)).all()


def test_cli_override_forms():
    """Dotted overrides: '=', space-separated, negative numbers, and bare
    flags (None) must all parse like LightningCLI."""
    import tempfile

    from unirestore_tpu.config import load_config

    with tempfile.NamedTemporaryFile("w", suffix=".yaml") as f:
        f.write("trainer:\n  max_steps: 4\n")
        f.flush()
        cfg = load_config(f.name, [
            "--trainer.max_steps=7", "--trainer.limit_val_batches", "-1",
            "--trainer.logger", "--data.num_workers", "3"])
    assert cfg["trainer"]["max_steps"] == 7
    assert cfg["trainer"]["limit_val_batches"] == -1
    assert cfg["trainer"]["logger"] is None
    assert cfg["data"]["num_workers"] == 3

    # leading-dot negative floats and -.inf are value tokens too
    with tempfile.NamedTemporaryFile("w", suffix=".yaml") as f:
        f.write("a: {}\n")
        f.flush()
        cfg = load_config(f.name, ["--a.b", "-.5", "--a.c", "-.inf",
                                   "--a.d", "-2e-3"])
        assert cfg["a"]["b"] == -0.5
        assert cfg["a"]["c"] == float("-inf")
        assert cfg["a"]["d"] == -2e-3
        # a dash-leading non-numeric token after a valueless flag is an
        # error, not a silent flag named '.5'
        with pytest.raises(ValueError, match="ambiguous"):
            load_config(f.name, ["--a.b", "-x5"])


@pytest.mark.parametrize("name", ["train_stage1.yaml", "train_stage2.yaml",
                                  "train_stage3.yaml", "val.yaml"])
def test_reference_yamls_build_unchanged(name):
    """The reference's own config files must drive this framework without
    modification (the YAML surface is the public API, SURVEY §5)."""
    path = os.path.join("/root/reference/configs", name)
    if not os.path.exists(path):
        pytest.skip("reference configs not available")
    from unirestore_tpu import config as C

    cfg = C.load_config(path, [])
    etype = C.engine_type(cfg)
    engine, trainer, data, evf = C.build(cfg, tiny=True)
    assert engine.cfg.use_cfrm and engine.cfg.use_cnet
    assert etype in ("ir", "mtl")
    if name == "train_stage3.yaml":
        assert "det" in engine.cfg.tasks


def test_evaluator_factory_shares_heavy_metric_nets():
    """evaluator_factory is called once per validate() epoch; the heavy
    eval networks (FID Inception, LPIPS) must be the SAME objects across
    calls — rebuilding meant re-jitting the suite against the leaky remote
    compiler every epoch, and fresh FID objects would lose the cached real
    features (config._eval_cache)."""
    from unirestore_tpu import config as C

    cfg = {"model": {"class_path": "unirestore_tpu.ir",
                     "init_args": {"compute_fid": True, "eval_mode": "FR",
                                   "model_kwargs": {}}},
           "trainer": {"max_steps": 1}}
    engine, trainer, data, factory = C.build(cfg, tiny=True)
    ev1, ev2 = factory(engine), factory(engine)
    assert ev1.fid["lq"] is ev2.fid["lq"], "FID must persist across epochs"
    assert ev1.lpips_fn is ev2.lpips_fn, "LPIPS must persist across epochs"


def test_split_step_stop_after_leaves_state_untouched():
    """stop_after (the bench precompile hook) must return trainable and
    opt_state unchanged — it exists to compile sub-modules, never to
    half-apply a training step."""
    cfg, frozen, trainable, sched, _ = _tiny_setup(use_tfa=False,
                                                   tasks=("ir",))
    stage = ST.StageConfig(train_cfrm=True, train_cnet=True)
    tx = OPT.make_optimizer(opt="momentum", lr=1e-3, momentum=0.0,
                            weight_decay=0.0)
    opt_state = tx.init(trainable)
    step = ST.make_split_train_step(frozen, cfg, sched, stage, tx, "ir",
                                    donate=False, stop_after="fr")
    tr2, opt2, logs = step(trainable, opt_state, _batch(jax.random.PRNGKey(1)),
                           jax.random.PRNGKey(2))
    assert np.isfinite(float(logs["train/loss"]))
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), tr2, trainable)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), opt2, opt_state)
