"""Training/validation engine — the LitUniFIE equivalent.

Maps the reference's YAML surface (model_kwargs {frenc, cnet, tedit},
optimizer_kwargs, lr_scheduler_kwargs; engine_unifie.py:19-133) onto the
TPU-native pieces: UniRestoreConfig + (frozen, trainable) pytrees + staged
jitted train steps + data-parallel mesh + adapter-only checkpoints.

Engine variants bind the per-task TFA loss and evaluator
(engine_unifie.py:238-336): IR (L1), MTL (10xL1 ir / 0.1xCE cls / 0.1xCE
seg), CLF, Semseg, DET.
"""

from __future__ import annotations

import collections
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..models import unirestore as UR
from ..models import vae as VAEmod
from ..parallel import make_mesh, replicate, shard_batch
from ..tasks import deeplab as DLB
from ..tasks import resnet as RN
from .. import zoo
from . import checkpoints as CKPT
from . import optim as OPT
from . import steps as ST


def build_model_config(model_kwargs: dict) -> tuple[UR.UniRestoreConfig,
                                                    ST.StageConfig]:
    frenc = model_kwargs.get("frenc")
    cnet = model_kwargs.get("cnet")
    tedit = model_kwargs.get("tedit")
    if frenc and frenc.get("type") not in ("CFRM", None):
        raise ValueError(f"Invalid fr_type {frenc.get('type')}")
    cfg = UR.UniRestoreConfig(
        use_cfrm=bool(frenc),
        control_type=(cnet or {}).get("type", "none") if cnet else "none",
        num_inference_steps=(cnet or {}).get("num_inference_steps", 1),
        use_tfa=bool(tedit),
        tasks=tuple((tedit or {}).get("task", ("ir",))),
        prompt_len=(tedit or {}).get("prompt_len", 1),
        # opt-in cached inference modes (cnet: cache_mode "none" | "encoder"
        # | "deep", cache_stride N); exact reference semantics by default
        cache_mode=(cnet or {}).get("cache_mode", "none"),
        cache_stride=(cnet or {}).get("cache_stride", 2),
        cache_warmup=(cnet or {}).get("cache_warmup", 0),
    )
    stage = ST.StageConfig(
        train_cfrm=bool(frenc and frenc.get("train")),
        train_cnet=bool(cnet and cnet.get("train")),
        train_tfa=bool(tedit and tedit.get("train")),
        tfa_prompts_only=bool(tedit and tedit.get("new_task_only", False)),
        multi_task=bool(tedit and len(tedit.get("task", [])) > 1),
    )
    return cfg, stage


def build_critics(engine_type: str, downstream: str | None = None) -> dict:
    """Frozen downstream task nets used as stage-2/3 training critics
    (the engine variants' criterion dicts, engine_unifie.py:238-336).

    Module-level so tools (bench_train) can build the same critics the
    engine trains against without constructing a full engine."""
    critics = {}
    if engine_type in ("mtl", "cls"):
        p = RN.resnet_init(jax.random.PRNGKey(7), "resnet50")
        p, _ = zoo.load_npz_tree("resnet50_v1", p)
        critics["cls"] = p
    if engine_type in ("mtl", "seg"):
        p = DLB.deeplabv3plus_init(jax.random.PRNGKey(8))
        p, _ = zoo.load_npz_tree("deeplabv3plus_resnet50", p)
        critics["seg"] = p
    if engine_type == "det":
        # downstream selects the detector (engine_unifie.py:319-336)
        if downstream == "fastrcnn":
            from ..tasks import fasterrcnn as FRC
            p = FRC.fasterrcnn_init(jax.random.PRNGKey(9))
            p, _ = zoo.load_npz_tree("fasterrcnn_resnet50", p)
        else:
            from ..tasks import retinanet as RET
            p = RET.retinanet_init(jax.random.PRNGKey(9))
            p, _ = zoo.load_npz_tree("retinanet_resnet50", p)
        critics["det"] = p
    return critics


def make_te_loss_fn(engine_type: str, critics: dict,
                    downstream: str | None = None):
    """te_loss_fn(preds, hq, gt, task) for the jitted train steps."""
    etype = engine_type

    def fn(preds, hq, gt, task):
        p32 = preds.astype(jnp.float32)
        if etype == "mtl":
            if task == "ir":
                return 10.0 * jnp.abs(p32 - hq.astype(jnp.float32)).mean()
            if task == "cls":
                logits = RN.resnet_apply(critics["cls"], p32)
                return 0.1 * RN.cross_entropy_loss(logits, gt)
            if task == "seg":
                logits = DLB.deeplabv3plus_apply(critics["seg"], p32)
                return 0.1 * DLB.seg_cross_entropy_loss(logits, gt)
            raise KeyError(f"Task [{task}] is not defined!")
        if etype == "ir":
            return jnp.abs(p32 - hq.astype(jnp.float32)).mean()
        if etype == "cls":
            logits = RN.resnet_apply(critics["cls"], p32)
            return RN.cross_entropy_loss(logits, gt)
        if etype == "seg":
            logits = DLB.deeplabv3plus_apply(critics["seg"], p32)
            return DLB.seg_cross_entropy_loss(logits, gt)
        if etype == "det":
            # gt is the padded dict {"boxes", "labels", "mask"}
            # (DetectionLoss: sum of detector loss terms,
            # eval_detection.py:164-192)
            if downstream == "fastrcnn":
                from ..tasks import fasterrcnn as FRC
                return FRC.fasterrcnn_loss(
                    critics["det"], p32, gt["boxes"], gt["labels"],
                    gt["mask"])
            from ..tasks import retinanet as RET
            return RET.retinanet_loss(critics["det"], p32, gt["boxes"],
                                      gt["labels"], gt["mask"])
        raise KeyError(etype)

    return fn


class UniFIEEngine:
    """Builds params, loads stage checkpoints, owns train/eval closures."""

    engine_type = "ir"  # ir | mtl | cls | seg | det

    def __init__(self, model_kwargs: dict, optimizer_kwargs: dict | None = None,
                 lr_scheduler_kwargs: dict | None = None,
                 eval_mode: str = "FR", save_image: bool = False,
                 need_crop: bool = True, downstream: str | None = None,
                 tiny: bool = False, seed: int = 42,
                 compute_dtype: str = "bfloat16"):
        self.model_kwargs = model_kwargs or {}
        self.optimizer_kwargs = optimizer_kwargs or {
            "opt": "adamw", "base_lr": 1e-4, "base_bsz": 64}
        self.lr_scheduler_kwargs = lr_scheduler_kwargs
        self.eval_mode = eval_mode
        self.save_image = save_image
        self.need_crop = need_crop
        self.downstream = downstream
        self.seed = seed
        self.compute_dtype = jnp.bfloat16 if compute_dtype == "bfloat16" \
            else jnp.float32

        cfg, stage = build_model_config(self.model_kwargs)
        if tiny:
            base = UR.tiny_config(use_tfa=cfg.use_tfa,
                                  control_type=cfg.control_type
                                  if cfg.use_cnet else "none",
                                  tasks=cfg.tasks)
            cfg = base
        self.cfg = cfg
        self.stage = stage
        self.sched = UR.schedule(cfg)
        self.configure_model()

    # -- model/param construction (engine_unifie.py:35-133) ---------------

    def configure_model(self):
        key = jax.random.PRNGKey(self.seed)
        frozen, trainable = UR.init(key, self.cfg)
        frozen = zoo.load_frozen_backbone(frozen, self.cfg)

        mk = self.model_kwargs
        for family, keys in (("frenc", {"cfrm"}),
                             ("cnet", {"controller", "control"}),
                             ("tedit", {"tfa"})):
            d = mk.get(family)
            if d and d.get("ckpt_path") and "$" in str(d["ckpt_path"]):
                print(f"!!Skipping {family} ckpt placeholder "
                      f"{d['ckpt_path']!r}")
                d = dict(d, ckpt_path=None)
            if d and d.get("ckpt_path"):
                trainable = CKPT.load_subtree(d["ckpt_path"], trainable, keys)
                print(f"!!Loaded {family} from {d['ckpt_path']}")

        self.frozen = frozen
        self.trainable = trainable
        # bounded LRU of compiled restore programs, keyed by (shape, task):
        # arbitrary-size predict would otherwise grow one XLA executable per
        # distinct input shape without limit (serve.py bounds its cache the
        # same way)
        self._jit_cache = collections.OrderedDict()
        # floor of 1: eviction runs after insertion, so a 0 would evict
        # the program just compiled and KeyError on first use
        self._jit_cache_max = max(1, int(os.environ.get(
            "UNIRESTORE_JIT_CACHE_SIZE", "8")))

    # -- losses (engine variants, engine_unifie.py:238-336) ---------------

    def build_critics(self):
        """Frozen downstream nets for stage-2 losses/eval (lazy)."""
        return build_critics(self.engine_type, self.downstream)

    def te_loss_fn(self, critics):
        """Returns te_loss_fn(preds, hq, gt, task) for the jitted step."""
        return make_te_loss_fn(self.engine_type, critics, self.downstream)

    # -- inference ---------------------------------------------------------

    def restore_fn(self, num_inference_steps: int | None = None):
        """Host-callable restore closure; one jit per (shape, task)."""
        dt = self.compute_dtype
        frozen = jax.tree.map(lambda x: x.astype(dt), self.frozen)

        def run(images, task):
            tr = jax.tree.map(lambda x: x.astype(dt), self.trainable)
            key = ("restore", images.shape, task, num_inference_steps)
            if key not in self._jit_cache:
                def f(fz, t, img, rng):
                    return UR.restore(fz, t, self.cfg, self.sched,
                                      img.astype(dt), task, rng,
                                      num_inference_steps)
                self._jit_cache[key] = jax.jit(f)
                while len(self._jit_cache) > self._jit_cache_max:
                    self._jit_cache.popitem(last=False)
            else:
                self._jit_cache.move_to_end(key)
            rng = jax.random.PRNGKey(0)
            out = self._jit_cache[key](frozen, tr, jnp.asarray(images), rng)
            return np.asarray(out.astype(jnp.float32))

        return run

    def restore_tiled_fn(self, num_inference_steps: int | None = None,
                         tile: int | None = None, overlap: int = 64,
                         batch_tiles: int = 4):
        """Arbitrary-size restore: inputs larger than ``tile`` (default:
        the model's working resolution, cfg.min_size) are split into
        fixed-shape overlapping tile batches (ONE compile) and
        re-composited with feather blending (ops/tiling.py); smaller inputs
        pass straight through ``restore_fn``."""
        from ..ops import tiling as TIL

        tile = tile or self.cfg.min_size
        base = self.restore_fn(num_inference_steps)

        def run(images, task):
            return TIL.restore_tiled(base, np.asarray(images), task,
                                     tile=tile, overlap=overlap,
                                     batch_tiles=batch_tiles)

        return run


class Trainer:
    """fit/validate loops (Lightning Trainer surface subset)."""

    def __init__(self, max_steps: int = 1000, val_check_interval: int = 0,
                 log_every_n_steps: int = 25, accumulate_grad_batches: int = 1,
                 default_root_dir: str = "logs", save_top_k: int = 5,
                 monitor_mode: str = "max", num_sanity_val_steps: int = 0,
                 limit_val_batches: int | None = None, seed: int = 42,
                 profiler: str | None = None,
                 resume: str | bool | None = None,
                 split_step: bool | None = None,
                 fsdp: bool = False,
                 stop_after: str | None = None):
        self.max_steps = max_steps
        # restart-based recovery (Lightning ckpt_path resume): True/"auto"
        # resumes from <root>/checkpoints/last.npz when present; a path
        # resumes from that file. Restores trainable + optimizer state +
        # step counter (the reference delegates this to Lightning).
        self.resume = resume
        # split the train step into one XLA module per loss subgraph
        # (steps.make_split_train_step) — needed on platforms whose
        # compiler cannot hold the monolithic full-scale backward.
        # None = platform default: ON under the remote-compile tunnel
        # (axon), OFF elsewhere (monolithic saves one encode dispatch)
        if split_step is None:
            import jax as _jax
            split_step = _jax.default_backend() == "axon"
        self.split_step = split_step
        # compile-cache warming (axon remote compiler leak, CLAUDE.md):
        # `--trainer.stop_after shared|fr|cn|te --trainer.max_steps 1`
        # truncates the split step after ONE sub-module so each big XLA
        # module compiles in its own `main.py fit` subprocess into the
        # persistent cache; the real fit then starts warm. Explicit config,
        # never ambient (steps.py design note); no checkpoint is written.
        if stop_after is not None and not split_step:
            raise ValueError("trainer.stop_after requires split_step")
        if stop_after is not None and stop_after not in (
                "shared", "fr", "cn", "te"):
            # fail here, not after data setup + precompiles: a typo'd value
            # would otherwise burn the whole multi-minute setup before the
            # lazy check inside make_split_train_step fires
            raise ValueError(
                f"trainer.stop_after must be one of shared|fr|cn|te, "
                f"got {stop_after!r}")
        self.stop_after = stop_after
        # FSDP (ZeRO-3) placement: shard trainable/frozen/optimizer state
        # over the data axis instead of replicating (parallel/fsdp.py);
        # GSPMD gathers weights just-in-time and reduce-scatters grads
        self.fsdp = fsdp
        self.val_check_interval = val_check_interval
        self.log_every = log_every_n_steps
        self.accum = accumulate_grad_batches
        self.root = default_root_dir
        self.save_top_k = save_top_k
        self.monitor_mode = monitor_mode
        self.num_sanity_val_steps = num_sanity_val_steps
        self.limit_val_batches = limit_val_batches
        self.seed = seed
        self.profiler = profiler  # logdir for a jax device trace, or None
        self.mesh = make_mesh()
        self.logs = []
        from .logging import MetricLogger
        self.logger = MetricLogger(self.root, "train")

    def _log(self, step, logs):
        entry = {"step": step,
                 **{k: float(v) for k, v in logs.items()}}
        self.logs.append(entry)
        self.logger.log_scalars(step, {k: v for k, v in entry.items()
                                       if k != "step"})
        msg = " ".join(f"{k}={v:.4f}" for k, v in entry.items()
                       if k != "step")
        print(f"[step {step}] {msg}", flush=True)

    def fit(self, engine: UniFIEEngine, data, evaluator_factory=None):
        # persistent compile cache on TPU: full-scale step modules take
        # minutes to compile through this platform's remote compiler (and
        # its server leaks across large compiles in one session —
        # CLAUDE.md); tools/bench_train.py pre-populates the same cache,
        # so a CLI fit after a bench run starts warm
        if jax.default_backend() in ("tpu", "axon"):
            from ..compile_cache import enable_compile_cache
            if not jax.config.jax_compilation_cache_dir:
                enable_compile_cache()
        n_dev = len(self.mesh.devices.reshape(-1))
        train_loader = data.train_dataloader()
        batch_size = train_loader.batch_size
        tx, peak = OPT.build(engine.optimizer_kwargs,
                             engine.lr_scheduler_kwargs,
                             total_steps=self.max_steps,
                             batch_size=batch_size, accum_iter=self.accum,
                             num_devices=n_dev)
        print(f"[optimizer] peak lr {peak:.2e} over {self.max_steps} steps")
        critics = engine.build_critics()
        te_fn = engine.te_loss_fn(critics) if engine.cfg.use_tfa else None

        start_step = 0
        resume_path = self.resume
        if resume_path in (True, "auto", "true"):
            resume_path = os.path.join(self.root, "checkpoints", "last.npz")
        opt_state_h = tx.init(engine.trainable)
        if resume_path and os.path.exists(str(resume_path)):
            engine.trainable, meta = CKPT.load_trainable(str(resume_path),
                                                         engine.trainable)
            opt_state_h = CKPT.restore_opt_state(str(resume_path),
                                                 opt_state_h)
            start_step = int(meta.get("step", 0))
            print(f"[resume] {resume_path} @ step {start_step}")
        elif self.resume and resume_path:
            if self.resume not in (True, "auto", "true"):
                # an EXPLICIT path that doesn't exist is a user error —
                # silently restarting would overwrite the state they
                # meant to continue
                raise FileNotFoundError(
                    f"trainer.resume checkpoint not found: {resume_path}")
            print(f"[resume] no checkpoint at {resume_path}; "
                  "starting from scratch")

        if self.fsdp:
            from ..parallel import fsdp_shard, sharded_fraction
            trainable = fsdp_shard(self.mesh, engine.trainable)
            frozen = fsdp_shard(self.mesh, engine.frozen)
            opt_state = fsdp_shard(self.mesh, opt_state_h)
            print(f"[fsdp] sharded {sharded_fraction(trainable):.0%} of "
                  f"trainable / {sharded_fraction(frozen):.0%} of frozen "
                  f"elements over {n_dev} devices")
        else:
            trainable = replicate(self.mesh, engine.trainable)
            frozen = replicate(self.mesh, engine.frozen)
            opt_state = replicate(self.mesh, opt_state_h)

        steps_by_task = {}

        def get_step(task):
            if task not in steps_by_task:
                if self.split_step:
                    steps_by_task[task] = ST.make_split_train_step(
                        frozen, engine.cfg, engine.sched, engine.stage, tx,
                        task, te_loss_fn=te_fn, donate=True,
                        stop_after=self.stop_after)
                else:
                    steps_by_task[task] = ST.make_train_step(
                        frozen, engine.cfg, engine.sched, engine.stage, tx,
                        task, te_loss_fn=te_fn, donate=True)
            return steps_by_task[task]

        # sanity validation before fit (Lightning num_sanity_val_steps,
        # train_stage1.yaml:25)
        if self.num_sanity_val_steps and evaluator_factory and data:
            print(f"[sanity] running {self.num_sanity_val_steps} "
                  "validation steps")
            evaluator = evaluator_factory(engine)
            loaders = data.val_dataloader()
            if not isinstance(loaders, (list, tuple)):
                loaders = [loaders]
            n = 0
            for loader in loaders:
                for b in loader:
                    evaluator.validation_step(b)
                    n += 1
                    if n >= self.num_sanity_val_steps:
                        break
                if n >= self.num_sanity_val_steps:
                    break
            evaluator.epoch_end()

        mgr = CKPT.CheckpointManager(os.path.join(self.root, "checkpoints"),
                                     self.save_top_k, self.monitor_mode)
        from .profiling import StepTimer
        timer = StepTimer(warmup=1)
        trace_window = None  # (start, stop) steps for the device trace
        if self.profiler:
            trace_window = (2, min(6, self.max_steps))
        # fold the start step into the rng so a resumed run draws fresh
        # (but deterministic) noise rather than replaying step-0 keys
        rng = jax.random.fold_in(jax.random.PRNGKey(self.seed), start_step)
        step = start_step
        t0 = time.time()
        it = iter(train_loader)
        while step < self.max_steps:
            if trace_window and step + 1 == trace_window[0]:
                jax.profiler.start_trace(self.profiler)
            try:
                batch = next(it)
            except StopIteration:
                it = iter(train_loader)
                batch = next(it)
            task = batch.pop("task")
            batch.pop("fname", None)
            if task == "det" and isinstance(batch.get("gt"), list):
                from ..tasks.retinanet import pad_targets
                boxes, labels, mask = pad_targets(batch.pop("gt"))
                batch["gt"] = {"boxes": boxes, "labels": labels,
                               "mask": mask}
            dev_batch = shard_batch(self.mesh, {
                k: v for k, v in batch.items()
                if isinstance(v, (np.ndarray, dict))})
            rng, sub = jax.random.split(rng)
            with timer:
                trainable, opt_state, logs = get_step(task)(
                    trainable, opt_state, dev_batch, sub)
                jax.block_until_ready(logs) if self.profiler else None
            step += 1
            if trace_window and step == trace_window[1]:
                jax.profiler.stop_trace()
                trace_window = None
                print(f"[profiler] device trace written to {self.profiler}")
            if step % self.log_every == 0 or step == 1:
                logs = {k: float(v) for k, v in logs.items()}
                logs["imgs_per_sec"] = batch_size * self.log_every / max(
                    time.time() - t0, 1e-9)
                t0 = time.time()
                self._log(step, logs)
            # stop_after (cache-warm) runs never update trainable — a
            # val-interval checkpoint here would plant the same bogus
            # resume point the final-checkpoint skip below exists to avoid
            if (self.val_check_interval and evaluator_factory
                    and not self.stop_after
                    and step % self.val_check_interval == 0):
                engine.trainable = jax.tree.map(np.asarray, trainable)
                metrics = self.validate(engine, data, evaluator_factory)
                mgr.save(engine.trainable, step,
                         metrics.get("val_monitor", 0.0))
                # crash-recovery state: at most one val interval is lost
                CKPT.save_checkpoint(
                    os.path.join(self.root, "checkpoints", "last.npz"),
                    engine.trainable, step, opt_state=opt_state)
        engine.trainable = jax.tree.map(np.asarray, trainable)
        if self.stop_after:
            # cache-warming run: the truncated step never updated anything;
            # writing last.npz would plant a bogus resume point
            print(f"[fit] stop_after={self.stop_after} cache-warm pass "
                  f"done at step {step}; no checkpoint written")
            return engine
        final = os.path.join(self.root, "checkpoints", "last.npz")
        CKPT.save_checkpoint(final, engine.trainable, step,
                             opt_state=opt_state)
        ts = timer.summary()
        if ts:
            print(f"[timing] steps={ts['steps']} mean={ts['mean_s']:.3f}s "
                  f"p50={ts['p50_s']:.3f}s p90={ts['p90_s']:.3f}s "
                  f"({batch_size / ts['p50_s']:.2f} imgs/s)")
        print(f"[fit] done at step {step}; saved {final}")
        return engine

    def validate(self, engine: UniFIEEngine, data, evaluator_factory):
        evaluator = evaluator_factory(engine)
        if hasattr(evaluator, "set_logger"):
            evaluator.set_logger(self.logger)
        loaders = data.val_dataloader()
        if not isinstance(loaders, (list, tuple)):
            loaders = [loaders]
        n = 0
        for loader in loaders:
            for batch in loader:
                evaluator.validation_step(batch)
                n += 1
                if self.limit_val_batches and n >= self.limit_val_batches:
                    break
        metrics = evaluator.epoch_end()
        from ..evalx.task_metric import TaskMetric
        TaskMetric.print_metrics(metrics)
        return metrics
