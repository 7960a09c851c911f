"""YAML config system mirroring the reference's LightningCLI surface.

Same document shape as the reference configs (configs/train_stage*.yaml):
``seed_everything``, ``trainer{...}``, ``model{class_path, init_args}``,
``data{class_path, init_args}``; CLI dotted overrides
(``--trainer.logger null``, README.md:82) are applied on top.

Reference class_path strings are accepted as aliases so the reference YAMLs
drive this framework unchanged.
"""

from __future__ import annotations

import copy
import re

import yaml

ENGINE_ALIASES = {
    "core.engine_unifie.LitUniFIE": "ir",
    "core.engine_unifie.LitUniFIEIR": "ir",
    "core.engine_unifie.LitUniFIEMTL": "mtl",
    "core.engine_unifie.LitUniFIECLF": "cls",
    "core.engine_unifie.LitUniFIESemseg": "seg",
    "core.engine_unifie.LitUniFIEDET": "det",
    "unirestore_tpu.ir": "ir",
    "unirestore_tpu.mtl": "mtl",
    "unirestore_tpu.cls": "cls",
    "unirestore_tpu.seg": "seg",
    "unirestore_tpu.det": "det",
}


def load_config(path: str, overrides: list[str] | None = None) -> dict:
    """Load YAML + apply dotted CLI overrides.

    Both LightningCLI forms work: ``--trainer.max_steps=100`` and
    ``--trainer.max_steps 100`` (flag followed by a separate value token).
    A flag with neither form sets the key to None (``--trainer.logger``).
    """
    with open(path) as f:
        cfg = yaml.safe_load(f)
    toks = list(overrides or [])
    i = 0
    while i < len(toks):
        ov = toks[i]
        i += 1
        if not ov.startswith("-"):
            raise ValueError(f"unexpected CLI token {ov!r} "
                             "(overrides look like --a.b.c=value)")
        key, eq, val = ov.partition("=")
        key = key.lstrip("-")
        if not eq and i < len(toks):
            nxt = toks[i]
            # a value token: anything not starting with '-', or a negative
            # number (incl. leading-dot floats and inf/nan, e.g.
            # `--trainer.limit_val_batches -1`, `--a.b -.5`, `--a.b -.inf`)
            if not nxt.startswith("-") or re.fullmatch(_NUMERIC, nxt,
                                                       re.IGNORECASE):
                val = nxt
                i += 1
            elif not nxt.startswith("--"):
                raise ValueError(
                    f"ambiguous token {nxt!r} after valueless flag "
                    f"{ov!r}: use --key=value for dash-leading values")
        set_dotted(cfg, key, _parse_scalar(val))
    return cfg


_NUMERIC = r"[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?|[+-]?\.?(inf|nan)"


def _parse_scalar(text: str):
    """YAML-parse a CLI value, with a numeric fallback for forms YAML 1.1
    leaves as strings (leading-dot floats `-.5`, dotless exponents `2e-3`)."""
    if text == "":
        return None
    v = yaml.safe_load(text)
    if isinstance(v, str) and re.fullmatch(_NUMERIC, v, re.IGNORECASE):
        return float(v)
    return v


def set_dotted(cfg: dict, dotted: str, value):
    parts = dotted.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def engine_type(cfg: dict) -> str:
    cp = cfg.get("model", {}).get("class_path", "unirestore_tpu.ir")
    if cp not in ENGINE_ALIASES:
        raise KeyError(f"unknown model class_path: {cp}")
    return ENGINE_ALIASES[cp]


def build(cfg: dict, tiny: bool = False):
    """Returns (engine, trainer, data_engine, evaluator_factory)."""
    from .data.engine import DatasetEngine
    from .evalx import evaluators as EV
    from .train.engine import Trainer, UniFIEEngine

    etype = engine_type(cfg)
    m = copy.deepcopy(cfg.get("model", {}).get("init_args", {}))
    engine = UniFIEEngine(
        model_kwargs=m.get("model_kwargs", {}),
        optimizer_kwargs=m.get("optimizer_kwargs"),
        lr_scheduler_kwargs=m.get("lr_scheduler_kwargs"),
        eval_mode=m.get("eval_mode", "FR"),
        save_image=m.get("save_image", False),
        need_crop=m.get("need_crop", True),
        downstream=m.get("downstream"),
        tiny=tiny,
        seed=cfg.get("seed_everything", 42),
    )
    engine.engine_type = etype

    t = cfg.get("trainer", {})
    logger = t.get("logger") or {}
    root = (logger.get("init_args", {}) or {}).get("save_dir", "logs")
    trainer = Trainer(
        max_steps=t.get("max_steps", 1000),
        val_check_interval=t.get("val_check_interval") or 0,
        log_every_n_steps=t.get("log_every_n_steps", 25),
        accumulate_grad_batches=t.get("accumulate_grad_batches", 1),
        default_root_dir=root,
        num_sanity_val_steps=t.get("num_sanity_val_steps", 0),
        limit_val_batches=t.get("limit_val_batches"),
        seed=cfg.get("seed_everything", 42),
        profiler=t.get("profiler"),
        resume=t.get("resume"),
        # None -> platform default (split under the axon remote compiler)
        split_step=(None if t.get("split_step") is None
                    else bool(t.get("split_step"))),
        fsdp=bool(t.get("fsdp", False)),
        stop_after=t.get("stop_after"),
    )

    d = cfg.get("data", {}).get("init_args", {})
    data = DatasetEngine(**d) if d else None

    # Heavy eval networks (FID Inception, LPIPS, the ~8 neural IQA nets)
    # are built ONCE and reused across validate() epochs — every metric
    # resets its state in epoch_end, and rebuilding meant re-jitting the
    # whole suite against the leaky remote compiler each epoch.
    _eval_cache = {}

    def evaluator_factory(eng):
        restore = eng.restore_fn()
        if etype == "ir":
            import os
            save_dir = os.path.join(root, "dumps") \
                if m.get("save_image") else None
            eval_mode = m.get("eval_mode", "FR")
            fid = None
            # FID is an FR-protocol metric: the reference builds it only
            # for FR/ALL (eval_image_restoration.py:180-187); in NR mode
            # there is no target to supply real features
            if m.get("compute_fid") and eval_mode in ("FR", "ALL"):
                if "fid" not in _eval_cache:
                    from .evalx.fid import FID
                    from .evalx.inception import make_fid_extractor
                    extractor, dim = make_fid_extractor()
                    _eval_cache["fid"] = {t: FID(extractor, dim)
                                          for t in ("hq", "lq")}
                fid = _eval_cache["fid"]
            lpips_fn = None
            if eval_mode in ("FR", "ALL"):
                # the reference FR collection always includes LPIPS(alex)
                # (eval_image_restoration.py:184)
                if "lpips" not in _eval_cache:
                    from .evalx.lpips import make_lpips
                    _eval_cache["lpips"] = make_lpips()
                lpips_fn = _eval_cache["lpips"]
            nr = None
            if eval_mode in ("NR", "ALL"):
                if "nr" not in _eval_cache:
                    from .evalx.nr_suite import build_nr_suite
                    _eval_cache["nr"] = build_nr_suite(m.get("nr_metrics"))
                nr = _eval_cache["nr"]
            return EV.ImageRestorationEvaluator(
                restore, eval_mode=eval_mode,
                need_crop=m.get("need_crop", True), save_dir=save_dir,
                lpips_fn=lpips_fn, fid=fid, nr_metrics=nr)
        if etype == "cls":
            # cls eval_mode selects the probe set (single/all/all_ft/CUB/
            # bare, eval_classification.py:36-48); monitor per :93-102.
            mode = m.get("eval_mode", "single")
            if "cls_zoo" not in _eval_cache:
                from .tasks import classifier_zoo as CZ
                _eval_cache["cls_zoo"] = CZ.build_classifier_zoo(mode)
            zoo = _eval_cache["cls_zoo"]
            monitor = {"all_ft": "r50v1_ft", "CUB": "cub_r50"}.get(
                mode, "r50v1" if zoo else None)
            return EV.ClassificationEvaluator(restore, zoo, monitor=monitor)
        if etype == "seg":
            # seg eval_mode selects the probe set (single/all/bare,
            # eval_semantic_segmentation.py:37-50); monitor rflwr101 (:102)
            mode = m.get("eval_mode", "single")
            if "seg_zoo" not in _eval_cache:
                from .tasks import seg_zoo as SZ
                _eval_cache["seg_zoo"] = SZ.build_seg_zoo(mode)
            zoo = _eval_cache["seg_zoo"]
            import os
            return EV.SemanticSegmentationEvaluator(
                restore, zoo,
                monitor="rflwr101" if "rflwr101" in zoo else None,
                save_dir=os.path.join(root, "dumps")
                if m.get("save_image") else None)
        if etype == "mtl":
            # critic nets + their jitted probes are epoch-invariant; fresh
            # lambdas per epoch would never hit jit's cache and re-pay two
            # large compiles against the leaky remote compiler every epoch
            if "mtl_probes" not in _eval_cache:
                critics = eng.build_critics()
                import jax

                from .tasks import deeplab as DLB
                from .tasks import resnet as RN
                _eval_cache["mtl_probes"] = (
                    jax.jit(lambda imgs: RN.resnet_apply(
                        critics["cls"], imgs)),
                    jax.jit(lambda imgs: DLB.deeplabv3plus_apply(
                        critics["seg"], imgs)))
            clf, seg = _eval_cache["mtl_probes"]
            if "lpips" not in _eval_cache:
                from .evalx.lpips import make_lpips
                _eval_cache["lpips"] = make_lpips()
            return EV.MultiTaskEvaluator(
                EV.ImageRestorationEvaluator(
                    restore, lpips_fn=_eval_cache["lpips"]),
                EV.ClassificationEvaluator(restore, {"r50v1": clf}),
                EV.SemanticSegmentationEvaluator(restore, {"dlv3pr50": seg}))
        if etype == "det":
            if "det_critics" not in _eval_cache:
                _eval_cache["det_critics"] = eng.build_critics()
            critics = _eval_cache["det_critics"]
            if m.get("downstream") == "fastrcnn":
                from .tasks import fasterrcnn as FRC
                det = lambda imgs: FRC.fasterrcnn_detect(  # noqa: E731
                    critics["det"], imgs, score_threshold=0.05)
            else:
                from .tasks import retinanet as RET
                det = lambda imgs: RET.retinanet_detect(  # noqa: E731
                    critics["det"], imgs, score_threshold=0.05)
            import os
            return EV.DetectionEvaluator(
                restore, det, iou_thresholds=(0.1,),
                save_dir=os.path.join(root, "dumps")
                if m.get("save_image") else None)
        raise KeyError(etype)

    return engine, trainer, data, evaluator_factory
