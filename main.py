"""CLI entrypoint: fit / validate / test / predict --config <yaml>.

Mirrors the reference surface (src/main.py:17-28, LightningCLI):

    python main.py fit --config configs/train_stage1.yaml
    python main.py validate --config configs/val.yaml --trainer.logger null

Dotted overrides after the known flags are applied onto the YAML document.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser("unirestore-tpu")
    parser.add_argument("command",
                        choices=["fit", "validate", "test", "predict"])
    parser.add_argument("--config", required=True)
    parser.add_argument("--tiny", action="store_true",
                        help="scaled-down model for smoke runs")
    parser.add_argument("--platform", default=None,
                        help="force jax platform (e.g. cpu)")
    parser.add_argument("--distributed", action="store_true",
                        help="initialize the JAX multi-host runtime "
                             "(TPU pod / multi-slice; see "
                             "parallel/distributed.py)")
    args, overrides = parser.parse_known_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    # before any backend use: after this, jax.devices() is the GLOBAL
    # device list and the mesh helpers span the whole pod
    from unirestore_tpu.parallel.distributed import init_distributed
    init_distributed(force=args.distributed)

    import numpy as np

    from unirestore_tpu import config as C

    cfg = C.load_config(args.config, overrides)
    seed = cfg.get("seed_everything", 42)
    np.random.seed(seed)

    engine, trainer, data, evaluator_factory = C.build(cfg, tiny=args.tiny)

    if args.command == "fit":
        trainer.fit(engine, data, evaluator_factory)
    elif args.command in ("validate", "test"):
        trainer.validate(engine, data, evaluator_factory)
    elif args.command == "predict":
        # tiled wrapper: arbitrary-size inputs restore as fixed-shape tile
        # batches (one compile); <=tile inputs pass straight through
        restore = engine.restore_tiled_fn()
        out_dir = os.path.join(trainer.root, "predict")
        os.makedirs(out_dir, exist_ok=True)
        from PIL import Image

        loaders = data.val_dataloader()
        if not isinstance(loaders, (list, tuple)):
            loaders = [loaders]
        for loader in loaders:
            for batch in loader:
                preds = restore(batch["lq"], "ir")
                for img, name in zip(preds, batch["fname"]):
                    arr = np.clip(np.asarray(img) * 255, 0,
                                  255).astype("uint8")
                    Image.fromarray(arr).save(
                        os.path.join(out_dir, f"{name}.png"))
        print(f"[predict] wrote outputs to {out_dir}")


if __name__ == "__main__":
    main()
