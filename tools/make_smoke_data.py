"""Generate a tiny synthetic dataset tree + smoke config for CLI dry runs.

Usage: python tools/make_smoke_data.py [out_dir] [res]
(`res`: image short side, default 96 — pass >= 576 to drive FULL-SCALE
512px training configs with the same smoke tree)
Creates out_dir/{images,lists}/... and out_dir/smoke.yaml; then:

    python main.py fit --config <out_dir>/smoke.yaml --tiny --platform cpu
"""

import json
import os
import sys

import numpy as np
from PIL import Image


def main(out="./smoke_data", res="96"):
    res = int(res)
    hw_default = (res, res + 16)
    rng = np.random.default_rng(0)
    img_dir = os.path.join(out, "images")
    os.makedirs(img_dir, exist_ok=True)

    def save_img(name, hw=None):
        hw = hw or hw_default
        p = os.path.join(img_dir, name)
        Image.fromarray((rng.uniform(size=(*hw, 3)) * 255).astype(
            np.uint8)).save(p)
        return p

    def save_mask(name, hw=None):
        hw = hw or hw_default
        p = os.path.join(img_dir, name)
        Image.fromarray(rng.integers(0, 34, size=hw).astype(np.uint8),
                        mode="L").save(p)
        return p

    lists = {}
    # IR
    rows = []
    for i in range(6):
        hq = save_img(f"ir_hq{i}.png")
        lq = save_img(f"ir_lq{i}.png")
        rows.append(f"{lq} {hq} None")
    lists["ir"] = rows
    # CLS
    lists["cls"] = [f"None {save_img(f'cls{i}.png')} {i % 5}"
                    for i in range(6)]
    # SEG (foggy 5-field rows)
    rows = []
    for i in range(4):
        fogs = [save_img(f"fog{i}_{k}.png") for k in range(3)]
        hq = save_img(f"seg{i}.png")
        mask = save_mask(f"segm{i}.png")
        rows.append(" ".join(fogs + [hq, mask]))
    lists["seg"] = rows
    # DET
    rows = []
    for i in range(4):
        hq = save_img(f"det{i}.png", hw=(120, 140))
        ann = {"object1": {"name": "person",
                           "bndbox": {"xmin": 8, "ymin": 10, "xmax": 70,
                                      "ymax": 80}}}
        annp = os.path.join(img_dir, f"det{i}.json")
        with open(annp, "w") as f:
            json.dump(ann, f)
        rows.append(f"None {hq} {annp}")
    lists["det"] = rows

    list_dir = os.path.join(out, "lists")
    os.makedirs(list_dir, exist_ok=True)
    paths = {}
    for k, rows in lists.items():
        p = os.path.join(list_dir, f"{k}.list")
        with open(p, "w") as f:
            f.write("\n".join(rows))
        paths[k] = os.path.abspath(p)

    cfg = f"""seed_everything: 42
trainer:
  max_steps: 4
  val_check_interval: 0
  log_every_n_steps: 1
  accumulate_grad_batches: 2
  limit_val_batches: 2
  logger:
    class_path: TensorBoardLogger
    init_args:
      save_dir: {out}/logs
model:
  class_path: unirestore_tpu.ir
  init_args:
    model_kwargs:
      frenc: {{train: true, ckpt_path: null, type: CFRM}}
      cnet: {{train: true, ckpt_path: null, type: scedit,
             num_inference_steps: 1}}
    optimizer_kwargs: {{opt: adamw, base_lr: 1e-4, base_bsz: 64,
                       weight_decay: 1e-2}}
    lr_scheduler_kwargs: {{sched: onecycle}}
data:
  class_path: data.DatasetEngine
  init_args:
    task: ir
    train: {{type: div2kost, resolution: {512 if res >= 576 else min(64, res)}, batch_size: 2}}
    val: {{type: val, val_list: [], batch_size: 1}}
    crp_mode: common
    num_workers: 0
    prefetch_factor: 2
    dataset_dict:
      DIVF2KOST: {{train: {paths['ir']}, val: {paths['ir']}}}
      ImageNet: {{train: {paths['cls']}, val: {paths['cls']}}}
      FoggyCityscapes: {{train: {paths['seg']}, val: {paths['seg']}}}
      Cityscapes: {{train: {paths['seg']}, val: {paths['seg']}}}
      COCO: {{train: {paths['det']}, val: {paths['det']}}}
"""
    cfg_path = os.path.join(out, "smoke.yaml")
    with open(cfg_path, "w") as f:
        f.write(cfg)
    print(f"wrote {cfg_path}")


if __name__ == "__main__":
    main(*(sys.argv[1:] or []))
