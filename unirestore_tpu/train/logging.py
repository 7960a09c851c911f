"""Experiment logging: JSONL always, TensorBoard when tensorflow is present.

Reference counterpart: Lightning TensorBoardLogger + self.log/log_dict
(train_stage1.yaml:27-32, engine_unifie.py:158-166) and the image grids
logged at batch_idx==0 (eval_image_restoration.py:138-160).
"""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    def __init__(self, log_dir: str, name: str = "run", use_tensorboard: bool = True):
        self.dir = os.path.join(log_dir, name)
        os.makedirs(self.dir, exist_ok=True)
        self.jsonl = open(os.path.join(self.dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self.tb = tf.summary.create_file_writer(self.dir)
            except Exception:
                self.tb = None

    def log_scalars(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in scalars.items()}}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            import tensorflow as tf
            with self.tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=step)

    def log_images(self, step: int, tag: str, images):
        """images: (N, H, W, C) float [0,1]."""
        import numpy as np
        arr = np.clip(np.asarray(images), 0, 1)
        if self.tb is not None:
            import tensorflow as tf
            with self.tb.as_default():
                tf.summary.image(tag, arr, step=step,
                                 max_outputs=arr.shape[0])
        else:
            from PIL import Image
            d = os.path.join(self.dir, "images")
            os.makedirs(d, exist_ok=True)
            for i, im in enumerate(arr):
                Image.fromarray((im * 255).astype("uint8")).save(
                    os.path.join(d, f"{tag.replace('/', '_')}_{step}_{i}.png"))

    def close(self):
        self.jsonl.close()
