"""Offline ImageNet-C-style degraded-dataset generator (multiprocess).

TPU-native counterpart of the reference's ``generate_C_dataset``
(src/data/utils.py:47-92): pre-render corrupted copies of a clean image
tree so training/eval can read LQ images instead of corrupting on the fly
(the CPU corruption pipeline — frost/glass/zoom blur — is the host-side
throughput risk at small batch; SURVEY §7 hard part (c)).

    python tools/generate_c_dataset.py <image_dir> <out_dir> \
        [--severities 3] [--corruptions common] [--resize 256] [--workers 8]

Layout: <out_dir>/<corruption>/<severity>/<original filename>. The native
C++ kernels (unirestore_tpu/data/corruption/native.py) are used when the
shared library is built.
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np
from PIL import Image

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.data.corruption import (corrupt,  # noqa: E402
                                            init_corruption_function)

_ARGS = None


def _process(paths):
    names, severities, resize, out = (_ARGS["names"], _ARGS["severities"],
                                      _ARGS["resize"], _ARGS["out"])
    done = 0
    for p in paths:
        img = Image.open(p).convert("RGB")
        if resize:
            img = img.resize((resize, resize))
        arr = np.asarray(img, np.uint8)
        base = os.path.basename(p)
        for name in names:
            if name == "clean":
                continue
            for sev in severities:
                dst = os.path.join(out, name, str(sev), base)
                if os.path.exists(dst):
                    continue
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                lq = corrupt(arr, corruption_name=name, severity=sev)
                Image.fromarray(np.asarray(lq, np.uint8)).save(dst)
                done += 1
    return done


def _init(args):
    global _ARGS
    _ARGS = args


def main():
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("image_dir")
    ap.add_argument("out_dir")
    ap.add_argument("--severities", type=int, nargs="+", default=[3])
    ap.add_argument("--corruptions", default="common",
                    help="subset name (common/validation/noise/blur/"
                         "weather/digital) or comma-separated list")
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--workers", type=int, default=8)
    a = ap.parse_args()

    if "," in a.corruptions:
        names = a.corruptions.split(",")
    else:  # subset selector returns name strings
        names = list(init_corruption_function(a.corruptions))
    paths = sorted(
        os.path.join(r, f) for r, _, fs in os.walk(a.image_dir) for f in fs
        if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp", ".webp")))
    if not paths:
        raise SystemExit(f"no images under {a.image_dir}")
    chunks = [paths[i::a.workers] for i in range(a.workers)]
    args = {"names": names, "severities": a.severities, "resize": a.resize,
            "out": a.out_dir}
    if a.workers <= 1:
        _init(args)
        total = _process(paths)
    else:
        with Pool(a.workers, initializer=_init, initargs=(args,)) as pool:
            total = sum(pool.map(_process, chunks))
    print(f"wrote {total} corrupted images under {a.out_dir}")


if __name__ == "__main__":
    main()
