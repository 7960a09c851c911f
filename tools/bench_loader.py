"""Host data-pipeline throughput: corrupted-batch images/sec.

The corruption pipeline is the classic input-bound risk for this system
(SURVEY §3 hot loops: the reference runs numpy/cv2 ImageNet-C corruption in
dataloader workers, dataset_ir.py:178-230). This tool measures what OUR
loader (threaded `data.loader.DataLoader` over `IRCorruptDataset`, native
C++ kernels when built) sustains on this host, so the device-step budget
in PERF.md can be compared against input throughput directly.

Usage: python tools/bench_loader.py [--batches N] [--batch-size B]
       [--res R] [--workers W] [--n-images M]

Writes one JSON line: {"metric": "loader img/s", "value": ...}.
Synthesizes a small on-disk image set first (no dataset dependency);
by default enough images that the timed window never restarts the
epoch (an iterator restart rebuilds the worker pool and refills the
prefetch queue from cold, which would understate steady-state
throughput).
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--workers", type=int, default=4)
    ap.add_argument("--n-images", type=int, default=0,
                    help="0 = enough for warmup + timed batches in one "
                         "epoch (no mid-measurement iterator restart)")
    args = ap.parse_args()
    if args.n_images <= 0:
        args.n_images = (args.batches + 1) * args.batch_size

    import numpy as np
    from PIL import Image

    from unirestore_tpu.data.datasets import IRCorruptDataset
    from unirestore_tpu.data.loader import DataLoader
    from unirestore_tpu.data.manifest import ImageData

    tmp = tempfile.mkdtemp(prefix="loaderbench_")
    rng = np.random.default_rng(0)
    lines = []
    for i in range(args.n_images):
        arr = rng.integers(0, 256, (args.res + 64, args.res + 64, 3),
                           dtype=np.uint8)
        p = os.path.join(tmp, f"im{i}.png")
        Image.fromarray(arr).save(p)
        lines.append(f"{p} {p} None")
    manifest = os.path.join(tmp, "list.list")
    with open(manifest, "w") as f:
        f.write("\n".join(lines))

    ds = IRCorruptDataset(ImageData(manifest), resolution=args.res,
                          is_train=True, crp_mode="common")
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=True,
                        drop_last=True, num_workers=args.workers,
                        prefetch=2, seed=0)

    it = iter(loader)
    next(it)  # warm the worker pool / caches (e.g. frost textures)
    t0 = time.perf_counter()
    n = 0
    for _ in range(args.batches):
        try:
            batch = next(it)
        except StopIteration:
            it = iter(loader)
            batch = next(it)
        n += batch["lq"].shape[0]
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": f"loader img/s ({args.res}px corrupt, "
                  f"{args.workers} workers)",
        "value": round(n / dt, 2), "unit": "img/s",
        "batches": args.batches, "batch_size": args.batch_size,
    }))


if __name__ == "__main__":
    main()
