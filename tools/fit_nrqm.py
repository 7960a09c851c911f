"""Self-calibrate the NRQM regression forests from a directory of clean
images.

    python tools/fit_nrqm.py /path/to/clean_images [./weights] [n_estimators]

For each clean image, degraded variants are synthesized with the corruption
library across severities 1..5 (restoration-relevant families: blur, noise,
compression, contrast); pseudo-labels map severity to a [0, 10] quality
score (clean=10). This preserves NRQM's ranking behavior without the
original (non-redistributable) human SR-quality labels — see
unirestore_tpu/evalx/nrqm.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.data.corruption import corrupt  # noqa: E402
from unirestore_tpu.evalx.nrqm import fit_nrqm  # noqa: E402

CORRUPTIONS = ("gaussian_blur", "defocus_blur", "gaussian_noise",
               "jpeg_compression", "pixelate", "contrast")


def build_calibration_set(clean_images, seed: int = 0):
    """-> (images, labels): clean at 10.0, severity s at 10 - 1.8*s."""
    rng = np.random.default_rng(seed)
    images, labels = [], []
    for img in clean_images:
        u8 = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        images.append(u8.astype(np.float64) / 255.0)
        labels.append(10.0)
        for sev in range(1, 6):
            name = CORRUPTIONS[rng.integers(len(CORRUPTIONS))]
            deg = corrupt(u8, sev, name)
            images.append(deg.astype(np.float64) / 255.0)
            labels.append(10.0 - 1.8 * sev)
    return images, labels


def main(src: str, dst: str = None, n_estimators: str = "100"):
    from PIL import Image

    dst = dst or os.environ.get("UNIRESTORE_WEIGHTS", "./weights")

    def clean():
        for f in sorted(os.listdir(src)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                with Image.open(os.path.join(src, f)) as im:
                    yield np.asarray(im.convert("RGB")) / 255.0

    images, labels = build_calibration_set(clean())
    model = fit_nrqm(images, labels, n_estimators=int(n_estimators))
    preds = [model.score(im) for im in images]
    rho = np.corrcoef(preds, labels)[0, 1]
    out = os.path.join(dst, "nrqm_model.npz")
    model.save(out)
    print(f"wrote {out} ({len(images)} calibration images, "
          f"train corr {rho:.3f})")


if __name__ == "__main__":
    main(*sys.argv[1:])
