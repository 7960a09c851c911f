"""Fit the NIQE pristine model from a directory of clean images.

    python tools/fit_niqe.py /path/to/clean_images ./weights
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unirestore_tpu.evalx.niqe import fit_niqe_model  # noqa: E402


def main(src: str, dst: str = "./weights"):
    from PIL import Image

    def images():
        for f in sorted(os.listdir(src)):
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
                with Image.open(os.path.join(src, f)) as im:
                    yield np.asarray(im.convert("RGB")) / 255.0

    mu, cov = fit_niqe_model(images())
    os.makedirs(dst, exist_ok=True)
    np.savez(os.path.join(dst, "niqe_params.npz"), mu=mu, cov=cov)
    print(f"wrote niqe_params.npz (dim {mu.shape[0]})")


if __name__ == "__main__":
    main(*sys.argv[1:])
