"""Fit and ship BOTH no-reference IQA artifacts from a deterministic
seeded corpus — so a fresh clone computes the full 10-metric NR protocol
(reference eval_image_restoration.py:190-203) with no hand steps:

    python tools/fit_nr_artifacts.py [./weights] [n_images] [n_estimators]

writes  weights/niqe_params.npz   (NIQE pristine MVG)
        weights/nrqm_model.npz    (NRQM forests + linear stack)
        weights/NR_PROVENANCE.md  (what these were fitted on)

The corpus is synthetic "pseudo-natural" imagery: 1/f^alpha (pink-noise)
luminance fields — the canonical natural-image amplitude spectrum — with
smooth chroma, global gradients, and a few hard-edged shapes for sharp
structure. This keeps the artifacts deterministic and redistributable. The
resulting NIQE/NRQM values are rank-consistent quality signals but NOT
numerically comparable to pyiqa's models fitted on real pristine photos /
human SR opinion scores (see PARITY.md metric table); drop-in refit with a
real clean corpus: tools/fit_niqe.py + tools/fit_nrqm.py.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fit_nrqm import build_calibration_set  # noqa: E402
from unirestore_tpu.evalx.niqe import fit_niqe_model  # noqa: E402
from unirestore_tpu.evalx.nrqm import fit_nrqm  # noqa: E402


def make_corpus(n: int = 24, size: int = 288, seed: int = 1234):
    """Deterministic [0,1] HWC float images with natural-ish statistics."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(size)[:, None]
    fx = np.fft.fftfreq(size)[None, :]
    f = np.sqrt(fy ** 2 + fx ** 2)
    f[0, 0] = 1.0
    yy, xx = np.mgrid[0:size, 0:size] / size
    out = []
    for _ in range(n):
        alpha = rng.uniform(0.9, 1.3)
        amp = f ** -alpha

        def pink():
            phase = rng.uniform(0, 2 * np.pi, (size, size))
            field = np.fft.ifft2(amp * np.exp(1j * phase)).real
            field -= field.mean()
            return field / (field.std() + 1e-9)

        luma = pink()
        # global illumination gradient + a couple of sharp-edged shapes
        g = rng.normal(size=2)
        luma = luma + 1.5 * (g[0] * yy + g[1] * xx)
        for _ in range(rng.integers(2, 5)):
            cy, cx = rng.uniform(0.15, 0.85, 2)
            r = rng.uniform(0.05, 0.2)
            mask = ((yy - cy) ** 2 + (xx - cx) ** 2) < r ** 2
            luma = luma + rng.uniform(-1.5, 1.5) * mask
        luma = (luma - luma.mean()) / (luma.std() + 1e-9)
        luma = 0.5 + 0.18 * luma
        chroma = [0.06 * pink() for _ in range(2)]
        img = np.stack([luma + chroma[0], luma,
                        luma + chroma[1]], axis=-1)
        out.append(np.clip(img, 0.0, 1.0))
    return out


def main(dst: str = "./weights", n_images: str = "24",
         n_estimators: str = "100"):
    corpus = make_corpus(int(n_images))
    os.makedirs(dst, exist_ok=True)

    mu, cov = fit_niqe_model(corpus)
    np.savez(os.path.join(dst, "niqe_params.npz"), mu=mu, cov=cov)
    print(f"wrote niqe_params.npz (dim {mu.shape[0]}, "
          f"{len(corpus)} corpus images)")

    images, labels = build_calibration_set(corpus, seed=0)
    model = fit_nrqm(images, labels, n_estimators=int(n_estimators))
    preds = [model.score(im) for im in images]
    rho = np.corrcoef(preds, labels)[0, 1]
    model.save(os.path.join(dst, "nrqm_model.npz"))
    print(f"wrote nrqm_model.npz ({len(images)} calibration images, "
          f"train corr {rho:.3f})")

    import sklearn
    with open(os.path.join(dst, "NR_PROVENANCE.md"), "w") as fh:
        fh.write(
            "# NR artifact provenance\n\n"
            "`niqe_params.npz` and `nrqm_model.npz` were fitted by\n"
            "`tools/fit_nr_artifacts.py` on its deterministic synthetic\n"
            f"pseudo-natural corpus ({len(corpus)} images, seed 1234; "
            "1/f^alpha\nluminance + smooth chroma + hard-edged shapes), "
            "NRQM calibrated on\ncorruption-severity pseudo-labels "
            f"(train corr {rho:.3f}; sklearn\n{sklearn.__version__}).\n\n"
            "These make the 10-metric NR protocol runnable out of the box\n"
            "and rank-consistent; values are NOT numerically comparable to\n"
            "pyiqa's models (real pristine photos / human opinion scores).\n"
            "Refit on a real clean corpus with tools/fit_niqe.py and\n"
            "tools/fit_nrqm.py.\n\n"
            "Format: `nrqm_model.npz` stores the fitted forests as flat\n"
            "CART node arrays (children/feature/threshold/value per tree)\n"
            "plus the linear-stack coefficients — a non-executable\n"
            "serialization loaded with `allow_pickle=False`\n"
            "(evalx/nrqm.py NumpyForest).\n")
    print("wrote NR_PROVENANCE.md")


if __name__ == "__main__":
    main(*sys.argv[1:])
