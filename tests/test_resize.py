import jax
import numpy as np
import pytest

from unirestore_tpu.ops.resize import reflect_pad_hw, resize_bicubic, resize_bilinear


@pytest.mark.parametrize("in_hw,out_hw", [((17, 23), (512, 512)),
                                          ((64, 64), (37, 41)),
                                          ((10, 10), (30, 20))])
def test_bicubic_matches_torch(in_hw, out_hw):
    torch = pytest.importorskip("torch")
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, *in_hw, 3))
    y = resize_bicubic(x, out_hw)
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2), dtype=torch.float64)
    ty = torch.nn.functional.interpolate(tx, out_hw, mode="bicubic",
                                         align_corners=False, antialias=False)
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1), atol=1e-4)


def test_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 9, 13, 2))
    y = resize_bilinear(x, (20, 7))
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2), dtype=torch.float64)
    ty = torch.nn.functional.interpolate(tx, (20, 7), mode="bilinear",
                                         align_corners=False)
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1), atol=1e-5)


def test_reflect_pad_matches_torch():
    torch = pytest.importorskip("torch")
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 8, 9, 3))
    y = reflect_pad_hw(x, 3, 5)
    tx = torch.tensor(np.asarray(x).transpose(0, 3, 1, 2))
    ty = torch.nn.functional.pad(tx, (0, 5, 0, 3), mode="reflect")
    np.testing.assert_allclose(np.asarray(y),
                               ty.numpy().transpose(0, 2, 3, 1), atol=1e-6)
