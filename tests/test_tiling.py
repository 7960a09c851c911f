import numpy as np

from unirestore_tpu.ops.tiling import plan_tiles, restore_tiled


def test_plan_tiles_covers_image():
    coords = plan_tiles(700, 1200, 512, 64)
    cover = np.zeros((700, 1200), bool)
    for y, x in coords:
        assert y + 512 <= 700 and x + 512 <= 1200
        cover[y:y + 512, x:x + 512] = True
    assert cover.all()


def test_identity_restore_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(2, 700, 900, 3)).astype(np.float32)
    out = restore_tiled(lambda x, t: x, img, "ir", tile=512, overlap=64)
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_small_image_passthrough():
    calls = []

    def f(x, t):
        calls.append(x.shape)
        return x

    img = np.zeros((1, 256, 256, 3), np.float32)
    restore_tiled(f, img, "ir", tile=512)
    assert calls == [(1, 256, 256, 3)]


def test_constant_shift_blends_smoothly():
    img = np.zeros((1, 600, 600, 3), np.float32)
    out = restore_tiled(lambda x, t: x + 0.5, img, "ir", tile=512,
                        overlap=64)
    np.testing.assert_allclose(out, 0.5, atol=1e-5)
