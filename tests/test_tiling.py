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


def test_single_dim_over_tile_pads_and_crops():
    """Inputs where only ONE dimension exceeds the tile size must still
    restore: the short dimension is padded up so every tile has the full
    static shape, then cropped back (previously crashed broadcasting a
    partial tile against the square feather window)."""
    shapes = []

    def f(x, t):
        shapes.append(x.shape)
        return x + 0.25

    img = np.random.default_rng(0).random((1, 96, 40, 3)).astype(np.float32)
    out = restore_tiled(f, img, "ir", tile=64, overlap=16)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img + 0.25, atol=1e-5)
    assert all(s[1:3] == (64, 64) for s in shapes)  # fixed tile shapes

    wide = np.random.default_rng(1).random((1, 40, 96, 3)).astype(np.float32)
    out = restore_tiled(f, wide, "ir", tile=64, overlap=16)
    np.testing.assert_allclose(out, wide + 0.25, atol=1e-5)
