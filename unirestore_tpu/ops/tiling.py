"""Tiled restore with overlap-blend for large inputs.

New capability over the reference (BASELINE.md north star): inputs larger
than the working resolution are split into fixed-size overlapping tiles,
restored as static-shape device batches (no recompiles), and re-composited
with linear feather blending. The reference instead center-crops evaluation
inputs (eval_image_restoration.py:113-136) and runs full-size forwards.
"""

from __future__ import annotations

import numpy as np


def plan_tiles(h: int, w: int, tile: int, overlap: int):
    """Tile origin grid covering (h, w) with the given overlap."""
    stride = tile - overlap
    ys = list(range(0, max(h - tile, 0) + 1, stride))
    xs = list(range(0, max(w - tile, 0) + 1, stride))
    if not ys or ys[-1] + tile < h:
        ys.append(max(h - tile, 0))
    if not xs or xs[-1] + tile < w:
        xs.append(max(w - tile, 0))
    return [(y, x) for y in ys for x in xs]


def _feather(tile: int, overlap: int) -> np.ndarray:
    """2D feathering window: linear ramps on all edges over the overlap."""
    ramp = np.ones(tile, np.float32)
    if overlap > 0:
        e = np.linspace(1.0 / (overlap + 1), 1.0, overlap, dtype=np.float32)
        ramp[:overlap] = e
        ramp[-overlap:] = e[::-1]
    return np.outer(ramp, ramp)


def restore_tiled(restore_fn, images: np.ndarray, task: str,
                  tile: int = 512, overlap: int = 64,
                  batch_tiles: int = 4) -> np.ndarray:
    """Restore (B, H, W, C) images of arbitrary size by overlap-blended
    tiles. ``restore_fn(batch_nhwc, task) -> batch_nhwc`` runs at the fixed
    tile shape (one compile).

    Images smaller than the tile pass through restore_fn directly.
    """
    b, h, w, c = images.shape
    if h <= tile and w <= tile:
        return np.asarray(restore_fn(images, task))
    if h < tile or w < tile:
        # exactly one dimension under the tile size: pad it up so every
        # tile slice has the full static (tile, tile) shape, then crop
        ph, pw = max(0, tile - h), max(0, tile - w)
        mode = "symmetric" if ph <= h and pw <= w else "edge"
        padded = np.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)),
                        mode=mode)
        out = restore_tiled(restore_fn, padded, task, tile, overlap,
                            batch_tiles)
        return out[:, :h, :w]
    # overlap must leave a positive stride; clamp rather than error so a
    # small working tile (tests / tiny configs) still tiles sensibly
    overlap = min(overlap, tile // 2)

    coords = plan_tiles(h, w, tile, overlap)
    window = _feather(tile, overlap)[..., None]
    out = np.zeros((b, h, w, c), np.float32)
    weight = np.zeros((b, h, w, 1), np.float32)

    # gather all tiles across the batch, process in fixed-size chunks
    tiles = []
    meta = []
    for bi in range(b):
        for (y, x) in coords:
            tiles.append(images[bi, y:y + tile, x:x + tile])
            meta.append((bi, y, x))

    for i in range(0, len(tiles), batch_tiles):
        chunk = tiles[i:i + batch_tiles]
        n = len(chunk)
        if n < batch_tiles:  # pad to the static batch shape
            chunk = chunk + [chunk[-1]] * (batch_tiles - n)
        restored = np.asarray(restore_fn(np.stack(chunk), task),
                              np.float32)[:n]
        for r, (bi, y, x) in zip(restored, meta[i:i + n]):
            out[bi, y:y + tile, x:x + tile] += r * window
            weight[bi, y:y + tile, x:x + tile] += window

    return out / np.maximum(weight, 1e-8)
