"""Minimal production-style restore server (stdlib HTTP, zero extra deps).

Serves the flagship UniRestore pipeline over HTTP:

    POST /restore?task=ir[&steps=20]   body: PNG/JPEG bytes -> PNG bytes
    GET  /healthz                      -> {"status": "ok", ...}

Arbitrary input sizes are handled by the tiled overlap-blend path (fixed
tile shape -> one compile per task); requests are serialized onto the
device through a lock, with tiles batched ``--batch-tiles`` at a time.
Cached DDIM inference modes are exposed via --cache-mode/--cache-stride/
--cache-warmup (default: exact reference semantics).

Usage:
    python tools/serve.py --port 8400                 # full-size model
    python tools/serve.py --tiny --platform cpu ...   # smoke
"""

from __future__ import annotations

import argparse
import dataclasses
import io
import json
import os
import sys
import threading

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_restore(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unirestore_tpu.models import unirestore as UR
    from unirestore_tpu.ops import tiling as TIL
    from unirestore_tpu import zoo

    tasks = tuple(args.tasks.split(","))
    cfg = (UR.tiny_config(tasks=tasks) if args.tiny
           else UR.UniRestoreConfig(use_tfa=True, tasks=tasks))
    cfg = dataclasses.replace(cfg, cache_mode=args.cache_mode,
                              cache_stride=args.cache_stride,
                              cache_warmup=args.cache_warmup)
    frozen, trainable = UR.init(jax.random.PRNGKey(0), cfg)
    frozen = zoo.load_frozen_backbone(frozen, cfg)
    if args.checkpoint:
        from unirestore_tpu.train import checkpoints as CKPT
        trainable, _ = CKPT.load_trainable(args.checkpoint, trainable)
    sched = UR.schedule(cfg)
    dt = jnp.bfloat16 if not args.tiny else jnp.float32
    frozen = jax.tree.map(lambda x: x.astype(dt), frozen)
    trainable = jax.tree.map(lambda x: x.astype(dt), trainable)

    import collections
    # bounded LRU of compiled programs: tiled requests all reach base() at
    # the fixed (batch_tiles, tile, tile) shape, and sub-tile inputs are
    # padded to %64 below, so distinct shapes stay few — the cap is a
    # backstop against pathological clients
    jits = collections.OrderedDict()
    MAX_JITS = 16

    def base(images, task, steps):
        key = (images.shape, task, steps)
        if key not in jits:
            def f(fz, tr, img, rng, task=task, steps=steps):
                return UR.restore(fz, tr, cfg, sched, img.astype(dt), task,
                                  rng, steps)
            jits[key] = jax.jit(f)
            while len(jits) > MAX_JITS:
                jits.popitem(last=False)
        jits.move_to_end(key)
        out = jits[key](frozen, trainable, jnp.asarray(images),
                        jax.random.PRNGKey(0))
        return np.asarray(out.astype(jnp.float32))

    tile = cfg.min_size

    def restore(images, task, steps=None):
        # sub-tile inputs keep exact reference semantics (resize->pad
        # inside UR.restore), so each unique small size compiles once and
        # lives in the LRU; larger inputs go through the fixed-shape tiled
        # path (no new compiles per size)
        steps = steps or args.steps
        fn = lambda im, t: base(im, t, steps)
        return TIL.restore_tiled(fn, images, task, tile=tile,
                                 overlap=args.overlap,
                                 batch_tiles=args.batch_tiles)

    return restore, cfg


def make_handler(restore, cfg, lock, stats):
    from http.server import BaseHTTPRequestHandler

    import numpy as np
    from PIL import Image

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet
            pass

        def _json(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                self._json(200, {"status": "ok", "tasks": list(cfg.tasks),
                                 "served": stats["served"],
                                 "cache_mode": cfg.cache_mode})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if not self.path.startswith("/restore"):
                self._json(404, {"error": "unknown path"})
                return
            from urllib.parse import parse_qs, urlparse

            q = parse_qs(urlparse(self.path).query)
            task = q.get("task", ["ir"])[0]
            if task not in cfg.tasks:
                self._json(400, {"error": f"unknown task {task!r}",
                                 "tasks": list(cfg.tasks)})
                return
            try:
                steps = int(q["steps"][0]) if "steps" in q else None
            except ValueError:
                self._json(400, {"error": "steps must be an integer"})
                return
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            try:
                img = Image.open(io.BytesIO(raw)).convert("RGB")
            except Exception as e:
                self._json(400, {"error": f"bad image: {e}"})
                return
            arr = np.asarray(img, np.float32)[None] / 255.0
            try:
                with lock:  # one device, serialized execution
                    out = restore(arr, task, steps=steps)[0]
            except Exception as e:  # surface model/compile failures as 500
                self._json(500, {"error": f"restore failed: {e}"})
                return
            out_img = Image.fromarray(
                np.clip(out * 255.0, 0, 255).astype(np.uint8))
            buf = io.BytesIO()
            out_img.save(buf, format="PNG")
            body = buf.getvalue()
            with stats["lock"]:
                stats["served"] += 1
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

    return Handler


def main():
    ap = argparse.ArgumentParser("unirestore-serve")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8400)
    ap.add_argument("--tasks", default="ir,cls,seg")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--cache-mode", default="none",
                    choices=["none", "encoder", "deep"])
    ap.add_argument("--cache-stride", type=int, default=5)
    ap.add_argument("--cache-warmup", type=int, default=0)
    ap.add_argument("--checkpoint", default=None,
                    help="trained adapter checkpoint (.npz)")
    ap.add_argument("--batch-tiles", type=int, default=4)
    ap.add_argument("--overlap", type=int, default=64)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    restore, cfg = build_restore(args)
    lock = threading.Lock()
    stats = {"served": 0, "lock": threading.Lock()}

    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(restore, cfg, lock, stats))
    print(f"[serve] listening on {args.host}:{args.port} "
          f"tasks={cfg.tasks} steps={args.steps} cache={cfg.cache_mode}",
          flush=True)
    server.serve_forever()


if __name__ == "__main__":
    main()
