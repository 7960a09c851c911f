"""End-to-end test of the HTTP restore server (tools/serve.py)."""

import io
import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # spawns a server subprocess

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def server():
    port = _free_port()
    proc = subprocess.Popen(
        [sys.executable, os.path.join(ROOT, "tools", "serve.py"),
         "--tiny", "--platform", "cpu", "--port", str(port),
         "--steps", "2", "--tasks", "ir,cls"],
        cwd=ROOT, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, env={k: v for k, v in dict(os.environ, JAX_PLATFORMS="").items()
                if k != "XLA_FLAGS"})
    url = f"http://127.0.0.1:{port}"
    deadline = time.time() + 300
    while time.time() < deadline:
        if proc.poll() is not None:
            raise RuntimeError(f"server died:\n{proc.stdout.read()[-3000:]}")
        try:
            with urllib.request.urlopen(url + "/healthz", timeout=2) as r:
                if r.status == 200:
                    break
        except OSError:
            time.sleep(0.5)
    else:
        proc.terminate()
        raise RuntimeError("server never became healthy")
    yield url
    proc.terminate()
    proc.wait(timeout=10)


def _post_image(url, arr_u8, task="ir"):
    buf = io.BytesIO()
    Image.fromarray(arr_u8).save(buf, format="PNG")
    req = urllib.request.Request(url + f"/restore?task={task}",
                                 data=buf.getvalue(), method="POST")
    return urllib.request.urlopen(req, timeout=300)


def test_healthz(server):
    with urllib.request.urlopen(server + "/healthz", timeout=10) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert "ir" in body["tasks"]


def test_restore_roundtrip(server):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    with _post_image(server, img) as r:
        assert r.status == 200
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (64, 64)
    assert np.asarray(out).shape == (64, 64, 3)


def test_restore_large_input_tiles(server):
    # larger than the tiny tile (64): exercises the overlap-blend path
    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (96, 130, 3), dtype=np.uint8)
    with _post_image(server, img, task="cls") as r:
        assert r.status == 200
        out = Image.open(io.BytesIO(r.read()))
    assert out.size == (130, 96)


def test_unknown_task_rejected(server):
    img = np.zeros((64, 64, 3), np.uint8)
    try:
        _post_image(server, img, task="nope")
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
