"""bench.py preflight budget/retry behavior (no chip needed).

The r4 driver capture failed because the preflight gave up after two
attempts with ~2400 s of BENCH_TOTAL_BUDGET unused while the tunnel was
transiently down. These tests fault-inject a failing preflight child
(BENCH_PREFLIGHT_FAIL=1) and assert the parent (a) keeps retrying while
a full 3-mode run still fits in the remaining budget, and (b) always
exits with a machine-readable artifact recording every attempt.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run_bench(extra_env, timeout=240):
    env = dict(os.environ, BENCH_PREFLIGHT_FAIL="1", **extra_env)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env)


def _last_json(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in output: {stdout[-500:]}"
    return json.loads(lines[-1])


def test_preflight_gives_up_with_artifact_when_budget_too_small():
    # budget (30 s) is below the reserve needed for a full run, so ONE
    # failed attempt must end the run with rc 1 and a valid JSON artifact
    r = _run_bench({"BENCH_TOTAL_BUDGET": "30",
                    "BENCH_PREFLIGHT_TIMEOUT": "20"})
    assert r.returncode == 1
    art = _last_json(r.stdout)
    assert "preflight" in art["error"]
    assert art["preflight_attempts"] == 1
    assert art["preflight_elapsed_s"] >= 0
    assert art["value"] == 0.0 and art["vs_baseline"] == 0.0


def test_preflight_retries_while_full_run_still_fits():
    # with reserve 20 s and budget 90 s there is room for >= 2 attempts
    # before the give-up condition (_remaining() <= reserve) triggers
    r = _run_bench({"BENCH_TOTAL_BUDGET": "90",
                    "BENCH_PREFLIGHT_RESERVE": "20",
                    "BENCH_PREFLIGHT_TIMEOUT": "20"})
    assert r.returncode == 1
    art = _last_json(r.stdout)
    assert art["preflight_attempts"] >= 2, (
        "preflight must retry through a transient outage while the "
        f"budget allows: {art}")
    assert "preflight" in art["error"]
