"""Multi-HOST (multi-process) pair-parallel axis (SURVEY §2.13's DCN
analogue; reference: evaluations/eval_solution.cpp:125-131 per-core sweep).

Spawns tools/dryrun_multihost.py: 2 OS processes (jax.distributed, gloo
CPU collectives) x 4 virtual devices, one global 8-device mesh over the
pair axis, asserting pose agreement with the single-process run. Heavy
(two fresh JAX processes + compile) — marked slow."""

import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_register_batch_agrees_with_single():
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dryrun_multihost.py")],
        capture_output=True,
        text=True,
        timeout=1200,
        env={**os.environ, "PYTHONPATH": ROOT},
        cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
    with open(os.path.join(ROOT, "MULTIHOST_r04.json")) as f:
        summary = json.load(f)
    assert summary["ok"]
    for r in summary["results"]:
        assert r["multi_vs_single_maxdiff"] < 1e-5
        assert r["devices_global"] == 8
        assert r["processes"] == 2
