"""Multi-process (multi-host proxy) distributed BA: the same 4-way
landmark-sharded program must run with jax.distributed + gloo
cross-process collectives and produce the identical replicated pose
output as the single-process run (scripts/multihost_bench.py flow,
BASELINE north star: BA at 1 host / N hosts)."""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_gloo_matches_single_process(tmp_path):
    out = str(tmp_path / "multihost.json")
    env = dict(
        os.environ,
        PYTHONPATH=REPO + ":" + os.environ.get("PYTHONPATH", ""),
        MH_M="4096", MH_ITERS="3", MH_OUT=out, MH_BA_ONLY="1",
    )
    rc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/multihost_bench.py")],
        env=env, timeout=600, capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr[-2000:]
    with open(out) as f:
        res = json.load(f)
    two = res["runs"]["2proc"]
    assert two["pose_output_matches_single_host"] is True
    assert two["ba_iters_per_s"] > 0
