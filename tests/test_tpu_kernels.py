"""TPU-backend execution of the Pallas kernels inside shard_map.

The CPU test platform can't lower pallas_call, and a plain single-chip run
takes the direct-call path — so the pallas-inside-shard_map composition the
multi-device perf story depends on only executes via the forced 1-device
mesh in tools/tpu_shardmap_check.py. This test runs that script in a
subprocess against the ambient TPU backend (the in-process test platform is
pinned to CPU by conftest) and asserts numerical equivalence with the XLA
path. Skips cleanly when no TPU is reachable.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.tpu

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_pallas_kernels_inside_shardmap_on_tpu():
    env = dict(os.environ)
    # undo the conftest's CPU pinning for the child: the script needs the
    # real TPU backend (sitecustomize re-forces JAX_PLATFORMS=axon anyway)
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f
    )
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "tpu_shardmap_check.py")],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, f"no JSON output\nstdout: {proc.stdout}\nstderr: {proc.stderr[-2000:]}"
    result = json.loads(lines[-1])
    if result.get("error") == "NO_TPU":
        pytest.skip("no TPU backend reachable")
    assert result["ok"], f"kernel/XLA mismatch under shard_map on TPU: {result}"
