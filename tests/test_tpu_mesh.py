"""Real-TPU shard_map checks for the fused collect/update paths
(pytest -m tpu) — see scripts/check_tpu_mesh.py.

Validates on hardware what one chip allows: the full shard_map plumbing
at mesh size 1 (collect kernel with a 2-env-block, 2-time-chunk grid
inside jax.shard_map over a real ('data',) mesh; one fused-update phase
per network under the same mesh), bitwise against the no-mesh path.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_tpu_mesh.py")


def tpu_probably_available() -> bool:
    if os.environ.get("MARLNAV_RUN_TPU_TESTS"):
        return True
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


@pytest.mark.tpu
@pytest.mark.skipif(not tpu_probably_available(),
                    reason="no TPU reachable (set MARLNAV_RUN_TPU_TESTS=1)")
def test_tpu_shardmap_paths_bitwise():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # drop the forced host-device count
    proc = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=1500,
    )
    lines = [ln for ln in proc.stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no verdicts; stderr:\n{proc.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    assert summary.get("all_ok"), (
        f"failed checks {summary.get('failed')}; full output:\n"
        + proc.stdout)
    assert summary.get("n_checks") == 3
    assert proc.returncode == 0
