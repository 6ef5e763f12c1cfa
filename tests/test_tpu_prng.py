"""Hardware PRNG distribution tests (pytest -m tpu).

The test conftest pins this process to CPU before backend init, so the
check runs in a SUBPROCESS with a clean environment where jax picks up the
real TPU backend.  Skipped unless a TPU is reachable (set
MARLNAV_RUN_TPU_TESTS=1 to force the attempt, e.g. from the bench driver).

What it validates — the round-1 gap where all hardware training sampled
from an unvalidated stream — lives in scripts/check_tpu_prng.py: uniform/
Box-Muller distributions from ``pltpu.prng_random_bits``, per-block and
per-seed stream independence, and the production reset path (obstacle
redraws + noisy_ags agent noise) through the real fused kernel.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_tpu_prng.py")


def tpu_probably_available() -> bool:
    if os.environ.get("MARLNAV_RUN_TPU_TESTS"):
        return True
    # The axon remote-TPU plugin registers via sitecustomize; a latched
    # JAX_PLATFORMS naming it is the cheap signal without paying a backend
    # init in this (CPU-pinned) process.
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


@pytest.mark.tpu
@pytest.mark.skipif(not tpu_probably_available(),
                    reason="no TPU reachable (set MARLNAV_RUN_TPU_TESTS=1)")
def test_tpu_prng_distributions():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # drop the forced host-device count
    proc = subprocess.run(
        [sys.executable, SCRIPT], env=env, capture_output=True, text=True,
        timeout=1500,
    )
    lines = [ln for ln in proc.stdout.splitlines()
             if ln.startswith("{")]
    assert lines, f"no verdicts; stderr:\n{proc.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    assert summary.get("all_ok"), (
        f"failed checks {summary.get('failed')}; full output:\n"
        + proc.stdout)
    assert proc.returncode == 0
