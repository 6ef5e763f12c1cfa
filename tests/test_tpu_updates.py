"""Real-TPU numerics check for the fused PPO-update kernels
(pytest -m tpu).

The CPU suite (tests/test_fused_update.py) validates the kernels under
the Pallas INTERPRETER; production runs the Mosaic hardware lowering,
which this wrapper validates by running scripts/check_tpu_updates.py in
a subprocess with a clean environment (the test conftest pins this
process to CPU before backend init).  Covers all three actor layouts
(packed / undilated / affine) x faithful / fixed advantage pairing, the
tiled actor path, plus the critic (f32 and bf16-staged obs), against
jax.value_and_grad of the XLA losses computed on the
same TPU, with branch-robust data and leaf-norm-scaled tolerances (see
the script's docstring for why both are necessary on hardware).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "check_tpu_updates.py")


def tpu_probably_available() -> bool:
    if os.environ.get("MARLNAV_RUN_TPU_TESTS"):
        return True
    return "axon" in os.environ.get("JAX_PLATFORMS", "").lower()


@pytest.mark.tpu
@pytest.mark.skipif(not tpu_probably_available(),
                    reason="no TPU reachable (set MARLNAV_RUN_TPU_TESTS=1)")
def test_tpu_update_kernel_parity():
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
    # (3 actor layouts + critic G=1) x 2 pairings
    # + (tiled actor + tiled critic + 4 grid-decomposition checks)
    #   x 2 pairings
    assert summary.get("n_checks") == 20
    assert proc.returncode == 0
