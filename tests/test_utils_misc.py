"""Profiling utilities and bench harness smoke tests (CPU)."""

import json
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from marlnav_tpu.config import EnvParams, TriangleInitConfig
from marlnav_tpu.env import make_env
from marlnav_tpu.utils import Throughput, checked_step


def test_throughput_meter():
    t = Throughput()
    t.tick(0)
    x = jnp.ones((8,)) * 2
    rate = t.tick(100, x)
    assert rate > 0 and t.steps == 100 and t.rate > 0


def test_checked_step_passes_clean_env():
    env = make_env(EnvParams(num_parallel=4), TriangleInitConfig(num_parallel=4),
                   None)
    state = env.init(jax.random.PRNGKey(0))
    err, (state2, out) = jax.jit(checked_step(env.step))(
        state, jnp.zeros((4, 3, 2)))
    err.throw()  # no NaN/inf/div-by-zero in a healthy step
    assert np.isfinite(np.asarray(out.rewards)).all()


def test_checked_step_catches_nan():
    err, out = jax.jit(checked_step(lambda x: jnp.log(x)))(jnp.asarray(-1.0))
    with pytest.raises(Exception):
        err.throw()


def test_bench_measure_runs_small():
    """bench.measure_xla on a tiny config: returns positive steps/s."""
    import bench

    rate = bench.measure_xla(num_envs=8, num_steps=5)
    assert rate > 0


def test_bench_cli_emits_one_json_line(monkeypatch):
    """bench.main's stdout contract: exactly one parseable JSON line.
    (On CPU the fused-Pallas config is skipped automatically.)"""
    import bench
    import io
    import contextlib

    monkeypatch.setattr(bench, "HEADLINE", (8, 5))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench.main([])
    lines = buf.getvalue().strip().splitlines()
    assert len(lines) == 1
    rec = json.loads(lines[0])
    assert rec["metric"] == "env_steps_per_s"
    assert rec["unit"] == "steps/s"
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
