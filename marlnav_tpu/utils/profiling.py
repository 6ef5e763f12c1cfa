"""Profiling and debugging hooks.

The reference has no tracing or sanitizers at all — progress is a
``print`` per step (reference models.py:112; SURVEY.md §5).  Here:

  * ``trace``        — ``jax.profiler`` trace context writing a TensorBoard-
                       loadable profile for a code region;
  * ``annotate``     — named sub-region inside a trace (TraceAnnotation);
  * ``Throughput``   — steps/s counter with ``block_until_ready`` timing;
  * ``checked_step`` — wraps a step function in ``checkify`` NaN/div guards
                       (the pure-functional analogue of a sanitizer: the
                       reference's in-place mutation hazards don't exist
                       here, numeric blowups still do).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Optional

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: ``with trace('/tmp/prof'): run()`` then inspect in
    TensorBoard / xprof."""
    with jax.profiler.trace(log_dir):
        yield


def annotate(name: str):
    """Named sub-region visible in the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class Throughput:
    """Wall-clock steps/s meter around device work.

    ``tick(n_steps, result)`` blocks on ``result`` (so device work is
    actually finished) and accumulates; ``rate`` is aggregate steps/s.
    """

    def __init__(self) -> None:
        self.steps = 0
        self.seconds = 0.0
        self._t0: Optional[float] = None

    def __enter__(self) -> "Throughput":
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc) -> None:
        self.seconds += time.perf_counter() - self._t0
        self._t0 = None

    def tick(self, n_steps: int, result=None) -> float:
        """Record ``n_steps`` finished when ``result`` is ready; returns the
        instantaneous rate."""
        if result is not None:
            jax.block_until_ready(result)
        now = time.perf_counter()
        dt = now - self._t0 if self._t0 is not None else 0.0
        self._t0 = now
        self.steps += n_steps
        self.seconds += dt
        return n_steps / dt if dt > 0 else float("inf")

    @property
    def rate(self) -> float:
        return self.steps / self.seconds if self.seconds > 0 else 0.0


def checked_step(step_fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable function with checkify float guards (NaN, div-by-0,
    OOB).  Returns ``fn`` whose output is ``(err, out)``; call
    ``err.throw()`` on host to surface failures.

    Usage::

        guarded = checked_step(env.step)
        err, (state, out) = jax.jit(guarded)(state, actions)
        err.throw()
    """
    return checkify.checkify(step_fn, errors=errors)
