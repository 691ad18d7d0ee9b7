"""Observability: profiling traces, solver statistics, divergence guards.

The reference's entire observability story is ``print_time`` wall-clock
lines in ``run_world`` plus a ``verbose`` per-iteration residual dump in
the PDIPM (SURVEY.md §5.1, §5.5); it has no sanitizers (§5.2) beyond the
solver's not-improved early exit and the stepper's penetration backtrack
(§5.3).  TPU equivalents provided here:

* :func:`trace` — ``jax.profiler`` context writing a TensorBoard-loadable
  trace of the jitted steps (the honest replacement for print timers).
* :func:`solver_stats` — per-instance PDIPM diagnostics (iterations,
  complementarity gap, KKT residual) from the same assembled blocks the
  step solves; run it on demand rather than in the gradient path.
* :func:`finite_or_raise` / :func:`finite_mask` — NaN/divergence guards
  for rollouts; the batched stepper itself already freezes diverged
  solver instances (pdipm divergence guard), these check whole states.
* :class:`StepTimer` — steps/sec counter matching ``run_world``'s
  ``print_time`` output format.
"""
from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir="/tmp/lcp_physics_tpu_trace"):
    """Profile everything inside the context into ``logdir``."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def solver_stats(static, config, params, state, dt=1e-2):
    """One diagnostic PDIPM solve on the current configuration, returning
    the full PdipmSolution (per-world iterations, mu, residuals).

    Mirrors the reference's ``verbose`` solver dump; not differentiable and
    not part of the stepping path.
    """
    from lcp_physics_tpu.core.step import make_assemble
    from lcp_physics_tpu.lcp import lcp_solve_full

    assemble, _ = make_assemble(static, config)
    single = state.p.ndim == 2
    if single:
        blocks, _ = assemble(params, state, dt)
    else:
        blocks, _ = jax.vmap(assemble, in_axes=(None, 0, None))(
            params, state, dt)
    return lcp_solve_full(**blocks, max_iter=config.max_iter,
                          tol=config.solver_eps,
                          backend=config.lcp_backend, q_is_diag=True,
                          gamma_rows=static.c_max,
                          refine=config.solver_refine,
                          not_improved_lim=config.solver_stall_lim)


def finite_mask(state):
    """(B,) or scalar bool: world state entirely finite."""
    ok_p = jnp.all(jnp.isfinite(state.p), axis=(-2, -1))
    ok_v = jnp.all(jnp.isfinite(state.v), axis=(-2, -1))
    return ok_p & ok_v


def finite_or_raise(state, context=""):
    """Host-side assertion that a (possibly batched) state is finite."""
    ok = bool(jnp.all(finite_mask(state)))
    if not ok:
        raise FloatingPointError(
            f"non-finite world state detected {context}")
    return state


class StepTimer:
    """steps/sec + sim-time/wall-time ratio counter (the reference's
    ``print_time`` readout, minus the carriage returns)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.steps = 0

    def tick(self, n=1):
        self.steps += n

    def report(self, sim_time=None):
        wall = time.perf_counter() - self.t0
        out = f"{self.steps} steps in {wall:.3f}s " \
              f"({self.steps / max(wall, 1e-9):,.1f} steps/s)"
        if sim_time is not None:
            out += f", sim/wall = {sim_time / max(wall, 1e-9):.2f}x"
        return out
