"""Aux subsystems: checkpoint/resume, observability, divergence guards
(SURVEY.md §5 TPU-build notes)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.core import WorldState, make_step, rollout
from lcp_physics_tpu.utils import SimConfig
from lcp_physics_tpu.utils.checkpoint import (load_pytree, load_world,
                                              save_pytree, save_world)
from lcp_physics_tpu.utils.observe import (StepTimer, finite_mask,
                                           finite_or_raise, solver_stats)

from tests.test_step import DT, G, box_ground_world


def test_checkpoint_roundtrip(tmp_path):
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.5)
    s0 = WorldState(p=jnp.array([[0., 0., -3.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    step = jax.jit(make_step(static))
    mid, _ = rollout(step, params, s0, DT, 30)
    path = os.path.join(tmp_path, "ckpt.npz")
    save_world(path, mid, params)
    mid2, params2 = load_world(path, mid, params)
    np.testing.assert_array_equal(np.asarray(mid.p), np.asarray(mid2.p))
    np.testing.assert_array_equal(np.asarray(params.mass),
                                  np.asarray(params2.mass))
    # resuming from the checkpoint continues identically
    a, _ = rollout(step, params, mid, DT, 20)
    b, _ = rollout(step, params2, mid2, DT, 20)
    np.testing.assert_allclose(np.asarray(a.p), np.asarray(b.p), atol=0)


def test_checkpoint_generic_pytree(tmp_path):
    tree = {"a": jnp.arange(5.0), "b": (jnp.ones((2, 2)), jnp.asarray(3))}
    path = os.path.join(tmp_path, "tree.npz")
    save_pytree(path, tree)
    out = load_pytree(path, tree)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.arange(5.0))
    assert int(out["b"][1]) == 3


def test_solver_stats():
    static, params = box_ground_world(gravity=(0.0, G))
    s0 = WorldState(p=jnp.array([[0., 0., -2.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    sol = solver_stats(static, SimConfig(), params, s0, DT)
    assert float(sol.mu) < 1e-6
    assert int(sol.iters) <= SimConfig().max_iter


def test_finite_guards():
    s = WorldState(p=jnp.zeros((2, 3)), v=jnp.zeros((2, 3)),
                   t=jnp.zeros(()))
    assert bool(finite_mask(s))
    finite_or_raise(s)
    bad = WorldState(p=s.p.at[0, 0].set(jnp.nan), v=s.v, t=s.t)
    assert not bool(finite_mask(bad))
    try:
        finite_or_raise(bad, "test")
        raised = False
    except FloatingPointError:
        raised = True
    assert raised


def test_step_timer():
    t = StepTimer()
    t.tick(10)
    out = t.report(sim_time=1.0)
    assert "10 steps" in out and "sim/wall" in out


def test_parity_harness_skips_cleanly():
    import subprocess, sys

    r = subprocess.run([sys.executable, "tools/parity.py"],
                       capture_output=True, text=True,
                       env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert r.returncode == 0
    assert "PARITY" in r.stdout
