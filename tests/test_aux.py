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


def test_remat_rollout_matches_plain():
    """jax.checkpoint rollouts (long-horizon BPTT memory mode) must give
    identical values and gradients."""
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.5)
    s0 = WorldState(p=jnp.array([[0., 0., -3.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    step = make_step(static)

    def final_y(vy0, remat):
        s = WorldState(p=s0.p, v=s0.v.at[0, 2].set(vy0), t=s0.t)
        f, _ = rollout(step, params, s, DT, 30, remat=remat)
        return f.p[0, 2]

    np.testing.assert_allclose(final_y(1.0, False), final_y(1.0, True),
                               atol=0)
    g0 = jax.grad(final_y)(1.0, False)
    g1 = jax.grad(final_y)(1.0, True)
    np.testing.assert_allclose(g0, g1, atol=1e-12)


def test_lcp_batch_util():
    """The reference-style nBatch broadcasting wrapper (lcp.util.batch)."""
    from lcp_physics_tpu.lcp import batch, pdipm_solve

    rng = np.random.default_rng(30)
    n, m, B = 5, 3, 4
    L = rng.standard_normal((n, n))
    Q = jnp.asarray(L @ L.T + n * np.eye(n))     # shared across batch
    p = jnp.asarray(rng.standard_normal((B, n)))  # per-instance
    G = jnp.asarray(rng.standard_normal((m, n)))
    h = jnp.asarray(G @ rng.standard_normal(n) + 1.0)
    A = jnp.zeros((0, n))
    b = jnp.zeros((0,))
    F = jnp.zeros((m, m))

    solver = batch(lambda *xs, **kw: pdipm_solve(*xs, **kw).z)
    z = solver(Q, p, G, h, A, b, F, max_iter=25, tol=1e-10)
    assert z.shape == (B, n)
    z0 = pdipm_solve(Q, p[0], G, h, A, b, F, max_iter=25, tol=1e-10).z
    np.testing.assert_allclose(z[0], z0, atol=1e-8)


def test_checkpoint_treedef_mismatch_raises():
    """Loading into a structurally different tree errors instead of
    scattering leaves by index (ADVICE r1)."""
    import pytest
    from lcp_physics_tpu.utils.checkpoint import load_pytree, save_pytree

    import tempfile, os
    tree = {"a": jnp.ones((2,)), "b": (jnp.zeros((3,)), jnp.ones(()))}
    other = {"a": jnp.ones((2,)), "c": jnp.zeros((3,))}
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck.npz")
        save_pytree(path, tree)
        back = load_pytree(path, tree)
        np.testing.assert_allclose(back["b"][0], tree["b"][0])
        with pytest.raises(ValueError, match="treedef mismatch|leaves"):
            load_pytree(path, other)


def test_defaults_engine_contact_populated():
    """Defaults.ENGINE / Defaults.CONTACT carry the reference's documented
    default classes (lazy to avoid import cycles)."""
    from lcp_physics_tpu.physics import Defaults
    from lcp_physics_tpu.physics.contacts import DiffContactHandler
    from lcp_physics_tpu.physics.engines import PdipmEngine

    assert Defaults.ENGINE is PdipmEngine
    assert Defaults.CONTACT is DiffContactHandler


def test_impulse_forces_keep_working_dtype():
    """No hardcoded f32 cast in the impulse activations (ADVICE r1)."""
    from lcp_physics_tpu.physics import hor_impulse
    t = jnp.asarray(0.05, jnp.float64)
    out = hor_impulse(t)
    assert out.dtype == jnp.float64


def test_constraint_J_matches_assembled_rows():
    """Host-side constraint.J() blocks equal the corresponding rows of the
    world's assembled Je (reference per-constraint J() parity)."""
    from lcp_physics_tpu.physics import Circle, Joint, World, XConstraint

    b1 = Circle([10.0, 0.0], rad=0.5)
    b2 = Circle([20.0, 0.0], rad=0.5)
    j = Joint(b1, b2, [15.0, 0.0])
    xc = XConstraint(b1)
    w = World([b1, b2], [j, xc])
    Je = np.asarray(w.Je())
    J1, J2 = j.J()
    np.testing.assert_allclose(np.asarray(J1), Je[0:2, 0:3], atol=1e-12)
    np.testing.assert_allclose(np.asarray(J2), Je[0:2, 3:6], atol=1e-12)
    Jx, Jx2 = xc.J()
    assert Jx2 is None
    np.testing.assert_allclose(np.asarray(Jx), Je[2:3, 0:3], atol=1e-12)


def test_parity_reference_profile_pins_semantics():
    """tools/parity.py's reference-semantics profile must construct Worlds
    with speculative contacts OFF and engine notImprovedLim=3 (the two
    deliberate departures from the reference — VERDICT r2 missing #5)."""
    import sys
    sys.path.insert(0, ".")
    from tools.parity import ours_api, scene_bounce

    api = ours_api("reference")
    w, _ = scene_bounce(api)
    assert w.speculative is False
    cfg = w.engine._config(w)
    assert cfg.solver_stall_lim == 3
    assert cfg.speculative is False

    api_d = ours_api("default")
    w2, _ = scene_bounce(api_d)
    assert w2.speculative is True
    assert w2.engine._config(w2).solver_stall_lim == 1


def test_import_does_not_initialize_jax_backend():
    """``import lcp_physics_tpu`` must not create device arrays at import
    time: backend initialization as an import side effect silently pins
    the platform before the user's jax.config.update('jax_platforms', ...)
    can run (code-review r3: a jnp default on StepDiagnostics did this)."""
    import subprocess
    import sys
    code = (
        "import lcp_physics_tpu\n"
        "import jax._src.xla_bridge as xb\n"
        "raise SystemExit(1 if xb._backends else 0)\n"
    )
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True,
                          cwd=os.path.dirname(os.path.dirname(
                              os.path.abspath(__file__))))
    assert proc.returncode == 0, (
        f"importing lcp_physics_tpu initialized a JAX backend\n"
        f"{proc.stderr[-500:]}")
