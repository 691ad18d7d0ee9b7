"""Demos as integration tests (the reference's own test strategy,
SURVEY.md §4): each scenario builds, runs, and its gradient loop descends."""
import runpy
import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest


def load(name):
    mod = runpy.run_path(f"demos/{name}.py")
    return mod


def test_hello_world_scene_runs():
    mod = load("hello_world")
    w = mod["make_world"]()
    from lcp_physics_tpu.physics import run_world

    run_world(w, run_time=0.2)
    assert w.t >= 0.2
    # everything stays inside the walls
    for b in w.bodies:
        assert 0 <= float(b.p[1]) <= 800
        assert 0 <= float(b.p[2]) <= 600


def test_chain_scene_holds_together():
    mod = load("chain")
    w = mod["make_world"](3)
    from lcp_physics_tpu.physics import Joint, run_world
    from lcp_physics_tpu.utils import rotate

    run_world(w, run_time=0.5)
    for c in w.constraints:
        if isinstance(c, Joint) and c.body2 is not None:
            a1 = c.body1.p[1:3] + rotate(jnp.asarray(c.local1),
                                         c.body1.p[0])
            a2 = c.body2.p[1:3] + rotate(jnp.asarray(c.local2),
                                         c.body2.p[0])
            assert float(jnp.linalg.norm(a1 - a2)) < 2.0


def test_inference_gradient_descends():
    mod = load("inference")
    static, true_params, state0 = mod["build_scene"]()
    from lcp_physics_tpu.core import make_step, rollout
    from lcp_physics_tpu.utils import SimConfig

    step = make_step(static, SimConfig())

    def trajectory(params):
        _, traj = rollout(step, params, state0, mod["DT"], 40)
        return traj.p[:, 0, :]

    target = trajectory(true_params)

    def loss_fn(m):
        params = true_params.__class__(
            **{**true_params.__dict__, "mass": true_params.mass.at[0].set(m)})
        return jnp.mean((trajectory(params) - target) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    l0, g0 = vg(1.0)
    assert float(l0) > 0 and abs(float(g0)) > 0
    l1, _ = vg(1.0 - 0.1 * float(jnp.sign(g0)))
    assert float(l1) < float(l0)


def test_billiards_gradient_descends():
    mod = load("billiards")
    static, params, state0 = mod["build_scene"]()
    from lcp_physics_tpu.core import WorldState, make_step, rollout
    from lcp_physics_tpu.utils import SimConfig

    step = make_step(static, SimConfig())
    GOAL = mod["GOAL"]

    def loss_fn(cue_v):
        s = WorldState(p=state0.p, v=state0.v.at[0, 1:3].set(cue_v),
                       t=state0.t)
        final, _ = rollout(step, params, s, mod["DT"], mod["STEPS"])
        return jnp.sum((final.p[1, 1:3] - GOAL) ** 2)

    vg = jax.jit(jax.value_and_grad(loss_fn))
    v0 = jnp.array([120.0, 10.0])
    l0, g0 = vg(v0)
    assert float(jnp.linalg.norm(g0)) > 0  # cue must reach the target
    l1, _ = vg(v0 - 1e-2 * g0 / jnp.linalg.norm(g0))
    assert float(l1) < float(l0)


def test_sharded_inference_recovers_mass():
    """The sharded multi-chip inference demo (demos/sharded_inference.py)
    runs on the 8-virtual-device CPU mesh (conftest) and recovers the
    ball's mass from domain-randomized sharded trajectories — the shared-
    parameter gradient psum rides the mesh."""
    assert len(jax.devices()) == 8  # conftest provisions the mesh
    mod = load("sharded_inference")
    mass = mod["main"](["--worlds", "32", "--epochs", "50"])
    assert abs(mass - mod["TRUE_MASS"]) < 0.3
