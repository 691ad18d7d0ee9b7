"""Multi-chip parameter inference: domain-randomized gradient descent
over a world batch SHARDED across the device mesh.

This is the TPU-native scaling story the reference cannot tell (it has no
distributed machinery — SURVEY.md §2.3): thousands of randomized copies of
the scene run as ONE fused program with the world axis sharded over the
ICI mesh, a shared physical parameter (the ball's mass) is replicated, and
the only collective XLA inserts is the psum over per-shard gradient
contributions.  On a single device the same program runs on a 1-device
mesh; the tests run it on an 8-device virtual CPU mesh.

Scenario parity: the reference's inference demo (SURVEY.md §3.4), widened
from one trajectory to a randomized population — the estimate sharpens
with the batch because every world sees a different impact geometry.
"""
import argparse
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from lcp_physics_tpu.core import WorldState
from lcp_physics_tpu.parallel import (batched_rollout, make_batched_step,
                                      make_mesh, replicate, shard_worlds,
                                      tile_state)
from lcp_physics_tpu.physics import (Circle, ExternalForce, Rect,
                                     TotalConstraint, World)
from lcp_physics_tpu.utils import SimConfig

G = 100.0
DT = 1.0 / 60.0
STEPS = 60
TRUE_MASS = 2.0


def build_scene():
    ball = Circle([300.0, 100.0], 20.0, mass=TRUE_MASS, restitution=0.65,
                  fric_coeff=0.3)
    # A known side force makes mass identifiable (a = F/m).
    ball.add_force(ExternalForce(lambda t: jnp.array([0.0, 1.0, 0.0]),
                                 multiplier=150.0))
    floor = Rect([400.0, 300.0], [700.0, 40.0], mass=100.0,
                 restitution=0.9, fric_coeff=0.3)
    world = World([ball, floor], [TotalConstraint(floor)], dt=DT,
                  gravity=(0.0, G))
    return world.functional()


def randomized_states(state0, batch, seed=0):
    """Domain randomization: each world drops the ball from a slightly
    different pose/velocity, so each trajectory constrains the mass
    through a different contact sequence."""
    rng = np.random.default_rng(seed)
    states = tile_state(state0, batch)
    dp = np.zeros((batch,) + state0.p.shape, np.float64)
    dp[:, 0, 1] = rng.uniform(-40.0, 40.0, batch)       # ball x
    dp[:, 0, 2] = rng.uniform(-30.0, 0.0, batch)        # ball y (higher)
    dv = np.zeros((batch,) + state0.v.shape, np.float64)
    dv[:, 0, 1:3] = rng.normal(0.0, 20.0, (batch, 2))   # ball velocity
    return WorldState(p=states.p + jnp.asarray(dp, states.p.dtype),
                      v=states.v + jnp.asarray(dv, states.v.dtype),
                      t=states.t)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--lr", type=float, default=0.1)
    args = ap.parse_args(argv)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    B = (args.worlds // n_dev) * n_dev or n_dev
    print(f"mesh: {n_dev} devices, {B} worlds "
          f"({B // n_dev}/device)")

    static, true_params, state0 = build_scene()
    config = SimConfig()
    states = shard_worlds(randomized_states(state0, B), mesh)
    params_rep = replicate(true_params, mesh)

    # Ground-truth ball-position trajectories at the true mass.
    _, traj = batched_rollout(static, config, params_rep, states, DT,
                              STEPS)
    target = jax.lax.stop_gradient(traj.p[:, :, 0, 1:3])

    bstep = make_batched_step(static, config)

    @jax.jit
    @jax.value_and_grad
    def loss(log_mass):
        p = params_rep.__class__(
            **{**params_rep.__dict__,
               "mass": params_rep.mass.at[0].set(jnp.exp(log_mass))})

        def body(s, _):
            s2, _ = bstep(p, s, DT)
            return s2, s2.p[:, 0, 1:3]

        _, ball_traj = jax.lax.scan(body, states, None, length=STEPS)
        # ball_traj: (steps, worlds, xy), worlds sharded.  The mean over
        # the world axis is the psum XLA lowers onto the ICI mesh.
        return jnp.mean((ball_traj - target) ** 2)

    log_mass = jnp.log(jnp.asarray(0.6 * TRUE_MASS, target.dtype))
    opt = optax.adam(args.lr)
    opt_state = opt.init(log_mass)
    for epoch in range(args.epochs):
        val, g = loss(log_mass)
        upd, opt_state = opt.update(g, opt_state)
        log_mass = optax.apply_updates(log_mass, upd)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:3d}: loss {float(val):.5f} "
                  f"mass {float(jnp.exp(log_mass)):.4f} "
                  f"(true {TRUE_MASS})")
    return float(jnp.exp(log_mass))


if __name__ == "__main__":
    main()
