"""Parameter inference demo: recover a body's mass and restitution by
gradient descent through the differentiable contact rollout.

Scenario parity: the reference's inference demo (BASELINE.json config
"parameter inference: recover body mass/restitution by gradient through the
LCP contact solve over a rollout"; SURVEY.md §3.4).

TPU-first twist: instead of rebuilding a World per epoch and replaying the
autograd tape (the reference's loop), the scene lowers ONCE to the
functional core; each epoch is one jitted value_and_grad of a lax.scan
rollout — and a whole batch of candidate parameters can be optimized in
parallel with vmap.
"""
import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import optax

from lcp_physics_tpu.core import WorldState, make_step, rollout
from lcp_physics_tpu.physics import Circle, Rect, TotalConstraint, World
from lcp_physics_tpu.utils import SimConfig

G = 100.0
DT = 1.0 / 60.0
STEPS = 120


def build_scene():
    from lcp_physics_tpu.physics import ExternalForce

    ball = Circle([300.0, 100.0], 20.0, mass=2.0, restitution=0.65,
                  fric_coeff=0.3)
    # A constant known-magnitude side force makes mass identifiable
    # (acceleration = F/m); gravity alone would not, since a = g for any m.
    ball.add_force(ExternalForce(lambda t: jnp.array([0.0, 1.0, 0.0]),
                                 multiplier=150.0))
    floor = Rect([400.0, 300.0], [700.0, 40.0], mass=100.0,
                 restitution=0.9, fric_coeff=0.3)
    world = World([ball, floor], [TotalConstraint(floor)], dt=DT,
                  gravity=(0.0, G))
    return world.functional()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--batch", type=int, default=0,
                    help="optimize this many random initial guesses in "
                         "parallel (vmapped multi-start — the reference "
                         "can only loop; one fused TPU program here)")
    args = ap.parse_args()
    if args.batch:
        return main_batched(args)

    static, true_params, state0 = build_scene()
    step = make_step(static, SimConfig())

    def trajectory(params):
        _, traj = rollout(step, params, state0, DT, STEPS)
        return traj.p[:, 0, :]  # ball pose over time

    target = trajectory(true_params)

    def loss_fn(guess):
        params = true_params.__class__(
            **{**true_params.__dict__,
               "mass": true_params.mass.at[0].set(guess["mass"]),
               "restitution":
                   true_params.restitution.at[0].set(guess["restitution"])})
        return jnp.mean((trajectory(params) - target) ** 2)

    guess = {"mass": jnp.asarray(1.0), "restitution": jnp.asarray(0.3)}
    opt = optax.adam(args.lr)
    opt_state = opt.init(guess)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.time()
    for epoch in range(args.epochs):
        loss, grads = vg(guess)
        updates, opt_state = opt.update(grads, opt_state)
        guess = optax.apply_updates(guess, updates)
        guess["restitution"] = jnp.clip(guess["restitution"], 0.0, 0.95)
        guess["mass"] = jnp.clip(guess["mass"], 0.1, 10.0)
        if epoch % 25 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:4d} loss {float(loss):.6f} "
                  f"mass {float(guess['mass']):.4f} (true 2.0) "
                  f"restitution {float(guess['restitution']):.4f} "
                  f"(true 0.65)")
    print(f"optimized {args.epochs} epochs x {STEPS} steps in "
          f"{time.time() - t0:.1f}s")

    ok = (abs(float(guess["mass"]) - 2.0) < 0.15
          and abs(float(guess["restitution"]) - 0.65) < 0.05)
    print("converged:", ok)
    return 0 if ok else 1


def main_batched(args):
    """Multi-start inference: vmap the WHOLE optimization objective over a
    batch of candidate parameters; every epoch is one fused program
    updating all starts at once."""
    import numpy as np

    static, true_params, state0 = build_scene()
    step = make_step(static, SimConfig())

    def trajectory(params):
        _, traj = rollout(step, params, state0, DT, STEPS)
        return traj.p[:, 0, :]

    target = trajectory(true_params)

    def loss_one(guess):
        params = true_params.__class__(
            **{**true_params.__dict__,
               "mass": true_params.mass.at[0].set(guess["mass"]),
               "restitution":
                   true_params.restitution.at[0].set(guess["restitution"])})
        return jnp.mean((trajectory(params) - target) ** 2)

    B = args.batch
    rng = np.random.default_rng(0)
    guess = {"mass": jnp.asarray(rng.uniform(0.3, 5.0, B)),
             "restitution": jnp.asarray(rng.uniform(0.05, 0.9, B))}
    opt = optax.adam(args.lr)
    opt_state = opt.init(guess)
    vg = jax.jit(jax.vmap(jax.value_and_grad(loss_one)))

    t0 = time.time()
    for epoch in range(args.epochs):
        loss, grads = vg(guess)
        updates, opt_state = opt.update(grads, opt_state)
        guess = optax.apply_updates(guess, updates)
        guess["restitution"] = jnp.clip(guess["restitution"], 0.0, 0.95)
        guess["mass"] = jnp.clip(guess["mass"], 0.1, 10.0)
        if epoch % 25 == 0 or epoch == args.epochs - 1:
            k = int(jnp.argmin(loss))
            print(f"epoch {epoch:4d} best-of-{B} loss {float(loss[k]):.6f} "
                  f"mass {float(guess['mass'][k]):.4f} "
                  f"rest {float(guess['restitution'][k]):.4f}")
    k = int(jnp.argmin(loss))
    ok = (abs(float(guess["mass"][k]) - 2.0) < 0.15
          and abs(float(guess["restitution"][k]) - 0.65) < 0.05)
    n_conv = int(jnp.sum((jnp.abs(guess["mass"] - 2.0) < 0.15)
                         & (jnp.abs(guess["restitution"] - 0.65) < 0.05)))
    print(f"{n_conv}/{B} starts converged in {time.time() - t0:.1f}s "
          f"(best: mass {float(guess['mass'][k]):.4f}, "
          f"restitution {float(guess['restitution'][k]):.4f})")
    print("converged:", ok)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
