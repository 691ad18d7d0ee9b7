"""Billiards control demo: optimize the cue ball's initial velocity so that
the target ball ends up in the goal, differentiating through the full
contact-rich trajectory.

Scenario parity: the reference's billiards demo (BASELINE.json config
"billiards control: optimize initial cue velocity to sink target ball").
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

DT = 1.0 / 60.0
STEPS = 150
GOAL = jnp.array([600.0, 200.0])


def build_scene():
    cue = Circle([200.0, 250.0], 15.0, restitution=0.9, fric_coeff=0.1)
    target = Circle([400.0, 250.0], 15.0, restitution=0.9, fric_coeff=0.1)
    rails = []
    cons = []
    for pos, dims in [((400, 40), (650, 30)), ((400, 460), (650, 30)),
                      ((60, 250), (30, 360)), ((740, 250), (30, 360))]:
        r = Rect(list(pos), list(dims), mass=100.0, restitution=0.9)
        rails.append(r)
        cons.append(TotalConstraint(r))
    world = World([cue, target] + rails, cons, dt=DT, gravity=(0.0, 0.0))
    return world.functional()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=2.0)
    args = ap.parse_args()

    static, params, state0 = build_scene()
    step = make_step(static, SimConfig())

    def final_target_pos(cue_v):
        s = WorldState(p=state0.p,
                       v=state0.v.at[0, 1:3].set(cue_v), t=state0.t)
        final, _ = rollout(step, params, s, DT, STEPS)
        return final.p[1, 1:3]

    def loss_fn(cue_v):
        return jnp.sum((final_target_pos(cue_v) - GOAL) ** 2)

    cue_v = jnp.array([120.0, 10.0])  # initial guess: roughly toward target
    opt = optax.adam(args.lr)
    opt_state = opt.init(cue_v)
    vg = jax.jit(jax.value_and_grad(loss_fn))

    t0 = time.time()
    for epoch in range(args.epochs):
        loss, grad = vg(cue_v)
        updates, opt_state = opt.update(grad, opt_state)
        cue_v = optax.apply_updates(cue_v, updates)
        if epoch % 20 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch:4d} dist^2 {float(loss):9.2f} "
                  f"cue_v=({float(cue_v[0]):7.2f}, {float(cue_v[1]):7.2f})")
    final = final_target_pos(cue_v)
    dist = float(jnp.linalg.norm(final - GOAL))
    print(f"final target-ball position ({float(final[0]):.1f}, "
          f"{float(final[1]):.1f}), goal ({float(GOAL[0]):.0f}, "
          f"{float(GOAL[1]):.0f}), miss distance {dist:.2f} "
          f"({time.time() - t0:.1f}s)")
    print("converged:", dist < 20.0)
    return 0 if dist < 20.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
