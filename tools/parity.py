"""Trajectory-parity harness against the PyTorch reference.

SURVEY.md §4 item 3 / §6: per-step positions/velocities must agree with the
reference engine to <= 1e-4 on the BASELINE scenarios.  The reference mount
(/root/reference) was EMPTY during this build (see SURVEY.md provenance
note), so this harness self-detects availability:

    python tools/parity.py          # SKIPs cleanly if no reference found

When the mount is populated (or `lcp_physics` is installed), it runs the
bounce scenario through both engines in float64 and reports the max
per-step position/velocity deviation.  Until then, the analytic-invariant
suite in tests/test_step.py is the correctness anchor.
"""
import importlib.util
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "/root/reference")  # if the mount appears, prefer it


def reference_available():
    return importlib.util.find_spec("lcp_physics") is not None


def run_reference_bounce(steps, dt):
    """Reference trajectory: circle dropped on a fixed rect (float64)."""
    import torch
    from lcp_physics.physics.bodies import Circle, Rect  # noqa
    from lcp_physics.physics.constraints import TotalConstraint  # noqa
    from lcp_physics.physics.forces import ExternalForce, down_force  # noqa
    from lcp_physics.physics.world import World  # noqa

    ball = Circle([400, 100], 20, restitution=0.6)
    ball.add_force(ExternalForce(down_force, multiplier=100.0))
    floor = Rect([400, 300], [700, 40])
    world = World([ball, floor], [TotalConstraint(floor)], dt=dt)
    traj = []
    for _ in range(steps):
        world.step()
        traj.append([float(x) for x in ball.p])
    return traj


def run_ours_bounce(steps, dt):
    import jax

    jax.config.update("jax_enable_x64", True)
    from lcp_physics_tpu.physics import (Circle, ExternalForce, Rect,
                                         TotalConstraint, World, down_force)

    ball = Circle([400, 100], 20, restitution=0.6)
    ball.add_force(ExternalForce(down_force, multiplier=100.0))
    floor = Rect([400, 300], [700, 40])
    world = World([ball, floor], [TotalConstraint(floor)], dt=dt)
    traj = []
    for _ in range(steps):
        world.step()
        traj.append([float(x) for x in world.bodies[0].p])
    return traj


def main():
    if not reference_available():
        print("PARITY SKIP: reference lcp_physics not importable "
              "(/root/reference is empty — SURVEY.md provenance note). "
              "Analytic invariants in tests/test_step.py remain the anchor.")
        return 0
    steps, dt = 120, 1.0 / 60.0
    ref = run_reference_bounce(steps, dt)
    ours = run_ours_bounce(steps, dt)
    import numpy as np

    dev = np.abs(np.asarray(ref) - np.asarray(ours)).max()
    print(f"max per-step |Δp| over {steps} steps: {dev:.3e} "
          f"({'PASS' if dev <= 1e-4 else 'FAIL'} @ 1e-4)")
    return 0 if dev <= 1e-4 else 1


if __name__ == "__main__":
    raise SystemExit(main())
