"""Hull-heavy integration scenarios: rotated polygon contacts through the
full engine (the narrowphase cases the unit tests cover only statically)."""
import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.physics import (Circle, Hull, Rect, TotalConstraint,
                                     World, run_world)


def test_rotated_box_settles_flat():
    """A box dropped at an angle onto the ground rotates to rest on a
    face (no residual spinning, no sinking)."""
    box = Rect([0.4, 50.0, 14.0], [4.0, 2.0], restitution=0.1,
               fric_coeff=0.8)
    ground = Rect([0.0, 50.0, 21.0], [100.0, 2.0], mass=100.0)
    w = World([box, ground], [TotalConstraint(ground)],
              gravity=(0.0, 10.0), dt=1 / 60)
    run_world(w, run_time=3.0)
    rot = float(box.p[0]) % (np.pi / 2)
    assert min(rot, np.pi / 2 - rot) < 0.05          # settled on a face
    assert abs(float(box.v[0])) < 0.1                # stopped spinning
    assert float(box.p[2]) < 20.0                    # above the ground


def test_pentagon_rolls_down_then_stops():
    """A regular pentagon on a flat floor under gravity: stays put (flat
    face down) with high friction."""
    ang = np.linspace(0, 2 * np.pi, 5, endpoint=False) + np.pi / 2
    verts = np.stack([2 * np.cos(ang), 2 * np.sin(ang)], -1)
    pent = Hull([50.0, 17.0], verts, fric_coeff=0.9, restitution=0.0)
    ground = Rect([0.0, 50.0, 21.0], [100.0, 2.0], mass=100.0)
    w = World([pent, ground], [TotalConstraint(ground)],
              gravity=(0.0, 10.0), dt=1 / 60, strict_no_penetration=False)
    run_world(w, run_time=2.0)
    assert abs(float(pent.v[1])) < 0.2 and abs(float(pent.v[0])) < 0.2
    assert float(pent.p[2]) < 20.0


def test_circle_wedged_between_hulls():
    """A circle dropped into a V made of two rotated rects wedges and
    stops (two simultaneous circle-hull contacts with friction)."""
    left = Rect([0.6, 44.0, 18.0], [12.0, 2.0], mass=50.0)
    right = Rect([-0.6, 56.0, 18.0], [12.0, 2.0], mass=50.0)
    ball = Circle([50.0, 8.0], 1.5, restitution=0.1, fric_coeff=0.4)
    w = World([ball, left, right],
              [TotalConstraint(left), TotalConstraint(right)],
              gravity=(0.0, 10.0), dt=1 / 60)
    run_world(w, run_time=3.0)
    assert abs(float(ball.v[2])) < 0.3               # came to rest
    assert 10.0 < float(ball.p[2]) < 20.0            # wedged in the V
    assert abs(float(ball.p[1]) - 50.0) < 2.0        # centered


def test_hull_hull_collision_conserves_momentum():
    """Two free squares colliding head-on in zero gravity: momentum is
    conserved exactly by the LCP impulse."""
    a = Rect([0.0, -4.0, 0.0], [2.0, 2.0], restitution=0.8, fric_coeff=0.0)
    b = Rect([0.0, 4.0, 0.0], [2.0, 2.0], restitution=0.8, fric_coeff=0.0)
    w = World([a, b], gravity=(0.0, 0.0), dt=1 / 60)
    w.set_v(jnp.array([0.0, 3.0, 0.0, 0.0, -3.0, 0.0]))
    for _ in range(120):
        w.step()
    px = float(a.v[1]) + float(b.v[1])
    np.testing.assert_allclose(px, 0.0, atol=1e-6)
    assert float(a.v[1]) < 0 < float(b.v[1])         # they bounced apart
