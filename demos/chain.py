"""Chain demo: a chain of jointed links swinging from a fixed anchor, then
settling onto the ground with friction.

Scenario parity: the reference's chain demo (BASELINE.json config "chain
demo: linked bodies with joint constraints + friction contacts").
"""
import argparse
import sys

sys.path.insert(0, ".")

from lcp_physics_tpu.physics import (Circle, Joint, Rect, TotalConstraint,
                                     World, run_world)

G = 100.0


def make_world(n_links=5):
    bodies = []
    constraints = []
    link_len = 50.0
    x0, y0 = 400.0, 100.0
    prev = None
    for k in range(n_links):
        link = Rect([x0 + link_len * (k + 0.5), y0], [link_len, 10.0],
                    mass=1.0, fric_coeff=0.6, restitution=0.2)
        bodies.append(link)
        anchor = [x0 + link_len * k, y0]
        constraints.append(Joint(link, prev, anchor))
        prev = link
    floor = Rect([400, 400], [700, 40], mass=100.0, fric_coeff=0.6)
    bodies.append(floor)
    constraints.append(TotalConstraint(floor))
    return World(bodies, constraints, dt=1.0 / 60.0, gravity=(0.0, G))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--time", type=float, default=3.0)
    ap.add_argument("--links", type=int, default=5)
    args = ap.parse_args()

    world = make_world(args.links)
    screen = None
    if args.display:
        import pygame

        pygame.init()
        screen = pygame.display.set_mode((800, 500))
        pygame.display.set_caption("lcp_physics_tpu: chain")
    run_world(world, run_time=args.time, print_time=True, screen=screen)

    # report joint integrity
    import numpy as np
    for c in world.constraints[:-1]:
        if isinstance(c, Joint) and c.body2 is not None:
            from lcp_physics_tpu.utils import rotate
            import jax.numpy as jnp
            a1 = c.body1.p[1:3] + rotate(jnp.asarray(c.local1), c.body1.p[0])
            a2 = c.body2.p[1:3] + rotate(jnp.asarray(c.local2), c.body2.p[0])
            print("joint gap:", float(jnp.linalg.norm(a1 - a2)))


if __name__ == "__main__":
    main()
