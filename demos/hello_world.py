"""Hello-world demo: bouncing bodies under gravity inside a box of walls.

Scenario parity: the reference's bouncing-circles demo (BASELINE.json
config "bouncing circles under gravity"; SURVEY.md §2.1 Demos row).

Run headless:         python demos/hello_world.py
Run with a window:    python demos/hello_world.py --display
"""
import argparse
import sys

sys.path.insert(0, ".")

from lcp_physics_tpu.physics import (Circle, Rect, TotalConstraint, World,
                                     run_world)

G = 100.0  # pixels/s^2, pygame-scale world like the reference demos


def make_world():
    bodies = []
    constraints = []
    # dynamic circles
    for k, (x, y, r) in enumerate([(200, 100, 20), (300, 150, 30),
                                   (420, 80, 25), (520, 160, 18),
                                   (600, 120, 22)]):
        bodies.append(Circle([x, y], r, restitution=0.7, fric_coeff=0.3))
    # a falling box for hull contacts
    bodies.append(Rect([0.3, 360, 50], [60, 40], restitution=0.5))
    # walls: floor + sides, pinned with TotalConstraint (reference pattern)
    for pos, dims in [((400, 560), (680, 40)),   # floor
                      ((40, 280), (40, 516)),    # left wall
                      ((760, 280), (40, 516))]:  # right wall
        wall = Rect(list(pos), list(dims), mass=100.0, restitution=0.7)
        bodies.append(wall)
        constraints.append(TotalConstraint(wall))
    return World(bodies, constraints, dt=1.0 / 60.0, gravity=(0.0, G))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--display", action="store_true")
    ap.add_argument("--time", type=float, default=3.0)
    args = ap.parse_args()

    world = make_world()
    screen = None
    if args.display:
        import pygame

        pygame.init()
        screen = pygame.display.set_mode((800, 600))
        pygame.display.set_caption("lcp_physics_tpu: hello world")
    run_world(world, run_time=args.time, print_time=True, screen=screen)
    for b in world.bodies[:6]:
        print(f"body at ({float(b.p[1]):7.1f}, {float(b.p[2]):7.1f}) "
              f"v=({float(b.v[1]):6.2f}, {float(b.v[2]):6.2f})")


if __name__ == "__main__":
    main()
