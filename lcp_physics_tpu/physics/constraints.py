"""User-facing joint/constraint classes.

Parity target: reference ``lcp_physics/physics/constraints.py`` — ``Joint``
(2 Je rows via anchor-velocity matching), ``FixedJoint`` (3 rows),
``XConstraint``/``YConstraint``/``RotConstraint`` (1 row each),
``TotalConstraint`` (3 rows); each exposing per-body ``J()`` blocks plus
``move``/``update_pos`` anchor tracking and ``draw`` (SURVEY.md §2.1).

Here each class is a thin scene-description object that lowers to a static
:class:`lcp_physics_tpu.core.state.JointSpec`; the Jacobian rows themselves
are assembled inside the jitted step (``core/jacobians.py``), so there is no
per-step Python work and nothing to "move" — anchors are recomputed from the
state each step by construction.
"""
from __future__ import annotations

import numpy as np

from lcp_physics_tpu.core.state import JointSpec
from lcp_physics_tpu.physics.utils import rotate, get_tensor

import jax.numpy as jnp


class Constraint:
    """Base: lowers to one JointSpec given the world's body->index map."""

    num_constraints = 0

    def spec(self, index_of) -> JointSpec:
        raise NotImplementedError

    def J(self):
        """Per-body Jacobian blocks at the bodies' CURRENT poses.

        Reference parity (``physics/constraints.py``: each constraint
        object exposes ``J()``): returns ``(J1, J2)`` with ``Ji`` of shape
        (rows, 3) over [omega, vx, vy]; ``J2`` is None for world-anchored
        constraints.  Host-side convenience only — the jitted step
        assembles the same rows in ``core/jacobians.py::assemble_Je``
        (which this slices, so the two can never drift apart)."""
        from lcp_physics_tpu.core.jacobians import assemble_Je
        from lcp_physics_tpu.core.state import make_scene_static

        body2 = getattr(self, "body2", None)
        bodies = [self.body1] + ([body2] if body2 is not None else [])
        index_of = {b: i for i, b in enumerate(bodies)}
        static = make_scene_static([1] * len(bodies),
                                   joints=(self.spec(index_of),), c_max=0)
        p = jnp.stack([jnp.asarray(b.p, jnp.result_type(float))
                       for b in bodies])
        Je = assemble_Je(static, p)
        J1 = Je[:, 0:3]
        J2 = Je[:, 3:6] if body2 is not None else None
        return J1, J2

    def move(self, dt=None):
        """Reference API compatibility (no-op): the reference mutates
        per-constraint anchor caches after each integration step; here
        anchors are recomputed from the body poses inside the jitted step
        (core/jacobians.py), so there is no host-side cache to advance."""
        return None

    def update_pos(self, dt=None):
        """Reference API compatibility (no-op); see :meth:`move`."""
        return None

    def draw(self, screen, pixels_per_meter=1):
        pass


class Joint(Constraint):
    """Pin (ball) joint between two bodies, or body1 and the world, at the
    world-frame anchor ``pos``."""

    num_constraints = 2

    def __init__(self, body1, body2, pos):
        self.body1 = body1
        self.body2 = body2
        self.pos = np.asarray(pos, float)
        a1 = np.asarray(body1.p, float)
        self.local1 = tuple(_to_local(self.pos, a1))
        if body2 is not None:
            a2 = np.asarray(body2.p, float)
            self.local2 = tuple(_to_local(self.pos, a2))
            body1.add_no_contact(body2)
        else:
            self.local2 = (0.0, 0.0)

    def spec(self, index_of):
        return JointSpec(
            kind="joint", body1=index_of[self.body1],
            body2=index_of[self.body2] if self.body2 is not None else -1,
            local1=self.local1, local2=self.local2,
            ref=(0.0, float(self.pos[0]), float(self.pos[1])))

    def draw(self, screen, pixels_per_meter=1):
        import pygame

        s = pixels_per_meter
        b = self.body1
        anchor = b.p[1:3] + rotate(get_tensor(self.local1), b.p[0])
        pygame.draw.circle(screen, (0, 255, 0),
                           (int(float(anchor[0]) * s),
                            int(float(anchor[1]) * s)), 2)


class FixedJoint(Constraint):
    """Welds two bodies: pin joint + locked relative rotation (3 rows)."""

    num_constraints = 3

    def __init__(self, body1, body2, pos=None):
        if pos is None:
            pos = np.asarray(body2.p, float)[1:3]
        self.body1 = body1
        self.body2 = body2
        self.pos = np.asarray(pos, float)
        self.local1 = tuple(_to_local(self.pos, np.asarray(body1.p, float)))
        self.local2 = tuple(_to_local(self.pos, np.asarray(body2.p, float)))
        self.rel_rot = float(body1.p[0]) - float(body2.p[0])
        body1.add_no_contact(body2)

    def spec(self, index_of):
        return JointSpec(
            kind="fixed", body1=index_of[self.body1],
            body2=index_of[self.body2],
            local1=self.local1, local2=self.local2,
            ref=(self.rel_rot, float(self.pos[0]), float(self.pos[1])))


class _SingleAxisConstraint(Constraint):
    num_constraints = 1
    kind = None

    def __init__(self, body1):
        self.body1 = body1
        self.ref = (float(body1.p[0]), float(body1.p[1]), float(body1.p[2]))

    def spec(self, index_of):
        # For axis constraints core.jacobians indexes ref[col] with the p
        # layout (rot, x, y); self.ref is captured in exactly that layout.
        return JointSpec(kind=self.kind, body1=index_of[self.body1],
                         ref=self.ref)


class XConstraint(_SingleAxisConstraint):
    """Freezes the body's x coordinate at its construction-time value."""

    kind = "x"


class YConstraint(_SingleAxisConstraint):
    kind = "y"


class RotConstraint(_SingleAxisConstraint):
    kind = "rot"


class TotalConstraint(Constraint):
    """Freezes all 3 DOF (the reference's way of making static geometry)."""

    num_constraints = 3

    def __init__(self, body1):
        self.body1 = body1
        p0 = np.asarray(body1.p, float)
        self.ref = (float(p0[0]), float(p0[1]), float(p0[2]))

    def spec(self, index_of):
        # core 'total' rows pin columns (rot, x, y); ref is in p layout.
        return JointSpec(kind="total", body1=index_of[self.body1],
                         ref=self.ref)


def _to_local(world_pos, p):
    """World anchor -> body-local offset given body pose p = [rot, x, y]."""
    d = jnp.asarray(world_pos, float) - jnp.asarray(p[1:3])
    return tuple(np.asarray(rotate(d, -p[0]), float))
