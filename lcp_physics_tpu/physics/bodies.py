"""User-facing body classes mirroring the reference API.

Parity target: reference ``lcp_physics/physics/bodies.py`` — ``Body``
(fields ``p`` = [rot, x, y], ``v`` = [omega, vx, vy], ``mass``,
``ang_inertia``, ``restitution``/``eps``, ``fric_coeff``, ``forces``,
``col``; methods ``move``, ``set_p``, ``apply_forces``, ``add_force``,
``add_no_contact``, ``draw``, ``_create_M``), ``Circle``, ``Hull``,
``Rect`` (SURVEY.md §2.1).

These objects are host-side scene description + rendering only.  The math
path is the functional core; ``World`` gathers the per-body fields into
struct-of-arrays PyTrees at construction and scatters results back after
each step, so user code written against the reference's object API runs
unchanged while the computation stays fused/jitted.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.physics.utils import (Defaults, get_tensor,
                                           polygon_centroid, polygon_inertia,
                                           rotate)


class Body:
    """Abstract rigid body."""

    def __init__(self, pos, mass=1.0, restitution=Defaults.RESTITUTION,
                 fric_coeff=Defaults.FRIC_COEFF, eps=None,
                 col=(255, 0, 0), thickness=1):
        pos = np.asarray(pos, float)
        if pos.shape == (2,):
            pos = np.concatenate([[0.0], pos])
        self.p = get_tensor(pos)             # [rot, x, y]
        self.v = get_tensor(np.zeros(3))     # [omega, vx, vy]
        self.mass = float(mass)
        # the reference exposes restitution under both names
        self.restitution = float(restitution if eps is None else eps)
        self.fric_coeff = float(fric_coeff)
        self.forces = []
        self.no_contact = set()
        self.col = col
        self.thickness = thickness
        self.world = None
        self.index = None
        self.ang_inertia = self._compute_ang_inertia()

    # -- geometry description consumed by World --------------------------
    kind = "abstract"

    def _compute_ang_inertia(self):
        raise NotImplementedError

    def local_vertices(self):
        """Padded local-frame vertex list (list of (2,))."""
        raise NotImplementedError

    # -- reference-parity accessors/mutators -----------------------------
    @property
    def geom(self):
        """Lightweight geometry descriptor (the reference exposes the ODE
        geom object here; we return a dict with the same information)."""
        return {"kind": self.kind, "verts": self.local_vertices(),
                "radius": getattr(self, "rad", 0.0)}

    @property
    def eps(self):
        return self.restitution

    @property
    def pos(self):
        return self.p[1:3]

    @property
    def rot(self):
        return self.p[0]

    def set_p(self, new_p):
        self.p = get_tensor(new_p)
        if self.world is not None:
            self.world.invalidate_state()

    def set_v(self, new_v):
        self.v = get_tensor(new_v)
        if self.world is not None:
            self.world.invalidate_state()

    def move(self, dt):
        """Semi-implicit Euler position update (the solver already set v)."""
        self.set_p(self.p + dt * self.v)

    def add_force(self, force):
        self.forces.append(force)
        if self.world is not None:
            self.world.invalidate_scene()

    def apply_forces(self, t):
        """Sum of attached external forces at time t (3,)."""
        f = jnp.zeros(3, dtype=self.p.dtype)
        for force in self.forces:
            f = f + force(t)
        return f

    def add_no_contact(self, other):
        self.no_contact.add(other)
        other.no_contact.add(self)
        if self.world is not None:
            self.world.invalidate_scene()

    def _create_M(self):
        """Per-body 3x3 generalized mass diag([I, m, m]) (parity helper)."""
        return jnp.diag(jnp.asarray(
            [self.ang_inertia, self.mass, self.mass], dtype=self.p.dtype))

    def draw(self, screen, pixels_per_meter=1):
        raise NotImplementedError


class Circle(Body):
    kind = "circle"

    def __init__(self, pos, rad, mass=1.0, restitution=Defaults.RESTITUTION,
                 fric_coeff=Defaults.FRIC_COEFF, eps=None,
                 col=(255, 0, 0), thickness=1):
        self.rad = float(rad)
        super().__init__(pos, mass=mass, restitution=restitution,
                         fric_coeff=fric_coeff, eps=eps, col=col,
                         thickness=thickness)

    def _compute_ang_inertia(self):
        return 0.5 * self.mass * self.rad ** 2

    def local_vertices(self):
        return [(0.0, 0.0)]

    def draw(self, screen, pixels_per_meter=1):
        import pygame

        s = pixels_per_meter
        c = (int(float(self.p[1]) * s), int(float(self.p[2]) * s))
        pygame.draw.circle(screen, self.col, c, int(self.rad * s),
                           self.thickness)
        # orientation tick, like the reference's circle marker
        end = (int(c[0] + self.rad * s * float(jnp.cos(self.p[0]))),
               int(c[1] + self.rad * s * float(jnp.sin(self.p[0]))))
        pygame.draw.line(screen, self.col, c, end, 1)


class Hull(Body):
    """Convex polygon body.  Vertices are given CCW relative to ``pos``;
    they are re-centered on the centroid exactly like the reference Hull."""

    kind = "hull"

    def __init__(self, pos, verts, mass=1.0,
                 restitution=Defaults.RESTITUTION,
                 fric_coeff=Defaults.FRIC_COEFF, eps=None,
                 col=(255, 0, 0), thickness=1):
        verts = np.asarray(verts, float)
        assert verts.ndim == 2 and verts.shape[1] == 2 and len(verts) >= 3
        # ensure CCW ordering (positive signed area)
        area2 = np.sum(verts[:, 0] * np.roll(verts[:, 1], -1)
                       - np.roll(verts[:, 0], -1) * verts[:, 1])
        if area2 < 0:
            verts = verts[::-1].copy()
        # The SAT/clipping narrowphase assumes CONVEX polygons; a concave
        # input would produce silently wrong contacts, so reject it here
        # (cross product of consecutive edges must not change sign).
        e = np.roll(verts, -1, axis=0) - verts
        turns = e[:, 0] * np.roll(e[:, 1], -1) - e[:, 1] * np.roll(e[:, 0], -1)
        scale = max(float(np.abs(turns).max()), 1e-30)
        if np.any(turns < -1e-9 * scale):
            raise ValueError(
                "Hull vertices must describe a convex polygon "
                "(counter-clockwise); got a concave corner")
        centroid = np.asarray(polygon_centroid(jnp.asarray(verts)))
        self.verts = verts - centroid
        pos = np.array(pos, float)  # copy: never mutate the caller's array
        if pos.shape == (2,):
            pos = np.concatenate([[0.0], pos])
        pos[1:3] = pos[1:3] + centroid
        super().__init__(pos, mass=mass, restitution=restitution,
                         fric_coeff=fric_coeff, eps=eps, col=col,
                         thickness=thickness)

    def _compute_ang_inertia(self):
        return float(polygon_inertia(jnp.asarray(self.verts), self.mass))

    def local_vertices(self):
        return [tuple(v) for v in self.verts]

    def world_vertices(self):
        return rotate(jnp.asarray(self.verts, self.p.dtype),
                      self.p[0]) + self.p[1:3]

    def draw(self, screen, pixels_per_meter=1):
        import pygame

        s = pixels_per_meter
        pts = [(int(float(x) * s), int(float(y) * s))
               for x, y in np.asarray(self.world_vertices())]
        pygame.draw.polygon(screen, self.col, pts, self.thickness)


class Rect(Hull):
    """Axis-aligned-at-rest rectangle given by half... full dims (w, h)."""

    kind = "hull"

    def __init__(self, pos, dims, mass=1.0,
                 restitution=Defaults.RESTITUTION,
                 fric_coeff=Defaults.FRIC_COEFF, eps=None,
                 col=(255, 0, 0), thickness=1):
        w, h = float(dims[0]), float(dims[1])
        self.dims = (w, h)
        hw, hh = w / 2.0, h / 2.0
        verts = [(-hw, -hh), (hw, -hh), (hw, hh), (-hw, hh)]
        super().__init__(pos, verts, mass=mass, restitution=restitution,
                         fric_coeff=fric_coeff, eps=eps, col=col,
                         thickness=thickness)

    def _compute_ang_inertia(self):
        w, h = self.dims
        return self.mass * (w ** 2 + h ** 2) / 12.0
