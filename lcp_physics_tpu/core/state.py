"""World state / parameter PyTrees and the static scene description.

The reference mutates per-body torch tensors inside Python objects
(``lcp_physics/physics/bodies.py`` — ``Body.p``, ``Body.v``; SURVEY.md §2.1).
The TPU-native design splits that object graph into three pieces:

* :class:`WorldState`  — the dynamic state, a small struct-of-arrays PyTree
  ``(p, v, t)`` that flows through ``step``/``scan``/``vmap``/``grad``.
* :class:`SceneParams` — every differentiable quantity (masses, inertias,
  restitutions, friction, geometry, gravity, user force parameters).
  Gradient-based parameter inference (reference demos; SURVEY.md §3.4) is
  ``jax.grad`` with respect to this PyTree.
* :class:`SceneStatic` — trace-time constants (vertex counts, pair lists,
  joint table, capacities).  Baked into the compiled step via closure.

Being PyTrees, world state and parameters are trivially serializable
(checkpoint/resume — SURVEY.md §5.4) and shardable along a leading world
axis (``lcp_physics_tpu.parallel``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import numpy as np

from lcp_physics_tpu.core.geometry import split_pairs_by_kind


@partial(jax.tree_util.register_dataclass,
         data_fields=["p", "v", "t"], meta_fields=[])
@dataclasses.dataclass
class WorldState:
    """Dynamic state. p (N, 3) = [rot, x, y] per body; v (N, 3) = [omega,
    vx, vy]; t scalar sim time.  A leading batch axis (B, N, 3) makes it a
    batch of worlds."""

    p: jax.Array
    v: jax.Array
    t: jax.Array


@partial(jax.tree_util.register_dataclass,
         data_fields=["mass", "inertia", "restitution", "fric_coeff",
                      "radius", "verts", "gravity", "force_params"],
         meta_fields=[])
@dataclasses.dataclass
class SceneParams:
    """Differentiable scene parameters (see module docstring)."""

    mass: jax.Array         # (N,)
    inertia: jax.Array      # (N,)
    restitution: jax.Array  # (N,)
    fric_coeff: jax.Array   # (N,)
    radius: jax.Array       # (N,)
    verts: jax.Array        # (N, V, 2) local-frame padded vertices
    gravity: jax.Array      # (2,) linear acceleration applied to every body
    force_params: Any       # user force-function parameters (any PyTree)


@dataclasses.dataclass(frozen=True)
class JointSpec:
    """Static description of one constraint (reference
    ``physics/constraints.py`` classes; SURVEY.md §2.1).

    kind: 'joint' (2 rows), 'fixed' (3), 'x'/'y'/'rot' (1), 'total' (3).
    body2 < 0 means the constraint anchors the body to the world.
    local1/local2: anchor offsets in each body frame (joints).
    ref: target values in the p layout [rot0, x0, y0] — for 'joint'/'fixed'
    the world anchor is ref[1:3] and ref[0] is the locked relative rotation
    ('fixed' only); for the axis constraints ref[col] is the pinned value.
    """

    kind: str
    body1: int
    body2: int = -1
    local1: Tuple[float, float] = (0.0, 0.0)
    local2: Tuple[float, float] = (0.0, 0.0)
    ref: Tuple[float, float, float] = (0.0, 0.0, 0.0)

    @property
    def rows(self) -> int:
        return {"joint": 2, "fixed": 3, "x": 1, "y": 1, "rot": 1,
                "total": 3}[self.kind]


@dataclasses.dataclass(frozen=True)
class SceneStatic:
    """Trace-time scene structure; hashable enough to live in a closure."""

    counts: tuple                 # (N,) true vertex counts (1 == circle)
    joints: Tuple[JointSpec, ...]
    c_max: int
    # (N, N) bool of collidable pairs, folded from no_contact lists +
    # jointed-pair exclusions; stored as a tuple-of-tuples for hashability.
    allowed: tuple
    # Optional user force hook: (force_params, state, t) -> (N, 3) added to
    # the gravity force.  Must be jax-traceable.
    force_fn: Optional[Callable] = None

    @property
    def n_bodies(self) -> int:
        return len(self.counts)

    @property
    def n_eq(self) -> int:
        return sum(j.rows for j in self.joints)

    def counts_np(self):
        return np.asarray(self.counts, np.int32)

    def allowed_np(self):
        return np.asarray(self.allowed, bool)

    def pair_lists(self):
        return split_pairs_by_kind(self.counts_np(), self.allowed_np())


def make_scene_static(counts, joints=(), c_max=None, no_contact=(),
                      force_fn=None, exclude_jointed=True):
    """Build a :class:`SceneStatic`.

    counts: per-body vertex counts (1 for circles).
    joints: iterable of :class:`JointSpec`.
    no_contact: iterable of (i, j) pairs to exclude from collision (the
    reference's ``Body.add_no_contact``).
    exclude_jointed: also exclude bodies linked by a joint/fixed constraint
    (matching the reference's behavior of joints adding no-contact pairs).
    """
    counts = tuple(int(c) for c in counts)
    N = len(counts)
    allowed = np.ones((N, N), bool)
    np.fill_diagonal(allowed, False)
    for i, j in no_contact:
        allowed[i, j] = allowed[j, i] = False
    joints = tuple(joints)
    if exclude_jointed:
        for js in joints:
            if js.body2 >= 0:
                allowed[js.body1, js.body2] = False
                allowed[js.body2, js.body1] = False
    if c_max is None:
        n_pairs = int(allowed[np.triu_indices(N, 1)].sum())
        c_max = min(2 * n_pairs, max(4 * N, 8))
    return SceneStatic(
        counts=counts,
        joints=joints,
        c_max=int(c_max),
        allowed=tuple(tuple(bool(x) for x in row) for row in allowed),
        force_fn=force_fn,
    )


def default_params(static: SceneStatic, verts, radius, mass=1.0,
                   restitution=0.5, fric_coeff=0.9, gravity=(0.0, 10.0),
                   inertia=None, force_params=(), dtype=None):
    """Convenience constructor filling per-body parameter arrays."""
    import jax.numpy as jnp
    from lcp_physics_tpu.utils import Defaults, polygon_inertia

    dtype = dtype or Defaults.dtype()
    N = static.n_bodies
    mass = jnp.broadcast_to(jnp.asarray(mass, dtype), (N,))
    restitution = jnp.broadcast_to(jnp.asarray(restitution, dtype), (N,))
    fric_coeff = jnp.broadcast_to(jnp.asarray(fric_coeff, dtype), (N,))
    radius = jnp.asarray(radius, dtype)
    verts = jnp.asarray(verts, dtype)
    if inertia is None:
        inertias = []
        for k in range(N):
            if static.counts[k] == 1:
                inertias.append(0.5 * mass[k] * radius[k] ** 2)
            else:
                c = static.counts[k]
                inertias.append(polygon_inertia(verts[k, :c], mass[k]))
        inertia = jnp.stack(inertias)
    else:
        inertia = jnp.broadcast_to(jnp.asarray(inertia, dtype), (N,))
    return SceneParams(mass=mass, inertia=inertia, restitution=restitution,
                       fric_coeff=fric_coeff, radius=radius, verts=verts,
                       gravity=jnp.asarray(gravity, dtype),
                       force_params=force_params)
