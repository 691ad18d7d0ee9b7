"""Contact handlers (parity shims over the functional collision core).

Parity target: reference ``lcp_physics/physics/contacts.py`` —
``ContactHandler`` base, ``OdeContactHandler`` (ODE narrowphase, NOT
differentiable w.r.t. geometry), ``DiffContactHandler`` (pure-tensor
differentiable narrowphase); both fill ``world.collisions`` with
``((normal, p1, p2, penetration), b1_idx, b2_idx)`` honoring ``no_contact``
exclusions (SURVEY.md §2.1).

In the TPU build there is a single vectorized narrowphase
(``core.geometry.find_contacts``).  ``DiffContactHandler`` exposes it as-is;
``OdeContactHandler`` reproduces the reference's semantics of
*non-differentiable* contact geometry by wrapping the same kernels in
``stop_gradient`` (the reference's ODE handler blocks geometry gradients
because contacts come from a C library; gradients still flow through the
dynamics, exactly as there).
"""
from __future__ import annotations

import jax

from lcp_physics_tpu.core.geometry import find_contacts


class ContactHandler:
    diff = True

    def find(self, p, verts, radius, counts, pairs, c_max, margin=None):
        raise NotImplementedError


class DiffContactHandler(ContactHandler):
    """Differentiable contact generation (the default, as in the reference's
    gradient demos)."""

    diff = True

    def find(self, p, verts, radius, counts, pairs, c_max, margin=None):
        return find_contacts(p, verts, radius, counts, pairs, c_max,
                             margin=margin)


class OdeContactHandler(ContactHandler):
    """Contact geometry treated as data (no gradients), matching the
    reference handler backed by the ODE C library."""

    diff = False

    def find(self, p, verts, radius, counts, pairs, c_max, margin=None):
        cts = find_contacts(p, verts, radius, counts, pairs, c_max,
                            margin=margin)
        return jax.tree.map(jax.lax.stop_gradient, cts)
