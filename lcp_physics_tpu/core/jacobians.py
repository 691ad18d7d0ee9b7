"""Constraint and contact Jacobian assembly over the flattened (3N,)
generalized velocity [omega_0, vx_0, vy_0, omega_1, ...].

Parity targets: reference ``physics/constraints.py`` (per-constraint ``J()``
row blocks: anchor-velocity matching ``v + omega x r``) and the Jc/Jf/E
assembly inside ``PdipmEngine.solve_dynamics`` (``physics/engines.py``,
SURVEY.md §3.1).

The reference builds these row-by-row on Python objects; here the joint
table is static, so the equality Jacobian is a trace-time loop emitting
one fused (n_eq, 3N) matrix, and the contact Jacobians are one-hot
scatters over the padded contact buffer — fully vectorized, vmap-safe.
"""
from __future__ import annotations

import jax.numpy as jnp
import jax

from lcp_physics_tpu.core.geometry import Contacts
from lcp_physics_tpu.core.state import SceneStatic
from lcp_physics_tpu.utils import cross_2d, orthogonal_tangents, rotate


def _point_velocity_row(r):
    """Row block [d/d omega, d/d vx, d/d vy] of the world velocity of a point
    at offset r from the com: v_pt = v + omega * perp(r)."""
    # v_pt_x = vx - omega * r_y ; v_pt_y = vy + omega * r_x
    row_x = jnp.stack([-r[..., 1], jnp.ones_like(r[..., 0]),
                       jnp.zeros_like(r[..., 0])], axis=-1)
    row_y = jnp.stack([r[..., 0], jnp.zeros_like(r[..., 0]),
                       jnp.ones_like(r[..., 0])], axis=-1)
    return row_x, row_y


def assemble_Je(static: SceneStatic, p):
    """Equality (joint) Jacobian (n_eq, 3N) at configuration p (N, 3)."""
    N = static.n_bodies
    n = 3 * N
    neq = static.n_eq
    dt = p.dtype
    if neq == 0:
        return jnp.zeros((0, n), dt)

    rows = []
    for js in static.joints:
        b1 = js.body1
        if js.kind in ("joint", "fixed"):
            r1 = rotate(jnp.asarray(js.local1, dt), p[b1, 0])
            row1x, row1y = _point_velocity_row(r1)
            rx = jnp.zeros((n,), dt).at[3 * b1:3 * b1 + 3].set(row1x)
            ry = jnp.zeros((n,), dt).at[3 * b1:3 * b1 + 3].set(row1y)
            if js.body2 >= 0:
                b2 = js.body2
                r2 = rotate(jnp.asarray(js.local2, dt), p[b2, 0])
                row2x, row2y = _point_velocity_row(r2)
                rx = rx.at[3 * b2:3 * b2 + 3].set(-row2x)
                ry = ry.at[3 * b2:3 * b2 + 3].set(-row2y)
            rows += [rx, ry]
            if js.kind == "fixed":
                rr = jnp.zeros((n,), dt).at[3 * b1].set(1.0)
                if js.body2 >= 0:
                    rr = rr.at[3 * js.body2].set(-1.0)
                rows.append(rr)
        elif js.kind in ("x", "y", "rot"):
            col = {"rot": 0, "x": 1, "y": 2}[js.kind]
            rows.append(jnp.zeros((n,), dt).at[3 * b1 + col].set(1.0))
        elif js.kind == "total":
            for col in (0, 1, 2):
                rows.append(jnp.zeros((n,), dt).at[3 * b1 + col].set(1.0))
        else:
            raise ValueError(f"unknown joint kind {js.kind}")
    return jnp.stack(rows)


def constraint_position_error(static: SceneStatic, p):
    """Position-level constraint violation (n_eq,) for post-stabilization
    (reference ``PdipmEngine.post_stabilization``; SURVEY.md §2.1)."""
    dt = p.dtype
    if static.n_eq == 0:
        return jnp.zeros((0,), dt)
    errs = []
    for js in static.joints:
        b1 = js.body1
        if js.kind in ("joint", "fixed"):
            a1 = p[b1, 1:3] + rotate(jnp.asarray(js.local1, dt), p[b1, 0])
            if js.body2 >= 0:
                b2 = js.body2
                a2 = p[b2, 1:3] + rotate(jnp.asarray(js.local2, dt),
                                         p[b2, 0])
            else:
                a2 = jnp.asarray(js.ref[1:3], dt)
            err = a1 - a2
            errs += [err[0], err[1]]
            if js.kind == "fixed":
                rot2 = p[js.body2, 0] if js.body2 >= 0 else 0.0
                errs.append(p[b1, 0] - rot2 - js.ref[0])
        elif js.kind in ("x", "y", "rot"):
            col = {"rot": 0, "x": 1, "y": 2}[js.kind]
            errs.append(p[b1, col] - js.ref[col])
        elif js.kind == "total":
            for col in (0, 1, 2):
                errs.append(p[b1, col] - js.ref[col])
    return jnp.stack(errs)


def assemble_contact_jacobians(contacts: Contacts, n_bodies, fric_dirs=2):
    """Normal and friction Jacobians from a padded contact buffer.

    Returns (Jc (C, 3N), Jf (fric_dirs*C, 3N), E (fric_dirs*C, C)).

    Jc maps generalized velocity to the relative normal velocity of each
    contact (positive = separating, normal points from body b toward a).
    Jf stacks one (C, 3N) block per tangent direction; E is the matching
    cone map (ones linking each contact's friction rows to its slot).
    Masked (invalid) contact rows are zeroed here; the engine pads their h.
    """
    C = contacts.normal.shape[0]
    N = n_bodies
    mask = contacts.valid.astype(contacts.normal.dtype)

    def pair_rows(direction):
        # separation rate along `direction`: d . (v_a(pt) - v_b(pt))
        blk_a = jnp.stack([cross_2d(contacts.ra, direction),
                           direction[..., 0], direction[..., 1]], axis=-1)
        blk_b = -jnp.stack([cross_2d(contacts.rb, direction),
                            direction[..., 0], direction[..., 1]], axis=-1)
        oh_a = jax.nn.one_hot(contacts.ia, N, dtype=blk_a.dtype)
        oh_b = jax.nn.one_hot(contacts.ib, N, dtype=blk_a.dtype)
        J = (oh_a[:, :, None] * blk_a[:, None, :]
             + oh_b[:, :, None] * blk_b[:, None, :])
        return (mask[:, None, None] * J).reshape(C, 3 * N)

    Jc = pair_rows(contacts.normal)
    tangents = orthogonal_tangents(contacts.normal, fric_dirs)  # (C, fd, 2)
    Jf = jnp.concatenate(
        [pair_rows(tangents[:, d, :]) for d in range(fric_dirs)], axis=0)
    eye = jnp.eye(C, dtype=Jc.dtype)
    E = jnp.concatenate([eye] * fric_dirs, axis=0)
    return Jc, Jf, E
