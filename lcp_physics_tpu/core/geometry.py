"""Vectorized, differentiable collision detection over padded shape arrays.

Parity target: reference ``lcp_physics/physics/contacts.py``
(``DiffContactHandler`` — pure-tensor narrowphase: circle–circle,
circle–hull, hull–hull via SAT + reference/incident edge clipping, at most 2
points per pair, differentiable normals/points/penetrations) and the ODE hash
-space broadphase the reference delegates to (SURVEY.md §2.2).

TPU-first design
----------------
The reference walks Python object pairs through the ODE C library; here every
shape is a row of fixed-shape arrays and each narrowphase case is a pure
function over ONE pair, ``vmap``-ed over a *static* pair list:

* Bodies are "rounded convex hulls": ``verts (N, V, 2)`` local-frame padded
  vertex array, ``counts (N,)`` true vertex counts (static), ``radius (N,)``.
  A circle is a 1-vertex hull with nonzero radius; a rect/hull has radius 0.
* Pair lists are split BY TYPE at trace time (counts are static), so each
  narrowphase kernel runs only on its own pairs — no runtime dispatch.
* Broadphase is a masked all-pairs AABB overlap test (N <= a few hundred
  makes N^2 trivial on TPU); it gates contact validity, never shapes.
* All branching is ``where``/``argmin``-based, so the whole pipeline is
  jit/vmap/grad-compatible; gradients flow through the selected features
  (piecewise smooth, exactly like the reference's differentiable handler).
* Output is a fixed-capacity :class:`Contacts` buffer compacted with
  ``lax.top_k`` (deepest contacts kept under overflow) — the padding scheme
  the LCP layer is built to absorb (zero rows, h = 1).

Contact normal convention: ``normal`` points FROM body ``b`` TOWARD body
``a`` (the direction that pushes ``a`` out of ``b``).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.ops.take import make_take_rows, make_take_unique_rows
from lcp_physics_tpu.utils import left_orthogonal, rotate

_TINY = 1e-12


class Contacts(NamedTuple):
    """Fixed-capacity padded contact buffer (C slots)."""

    normal: jax.Array  # (C, 2) from body b toward body a
    ra: jax.Array      # (C, 2) world-frame offset: contact point - com(a)
    rb: jax.Array      # (C, 2) world-frame offset: contact point - com(b)
    depth: jax.Array   # (C,) penetration depth (> 0 means interpenetrating)
    ia: jax.Array      # (C,) int32 body index a
    ib: jax.Array      # (C,) int32 body index b
    valid: jax.Array   # (C,) bool


def world_vertices(verts, p):
    """Local padded vertices (N, V, 2) -> world frame given p (N, 3)."""
    return rotate(verts, p[:, None, 0]) + p[:, None, 1:3]


# ---------------------------------------------------------------------------
# Single-pair narrowphase kernels (vmap over pair axis).
# ---------------------------------------------------------------------------

def circle_circle(pa, ra_, pb, rb_):
    """One circle-circle pair. Returns (normal, ra, rb, depth)."""
    d = pa - pb
    dist = jnp.sqrt(jnp.sum(d * d) + _TINY)
    n = d / dist
    depth = ra_ + rb_ - dist
    return n, -n * ra_, n * rb_, depth


def _edge_data(wv, count):
    """Edges and outward normals of a CCW padded polygon (V, 2)."""
    V = wv.shape[0]
    idx = jnp.arange(V)
    nxt = jnp.where(idx + 1 < count, idx + 1, 0)
    v2 = wv[nxt]
    e = v2 - wv
    elen = jnp.sqrt(jnp.sum(e * e, axis=-1) + _TINY)
    n_out = left_orthogonal(e) / elen[:, None]  # CCW -> outward is right side
    edge_valid = idx < count
    return v2, e, elen, n_out, edge_valid


def circle_hull(pc, rc, wv, count):
    """One circle (center pc, radius rc) vs one hull (world verts wv, true
    vertex count ``count``).  Returns (normal from hull toward circle,
    r_circle, r_hull, depth)."""
    v2, e, elen, n_out, edge_valid = _edge_data(wv, count)

    # Closest point on each (valid) edge segment to the circle center.
    to_c = pc - wv
    t = jnp.clip(jnp.sum(to_c * e, axis=-1) / (elen ** 2), 0.0, 1.0)
    cp = wv + t[:, None] * e
    dvec = pc - cp
    d = jnp.sqrt(jnp.sum(dvec * dvec, axis=-1) + _TINY)

    sd = jnp.sum(n_out * to_c, axis=-1)  # signed distance to edge lines
    inside = jnp.all(jnp.where(edge_valid, sd, -jnp.inf) <= 0)

    k_out = jnp.argmin(jnp.where(edge_valid, d, jnp.inf))
    d_out = d[k_out]
    n_from_hull = dvec[k_out] / d_out
    cp_out = cp[k_out]

    k_in = jnp.argmax(jnp.where(edge_valid, sd, -jnp.inf))
    s_in = sd[k_in]                       # <= 0 when inside
    n_in = n_out[k_in]
    cp_in = pc - n_in * s_in              # projection onto nearest face

    n = jnp.where(inside, n_in, n_from_hull)
    s = jnp.where(inside, s_in, d_out)    # signed distance center->boundary
    depth = rc - s
    cp_hull = jnp.where(inside, cp_in, cp_out)
    r_circle = -n * rc
    return n, r_circle, cp_hull, depth


def _face_separation(n_out, face_v, edge_valid, other_wv, other_count):
    """For each face of the reference hull, the minimum signed distance of
    the other hull's (valid) vertices to that face plane."""
    V_other = other_wv.shape[0]
    vert_valid = jnp.arange(V_other) < other_count
    # (Vf, Vo): distance of other vertex j to face k's plane
    d = jnp.einsum("kd,kjd->kj", n_out,
                   other_wv[None, :, :] - face_v[:, None, :])
    d = jnp.where(vert_valid[None, :], d, jnp.inf)
    sep = jnp.min(d, axis=1)
    return jnp.where(edge_valid, sep, -jnp.inf)


def _halfplane_interval(g0, gd):
    """Interval of t with g0 + t*gd >= 0 (branch-free)."""
    eps = 1e-12
    pos = gd > eps
    neg = gd < -eps
    t_cross = -g0 / jnp.where(jnp.abs(gd) > eps, gd, 1.0)
    lo = jnp.where(pos, t_cross, -jnp.inf)
    hi = jnp.where(neg, t_cross, jnp.inf)
    empty = (~pos) & (~neg) & (g0 < 0)
    lo = jnp.where(empty, jnp.inf, lo)
    return lo, hi


def hull_hull(wva, ca, pos_a, wvb, cb, pos_b, margin=0.0):
    """One hull-hull pair via SAT + reference/incident face clipping.

    Returns (normal (2,), ra (2, 2), rb (2, 2), depth (2,), point_valid (2,))
    — up to two contact points sharing one normal (the reference's
    DiffContactHandler emits the same <=2-point manifolds).  ``margin`` > 0
    also emits near-contact (speculative) points with negative depth down
    to ``-margin`` — the predictive-contact activation band."""
    _, ea, elen_a, na, eva = _edge_data(wva, ca)
    _, eb, elen_b, nb, evb = _edge_data(wvb, cb)

    sep_a_k = _face_separation(na, wva, eva, wvb, cb)
    sep_b_k = _face_separation(nb, wvb, evb, wva, ca)
    sep_a = jnp.max(sep_a_k)
    sep_b = jnp.max(sep_b_k)
    ka = jnp.argmax(sep_a_k)
    kb = jnp.argmax(sep_b_k)

    # Box2D-style preference for hull A (coherence under near-ties).
    use_b = sep_b > 0.98 * sep_a + 1e-6
    sep = jnp.where(use_b, sep_b, sep_a)

    # Reference face data.
    def gather_face(wv, count, k):
        V = wv.shape[0]
        nxt = jnp.where(k + 1 < count, k + 1, 0)
        return wv[k], wv[nxt]

    ra1, ra2 = gather_face(wva, ca, ka)
    rb1, rb2 = gather_face(wvb, cb, kb)
    ref_v1 = jnp.where(use_b, rb1, ra1)
    ref_v2 = jnp.where(use_b, rb2, ra2)
    ref_n = jnp.where(use_b, nb[kb], na[ka])

    inc_wv = jnp.where(use_b, wva, wvb)
    inc_normals = jnp.where(use_b, na, nb)
    inc_valid = jnp.where(use_b, eva, evb)
    inc_count = jnp.where(use_b, ca, cb)

    # Incident face: most anti-parallel to the reference normal.
    align = jnp.einsum("kd,d->k", inc_normals, ref_n)
    ki = jnp.argmin(jnp.where(inc_valid, align, jnp.inf))
    inc_v1, inc_v2 = gather_face(inc_wv, inc_count, ki)

    # Clip incident segment parametrically against the two side planes.
    D = inc_v2 - inc_v1
    ref_t = (ref_v2 - ref_v1)
    ref_t = ref_t / jnp.sqrt(jnp.sum(ref_t * ref_t) + _TINY)
    # keep  ref_t . (p - ref_v1) >= 0   and   -ref_t . (p - ref_v2) >= 0
    lo1, hi1 = _halfplane_interval(jnp.dot(ref_t, inc_v1 - ref_v1),
                                   jnp.dot(ref_t, D))
    lo2, hi2 = _halfplane_interval(jnp.dot(-ref_t, inc_v1 - ref_v2),
                                   jnp.dot(-ref_t, D))
    t0 = jnp.maximum(0.0, jnp.maximum(lo1, lo2))
    t1 = jnp.minimum(1.0, jnp.minimum(hi1, hi2))
    seg_ok = t0 <= t1

    pts = inc_v1[None, :] + jnp.stack([t0, t1])[:, None] * D[None, :]
    pen = -jnp.einsum("pd,d->p", pts - ref_v1[None, :], ref_n)
    pt_valid = seg_ok & (pen > -margin)

    # Surface points: clipped point lies on the incident hull; project onto
    # the reference face for the reference hull.
    pts_ref = pts + pen[:, None] * ref_n[None, :]
    # Map (reference, incident) -> (a, b).
    pts_a = jnp.where(use_b, pts, pts_ref)
    pts_b = jnp.where(use_b, pts_ref, pts)
    normal = jnp.where(use_b, ref_n, -ref_n)  # from b toward a

    ra = pts_a - pos_a[None, :]
    rb = pts_b - pos_b[None, :]
    depth = pen
    # A pair separated beyond the margin produces no points even if
    # clipping found interval overlap.
    pt_valid = pt_valid & (sep <= margin)
    return normal, ra, rb, depth, pt_valid


# ---------------------------------------------------------------------------
# Structure-of-arrays hull-hull narrowphase (TPU-first, round 3).
#
# The vmapped per-pair ``hull_hull`` above carries (V, 2) vertex arrays whose
# size-2 coordinate axis lands on the TPU's 128 vector lanes (126 idle) and
# selects reference faces with per-pair dynamic gathers — measured 73 of
# 105 ms of a 64-hull dense batched step (PERF.md round-2).  Here the PAIR
# axis rides the lanes instead: every quantity is a (P,) or (V, P) array
# with x/y split into separate arrays, the vertex loops are unrolled over
# the STATIC V, and face selection is a one-hot masked reduction over the
# (sublane) V axis — no dynamic gathers anywhere.  ``vmap`` over worlds
# prepends the batch axis, giving (B, V, P)/(B, P) layouts whose last axis
# fills the lanes.  Semantics are identical to ``hull_hull`` (same SAT +
# reference/incident clipping; tested element-for-element in
# tests/test_geometry.py).
# ---------------------------------------------------------------------------

def _soa_edges(x, y, c):
    """Edge data of padded CCW polygons in SoA form.

    x, y: (V, P) vertex coordinates; c: (P,) true counts.
    Returns (x2, y2, nx, ny, ev): next-vertex coords, unit outward normals
    and edge-validity, all (V, P).
    """
    V = x.shape[0]
    x2s, y2s, nxs, nys, evs = [], [], [], [], []
    for k in range(V):
        wrap = (k + 1) % V
        has_next = k + 1 < c                     # (P,) bool
        x2 = jnp.where(has_next, x[wrap], x[0])
        y2 = jnp.where(has_next, y[wrap], y[0])
        ex, ey = x2 - x[k], y2 - y[k]
        inv = 1.0 / jnp.sqrt(ex * ex + ey * ey + _TINY)
        # left_orthogonal(e) = (ey, -ex); CCW -> outward
        x2s.append(x2); y2s.append(y2)
        nxs.append(ey * inv); nys.append(-ex * inv)
        evs.append(k < c)
    st = lambda L: jnp.stack(L, axis=0)
    return st(x2s), st(y2s), st(nxs), st(nys), st(evs)


def _soa_face_separation(nx, ny, fx, fy, ev, ox, oy, oc):
    """Min signed distance of the other hull's valid vertices to each face.

    nx, ny, fx, fy, ev: (V, P) face normals / face base vertices / validity
    of the reference hull; ox, oy: (V, P) other-hull vertices; oc: (P,)
    other-hull counts.  Returns (V, P) separations (-inf on invalid faces).
    """
    V = ox.shape[0]
    sep = None
    for j in range(V):
        d = nx * (ox[j][None, :] - fx) + ny * (oy[j][None, :] - fy)
        d = jnp.where(j < oc, d, jnp.inf)
        sep = d if sep is None else jnp.minimum(sep, d)
    return jnp.where(ev, sep, -jnp.inf)


def _soa_onehot_pick(sel, *arrs):
    """Extract row ``sel`` (P,) from each (V, P) array via a one-hot masked
    reduction (lane-friendly; no dynamic gather)."""
    V = arrs[0].shape[0]
    onehot = jnp.arange(V)[:, None] == sel[None, :]
    return tuple(jnp.sum(jnp.where(onehot, a, 0.0), axis=0) for a in arrs)


def hull_hull_pairs(wv, counts_j, pos, ia, ib, margin_p):
    """SoA hull-hull narrowphase over a pair axis.

    wv (N, V, 2) world vertices, counts_j (N,) int, pos (N, 2) body coms;
    ia, ib (P,) body-index arrays (static numpy or traced); margin_p (P,)
    speculative activation band.  Returns, all with the pair axis LAST:
    (nx, ny) (P,), contact points (pax, pay, pbx, pby) (2, P), depth (2, P),
    valid (2, P) — the same <=2-point shared-normal manifolds as
    :func:`hull_hull`.
    """
    # Matmul-transpose takes: see the find_contacts call site (the VJP of
    # these P-long gathers is otherwise a serialized TPU scatter-add).
    take_n = make_take_rows(wv.shape[0])
    wva = take_n(wv, ia); wvb = take_n(wv, ib)    # (P, V, 2)
    pos_a = take_n(pos, ia); pos_b = take_n(pos, ib)
    ax = wva[..., 0].T; ay = wva[..., 1].T        # (V, P)
    bx = wvb[..., 0].T; by = wvb[..., 1].T
    ca = counts_j[ia]; cb = counts_j[ib]          # (P,)
    pos_ax, pos_ay = pos_a[:, 0], pos_a[:, 1]
    pos_bx, pos_by = pos_b[:, 0], pos_b[:, 1]

    ax2, ay2, nax, nay, eva = _soa_edges(ax, ay, ca)
    bx2, by2, nbx, nby, evb = _soa_edges(bx, by, cb)

    sep_a_k = _soa_face_separation(nax, nay, ax, ay, eva, bx, by, cb)
    sep_b_k = _soa_face_separation(nbx, nby, bx, by, evb, ax, ay, ca)
    sep_a = jnp.max(sep_a_k, axis=0)
    sep_b = jnp.max(sep_b_k, axis=0)
    ka = jnp.argmax(sep_a_k, axis=0)
    kb = jnp.argmax(sep_b_k, axis=0)

    # Box2D-style preference for hull A (coherence under near-ties).
    use_b = sep_b > 0.98 * sep_a + 1e-6
    sep = jnp.where(use_b, sep_b, sep_a)

    # Reference face (one-hot extraction, then a/b select).
    ra1x, ra1y, ra2x, ra2y, ranx, rany = _soa_onehot_pick(
        ka, ax, ay, ax2, ay2, nax, nay)
    rb1x, rb1y, rb2x, rb2y, rbnx, rbny = _soa_onehot_pick(
        kb, bx, by, bx2, by2, nbx, nby)
    ref_v1x = jnp.where(use_b, rb1x, ra1x)
    ref_v1y = jnp.where(use_b, rb1y, ra1y)
    ref_v2x = jnp.where(use_b, rb2x, ra2x)
    ref_v2y = jnp.where(use_b, rb2y, ra2y)
    ref_nx = jnp.where(use_b, rbnx, ranx)
    ref_ny = jnp.where(use_b, rbny, rany)

    # Incident hull = the other one; its face most anti-parallel to ref_n.
    inc_x = jnp.where(use_b, ax, bx)
    inc_y = jnp.where(use_b, ay, by)
    inc_x2 = jnp.where(use_b, ax2, bx2)
    inc_y2 = jnp.where(use_b, ay2, by2)
    align = (jnp.where(use_b, nax, nbx) * ref_nx[None, :]
             + jnp.where(use_b, nay, nby) * ref_ny[None, :])
    inc_valid = jnp.where(use_b, eva, evb)
    ki = jnp.argmin(jnp.where(inc_valid, align, jnp.inf), axis=0)
    inc_v1x, inc_v1y, inc_v2x, inc_v2y = _soa_onehot_pick(
        ki, inc_x, inc_y, inc_x2, inc_y2)

    # Clip incident segment parametrically against the two side planes.
    Dx, Dy = inc_v2x - inc_v1x, inc_v2y - inc_v1y
    rtx, rty = ref_v2x - ref_v1x, ref_v2y - ref_v1y
    rinv = 1.0 / jnp.sqrt(rtx * rtx + rty * rty + _TINY)
    rtx, rty = rtx * rinv, rty * rinv

    # _halfplane_interval is elementwise, so it serves the (P,)-lane SoA
    # layout and the AoS kernel identically (one copy of the eps/empty-
    # interval logic — the two narrowphase kernels must not diverge).
    lo1, hi1 = _halfplane_interval(rtx * (inc_v1x - ref_v1x)
                                   + rty * (inc_v1y - ref_v1y),
                                   rtx * Dx + rty * Dy)
    lo2, hi2 = _halfplane_interval(-rtx * (inc_v1x - ref_v2x)
                                   - rty * (inc_v1y - ref_v2y),
                                   -rtx * Dx - rty * Dy)
    t0 = jnp.maximum(0.0, jnp.maximum(lo1, lo2))
    t1 = jnp.minimum(1.0, jnp.minimum(hi1, hi2))
    seg_ok = t0 <= t1

    ts = jnp.stack([t0, t1], axis=0)                       # (2, P)
    ptx = inc_v1x[None, :] + ts * Dx[None, :]
    pty = inc_v1y[None, :] + ts * Dy[None, :]
    pen = -((ptx - ref_v1x[None, :]) * ref_nx[None, :]
            + (pty - ref_v1y[None, :]) * ref_ny[None, :])  # (2, P)
    pt_valid = seg_ok[None, :] & (pen > -margin_p[None, :])

    # Surface points: clipped point on the incident hull; projection onto
    # the reference face for the reference hull.
    prx = ptx + pen * ref_nx[None, :]
    pry = pty + pen * ref_ny[None, :]
    pax = jnp.where(use_b[None, :], ptx, prx)
    pay = jnp.where(use_b[None, :], pty, pry)
    pbx = jnp.where(use_b[None, :], prx, ptx)
    pby = jnp.where(use_b[None, :], pry, pty)
    nrm_x = jnp.where(use_b, ref_nx, -ref_nx)              # from b toward a
    nrm_y = jnp.where(use_b, ref_ny, -ref_ny)

    pt_valid = pt_valid & (sep <= margin_p)[None, :]
    rax = pax - pos_ax[None, :]
    ray = pay - pos_ay[None, :]
    rbx = pbx - pos_bx[None, :]
    rby = pby - pos_by[None, :]
    return (nrm_x, nrm_y, rax, ray, rbx, rby, pen, pt_valid)


def hull_hull_sat_depths(wv, counts_j, ia, ib):
    """SoA SAT penetration depths for pair lists (positive = overlap):
    the depth-only fast path ``max_penetration`` rides every step."""
    ax = wv[ia, :, 0].T; ay = wv[ia, :, 1].T
    bx = wv[ib, :, 0].T; by = wv[ib, :, 1].T
    ca = counts_j[ia]; cb = counts_j[ib]
    _, _, nax, nay, eva = _soa_edges(ax, ay, ca)
    _, _, nbx, nby, evb = _soa_edges(bx, by, cb)
    sep_a = jnp.max(_soa_face_separation(nax, nay, ax, ay, eva, bx, by, cb),
                    axis=0)
    sep_b = jnp.max(_soa_face_separation(nbx, nby, bx, by, evb, ax, ay, ca),
                    axis=0)
    return -jnp.maximum(sep_a, sep_b)


# ---------------------------------------------------------------------------
# Broadphase + full pipeline.
# ---------------------------------------------------------------------------

def aabbs(p, verts, radius, counts):
    """Axis-aligned bounding boxes (N, 2, 2): [[minx, miny], [maxx, maxy]]."""
    wv = world_vertices(verts, p)
    vert_valid = (np.arange(verts.shape[1])[None, :] < counts[:, None])
    big = jnp.where(vert_valid[:, :, None], wv, -jnp.inf)
    small = jnp.where(vert_valid[:, :, None], wv, jnp.inf)
    vmax = jnp.max(big, axis=1) + radius[:, None]
    vmin = jnp.min(small, axis=1) - radius[:, None]
    return jnp.stack([vmin, vmax], axis=1)


def aabb_overlap(boxes, ia, ib):
    """Pairwise AABB overlap for index lists ia, ib -> bool (P,)."""
    lo_a, hi_a = boxes[ia, 0], boxes[ia, 1]
    lo_b, hi_b = boxes[ib, 0], boxes[ib, 1]
    return jnp.all((lo_a <= hi_b) & (lo_b <= hi_a), axis=-1)


def split_pairs_by_kind(counts, allowed=None):
    """Static (trace-time) pair enumeration split by narrowphase kernel.

    counts: host numpy (N,) true vertex counts (1 == circle).
    allowed: optional host numpy (N, N) bool of collidable pairs (the
    reference's ``no_contact`` exclusion lists, plus inactive-body masking).
    Returns dict of (ia, ib) numpy index arrays for 'cc', 'ch', 'hh'
    ('ch' lists the circle first).
    """
    counts = np.asarray(counts)
    N = counts.shape[0]
    iu, ju = np.triu_indices(N, k=1)
    if allowed is not None:
        keep = np.asarray(allowed)[iu, ju]
        iu, ju = iu[keep], ju[keep]
    is_c = counts == 1
    cc = is_c[iu] & is_c[ju]
    hh = (~is_c[iu]) & (~is_c[ju])
    ch = is_c[iu] & (~is_c[ju])
    hc = (~is_c[iu]) & is_c[ju]
    pairs = {
        "cc": (iu[cc], ju[cc]),
        # circle listed first; remember the original (a=lower index) order
        # so the caller can emit consistent (ia, ib) bodies.
        "ch": (np.concatenate([iu[ch], ju[hc]]),
               np.concatenate([ju[ch], iu[hc]])),
        "hh": (iu[hh], ju[hh]),
    }
    return pairs


def aabb_overlap_depth(boxes, ia, ib):
    """Smallest per-axis AABB overlap extent for index lists (P,): > 0 iff
    the boxes overlap, and a useful 'how much' score for pair budgeting."""
    lo_a, hi_a = boxes[ia, 0], boxes[ia, 1]
    lo_b, hi_b = boxes[ib, 0], boxes[ib, 1]
    ext = jnp.minimum(hi_a, hi_b) - jnp.maximum(lo_a, lo_b)
    return jnp.min(ext, axis=-1)


def any_aabb_overlap(p, verts, radius, counts, pairs, margin=None):
    """Scalar bool: does ANY allowed pair's (margin-inflated) AABB
    overlap?  Conservative contact predicate: narrowphase validity always
    requires AABB overlap (see find_contacts), so False here proves the
    world is contact-free — including speculative activations — without
    running any narrowphase kernel or compaction.  O(N·V + P) elementwise."""
    boxes = aabbs(p, verts, radius, jnp.asarray(np.asarray(counts)))
    if margin is not None:
        boxes = boxes + jnp.stack([-margin, margin], axis=1)[:, :, None]
    hit = jnp.zeros((), bool)
    for key in ("cc", "ch", "hh"):
        ia, ib = pairs[key]
        if len(ia):
            hit = hit | jnp.any(aabb_overlap(boxes, ia, ib))
    return hit


def find_contacts(p, verts, radius, counts, pairs, c_max, margin=None,
                  hull_budget=0):
    """Full collision pipeline for one world.

    p (N, 3) [rot, x, y]; verts (N, V, 2) local; radius (N,);
    counts: host numpy (N,) static vertex counts;
    pairs: output of :func:`split_pairs_by_kind` (static);
    c_max: static contact capacity of the output buffer;
    margin: optional per-body (N,) speculative-activation band — a pair is
    emitted while separated by up to ``margin[a] + margin[b]`` (negative
    depth).  None keeps the strict overlap-only behavior (depth > 0).
    hull_budget: if > 0 and the static hull-hull pair list is longer, only
    the ``hull_budget`` pairs with the largest AABB-overlap extent reach
    the (expensive) SAT/clipping narrowphase — on a touching 64-hull grid
    only ~200 of 2016 statically-possible pairs overlap at all
    (PERF.md round-2).  Budget selection is stop-gradient (like the top-k
    compaction below); pairs whose AABBs do not overlap never produce
    contacts on either path, so a budget >= the true overlap count is
    EXACT.

    Returns a :class:`Contacts` buffer with exactly ``c_max`` slots, deepest
    contacts first, invalid slots masked.
    """
    dt = p.dtype
    pos = p[:, 1:3]
    wv = world_vertices(verts, p)
    counts_j = jnp.asarray(np.asarray(counts))
    boxes = aabbs(p, verts, radius, counts_j)
    if margin is not None:
        boxes = boxes + jnp.stack([-margin, margin], axis=1)[:, :, None]

    def pair_margin(ia, ib):
        if margin is None:
            return 0.0
        return margin[jnp.asarray(ia)] + margin[jnp.asarray(ib)]

    outs = []  # tuples of (normal, ra, rb, depth, ia, ib, valid), flat lists

    # Pair-input gathers ride the matmul-transpose take: their VJP is a
    # scatter-add over P≈2000 indices, which serializes on TPU and was
    # 16.5 ms of the dense flagship's 21 ms/step backward (PERF.md
    # round-5 backward roofline; tools/asm_vjp_probe.py).  The pair lists
    # are static, so the one-hot transpose constant-folds.
    take_n = make_take_rows(p.shape[0])

    cc_i, cc_j = pairs["cc"]
    if len(cc_i):
        n, ra, rb, d = jax.vmap(circle_circle)(
            take_n(pos, cc_i), take_n(radius, cc_i),
            take_n(pos, cc_j), take_n(radius, cc_j))
        ok = aabb_overlap(boxes, cc_i, cc_j) & (d > -pair_margin(cc_i, cc_j))
        outs.append((n, ra, rb, d, jnp.asarray(cc_i, jnp.int32),
                     jnp.asarray(cc_j, jnp.int32), ok))

    ch_i, ch_j = pairs["ch"]  # circle first, hull second
    if len(ch_i):
        n, r_c, cp_hull, d = jax.vmap(circle_hull)(
            take_n(pos, ch_i), take_n(radius, ch_i),
            take_n(wv, ch_j), counts_j[jnp.asarray(ch_j)])
        r_h = cp_hull - take_n(pos, ch_j)
        ok = aabb_overlap(boxes, ch_i, ch_j) & (d > -pair_margin(ch_i, ch_j))
        # normal from hull->circle == from b->a with a=circle. ✓
        outs.append((n, r_c, r_h, d, jnp.asarray(ch_i, jnp.int32),
                     jnp.asarray(ch_j, jnp.int32), ok))

    hh_i, hh_j = pairs["hh"]
    if len(hh_i):
        ii = jnp.asarray(hh_i, jnp.int32)
        jj = jnp.asarray(hh_j, jnp.int32)
        if 0 < hull_budget < len(hh_i):
            # Top-K pair budget: rank all static pairs by AABB-overlap
            # extent (cheap, elementwise) and run the SAT/clipping kernel
            # only on the K most-overlapping ones.
            score = aabb_overlap_depth(boxes, hh_i, hh_j)
            _, sel = jax.lax.top_k(score, hull_budget)
            sel = jax.lax.stop_gradient(sel)
            ii, jj = ii[sel], jj[sel]
        ok = aabb_overlap(boxes, ii, jj)
        hh_m = (margin[ii] + margin[jj] if margin is not None
                else jnp.zeros(ii.shape, dt))
        (nrm_x, nrm_y, rax, ray, rbx, rby, d2, v2) = hull_hull_pairs(
            wv, counts_j, pos, ii, jj, hh_m)
        P = ii.shape[0]
        # Flatten the 2-point manifolds into single-contact rows sharing
        # the normal: SoA (2, P) -> AoS (2P, 2), pair-major (matching the
        # vmapped kernel's historical row order).
        def aos(xs, ys):                      # (2, P) x2 -> (2P, 2)
            return jnp.stack([xs, ys], axis=-1).swapaxes(0, 1).reshape(
                2 * P, 2)
        n_flat = aos(jnp.broadcast_to(nrm_x, (2, P)),
                     jnp.broadcast_to(nrm_y, (2, P)))
        ra_flat = aos(rax, ray)
        rb_flat = aos(rbx, rby)
        d_flat = d2.T.reshape(2 * P)
        v_flat = (v2 & ok[None, :]).T.reshape(2 * P)
        outs.append((n_flat, ra_flat, rb_flat, d_flat,
                     jnp.repeat(ii, 2), jnp.repeat(jj, 2), v_flat))

    if not outs:
        z2 = jnp.zeros((c_max, 2), dt)
        return Contacts(z2, z2, z2, jnp.zeros((c_max,), dt),
                        jnp.zeros((c_max,), jnp.int32),
                        jnp.zeros((c_max,), jnp.int32),
                        jnp.zeros((c_max,), bool))

    normal = jnp.concatenate([o[0] for o in outs])
    ra = jnp.concatenate([o[1] for o in outs])
    rb = jnp.concatenate([o[2] for o in outs])
    depth = jnp.concatenate([o[3] for o in outs])
    ia = jnp.concatenate([o[4] for o in outs])
    ib = jnp.concatenate([o[5] for o in outs])
    valid = jnp.concatenate([o[6] for o in outs])

    total = normal.shape[0]
    if total <= c_max:
        pad = c_max - total
        normal = jnp.pad(normal, ((0, pad), (0, 0)))
        ra = jnp.pad(ra, ((0, pad), (0, 0)))
        rb = jnp.pad(rb, ((0, pad), (0, 0)))
        depth = jnp.pad(depth, ((0, pad),))
        ia = jnp.pad(ia, ((0, pad),))
        ib = jnp.pad(ib, ((0, pad),))
        valid = jnp.pad(valid, ((0, pad),))
        return Contacts(normal, ra, rb, depth, ia, ib, valid)

    # Compaction: keep the c_max deepest valid contacts.  Scores of invalid
    # slots are pushed below every valid slot.  The differentiable fields
    # are packed into ONE gather so the backward pass issues a single
    # scatter-add instead of four (scatters dominate the assembly vjp).
    score = jnp.where(valid, depth, -jnp.inf)
    _, keep = jax.lax.top_k(score, c_max)
    keep = jax.lax.stop_gradient(keep)
    # top_k picks are unique rows, so the packed gather's transpose can be
    # a vectorizable unique-indices scatter-SET instead of a scatter-add.
    take_u = make_take_unique_rows(total)
    packed = take_u(jnp.concatenate(
        [normal, ra, rb, depth[:, None]], axis=-1), keep)  # (c_max, 7)
    ints = jnp.stack(
        [ia, ib, valid.astype(jnp.int32)], axis=-1)[keep]  # (c_max, 3)
    return Contacts(packed[:, 0:2], packed[:, 2:4], packed[:, 4:6],
                    packed[:, 6], ints[:, 0], ints[:, 1],
                    ints[:, 2].astype(bool))


def max_penetration(p, verts, radius, counts, pairs):
    """Deepest penetration in the world (for the strict-no-penetration
    dt-halving backtrack; reference ``World.step`` SURVEY.md §3.1).

    Depth-only fast path: per-pair signed depths (SAT separation for
    hull pairs) reduced with a max — no contact buffer, no top_k
    compaction, no point/normal generation.  Used by the stepper's
    post-step diagnostics every step.
    """
    dt = p.dtype
    pos = p[:, 1:3]
    wv = world_vertices(verts, p)
    counts_j = jnp.asarray(np.asarray(counts))
    best = jnp.zeros((), dt)

    cc_i, cc_j = pairs["cc"]
    if len(cc_i):
        d = jax.vmap(lambda i, j: circle_circle(
            pos[i], radius[i], pos[j], radius[j])[3])(cc_i, cc_j)
        best = jnp.maximum(best, jnp.max(d, initial=0.0))

    ch_i, ch_j = pairs["ch"]
    if len(ch_i):
        d = jax.vmap(lambda i, j: circle_hull(
            pos[i], radius[i], wv[j], counts_j[j])[3])(ch_i, ch_j)
        best = jnp.maximum(best, jnp.max(d, initial=0.0))

    hh_i, hh_j = pairs["hh"]
    if len(hh_i):
        d = hull_hull_sat_depths(wv, counts_j, jnp.asarray(hh_i),
                                 jnp.asarray(hh_j))
        best = jnp.maximum(best, jnp.max(d, initial=0.0))
    return best
