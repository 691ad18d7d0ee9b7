"""Narrowphase/broadphase unit tests against analytic cases
(SURVEY.md §4 test plan, item 2)."""
import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.core.geometry import (
    Contacts, aabb_overlap, aabbs, circle_circle, circle_hull, find_contacts,
    hull_hull, max_penetration, split_pairs_by_kind, world_vertices)


def square_verts(half):
    """CCW unit square scaled by half-extent."""
    return np.array([[-half, -half], [half, -half],
                     [half, half], [-half, half]], float)


def make_world(bodies):
    """bodies: list of dicts with pos(3,), and either radius or verts."""
    N = len(bodies)
    V = max(max((len(b.get("verts", [0])) for b in bodies), default=1), 1)
    p = np.zeros((N, 3))
    verts = np.zeros((N, V, 2))
    radius = np.zeros(N)
    counts = np.zeros(N, int)
    for k, b_ in enumerate(bodies):
        p[k] = b_["pos"]
        if "radius" in b_:
            counts[k] = 1
            radius[k] = b_["radius"]
        else:
            v = np.asarray(b_["verts"], float)
            counts[k] = len(v)
            verts[k, :len(v)] = v
            verts[k, len(v):] = v[-1]  # pad by repeating last vertex
    return jnp.asarray(p), jnp.asarray(verts), jnp.asarray(radius), counts


def test_circle_circle_basic():
    n, ra, rb, d = circle_circle(jnp.array([0., 3.]), 2.0,
                                 jnp.array([0., 0.]), 2.0)
    np.testing.assert_allclose(n, [0., 1.], atol=1e-12)   # pushes a up
    np.testing.assert_allclose(d, 1.0, atol=1e-12)
    np.testing.assert_allclose(ra, [0., -2.], atol=1e-12)
    np.testing.assert_allclose(rb, [0., 2.], atol=1e-12)


def test_circle_circle_separated():
    *_, d = circle_circle(jnp.array([10., 0.]), 1.0, jnp.array([0., 0.]), 1.0)
    assert float(d) < 0


def test_circle_hull_face():
    """Circle above the top face of a square: normal +y, depth = r - gap."""
    wv = jnp.asarray(square_verts(1.0))
    n, rc, cp, d = circle_hull(jnp.array([0., 1.5]), 1.0, wv, jnp.asarray(4))
    np.testing.assert_allclose(n, [0., 1.], atol=1e-9)
    np.testing.assert_allclose(d, 0.5, atol=1e-9)          # r=1, gap=0.5
    np.testing.assert_allclose(cp, [0., 1.], atol=1e-9)    # on the face
    np.testing.assert_allclose(rc, [0., -1.], atol=1e-9)


def test_circle_hull_corner():
    """Circle diagonal off the (1,1) corner: normal along the diagonal."""
    c = jnp.array([2., 2.])
    wv = jnp.asarray(square_verts(1.0))
    n, rc, cp, d = circle_hull(c, 1.0, wv, jnp.asarray(4))
    s2 = np.sqrt(2)
    np.testing.assert_allclose(n, [1 / s2, 1 / s2], atol=1e-9)
    np.testing.assert_allclose(cp, [1., 1.], atol=1e-9)
    np.testing.assert_allclose(d, 1.0 - s2, atol=1e-9)     # separated


def test_circle_hull_center_inside():
    """Circle center inside the hull: pushed out the nearest face."""
    wv = jnp.asarray(square_verts(1.0))
    n, rc, cp, d = circle_hull(jnp.array([0., 0.8]), 0.5, wv, jnp.asarray(4))
    np.testing.assert_allclose(n, [0., 1.], atol=1e-9)
    np.testing.assert_allclose(d, 0.5 + 0.2, atol=1e-9)    # r + dist to face
    np.testing.assert_allclose(cp, [0., 1.], atol=1e-9)


def test_hull_hull_face_overlap():
    """Two unit squares overlapping by 0.4 in x: 2-point manifold."""
    wva = jnp.asarray(square_verts(1.0))          # centered at origin
    wvb = jnp.asarray(square_verts(1.0) + [1.6, 0.0])
    n, ra, rb, d, v = hull_hull(wva, jnp.asarray(4), jnp.array([0., 0.]),
                                wvb, jnp.asarray(4), jnp.array([1.6, 0.]))
    assert bool(v[0]) and bool(v[1])
    np.testing.assert_allclose(np.abs(n[0]), 1.0, atol=1e-9)  # +-x axis
    np.testing.assert_allclose(n[1], 0.0, atol=1e-9)
    np.testing.assert_allclose(d, [0.4, 0.4], atol=1e-9)
    # normal pushes a away from b: a is left of b -> -x
    np.testing.assert_allclose(n, [-1., 0.], atol=1e-9)
    # contact points at x ~ overlap band, y in [-1, 1]
    pts_a = np.asarray(ra) + np.array([0., 0.])
    assert np.all(np.abs(pts_a[:, 1]) <= 1 + 1e-9)


def test_hull_hull_separated():
    wva = jnp.asarray(square_verts(1.0))
    wvb = jnp.asarray(square_verts(1.0) + [3.0, 0.0])
    *_, v = hull_hull(wva, jnp.asarray(4), jnp.array([0., 0.]),
                      wvb, jnp.asarray(4), jnp.array([3., 0.]))
    assert not bool(v[0]) and not bool(v[1])


def test_hull_hull_rotated_corner():
    """45-degree rotated square resting corner-down on a flat square."""
    s2 = np.sqrt(2)
    diamond = np.array([[s2, 0.], [0., s2], [-s2, 0.], [0., -s2]])
    ground = square_verts(5.0)
    # Diamond bottom corner at y = -s2 + offset, ground top at y = 0
    off = 0.1
    wva = jnp.asarray(diamond + [0., s2 - off])   # corner dips 0.1 below 0
    wvb = jnp.asarray(ground + [0., -5.0])        # top face at y=0
    n, ra, rb, d, v = hull_hull(wva, jnp.asarray(4), jnp.array([0., s2 - off]),
                                wvb, jnp.asarray(4), jnp.array([0., -5.]))
    assert bool(v[0]) or bool(v[1])
    np.testing.assert_allclose(n, [0., 1.], atol=1e-9)  # push diamond up
    dmax = float(jnp.max(jnp.where(v, d, -jnp.inf)))
    np.testing.assert_allclose(dmax, off, atol=1e-9)


def test_world_vertices_rotation():
    verts = jnp.asarray(square_verts(1.0))[None]
    p = jnp.array([[np.pi / 2, 3.0, 4.0]])
    wv = world_vertices(verts, p)
    np.testing.assert_allclose(wv[0, 0], [3 + 1, 4 - 1], atol=1e-9)


def test_aabb_and_broadphase():
    p, verts, radius, counts = make_world([
        dict(pos=[0, 0, 0], radius=1.0),
        dict(pos=[0, 1.5, 0], radius=1.0),
        dict(pos=[0, 10, 0], verts=square_verts(1.0)),
    ])
    boxes = aabbs(p, verts, radius, jnp.asarray(counts))
    np.testing.assert_allclose(boxes[0], [[-1, -1], [1, 1]], atol=1e-9)
    ov = aabb_overlap(boxes, np.array([0, 0]), np.array([1, 2]))
    assert bool(ov[0]) and not bool(ov[1])


def test_find_contacts_mixed_world():
    """Mixed world: two overlapping circles, a circle on a box, two boxes."""
    p, verts, radius, counts = make_world([
        dict(pos=[0, 0, 0], radius=1.0),
        dict(pos=[0, 1.5, 0], radius=1.0),          # overlaps body 0
        dict(pos=[0, 10, 0.5], radius=1.0),          # on top of body 3
        dict(pos=[0, 10, -1], verts=square_verts(1.0)),
        dict(pos=[0, 20, 0], verts=square_verts(1.0)),
        dict(pos=[0, 21.6, 0], verts=square_verts(1.0)),  # overlaps body 4
        dict(pos=[0, 40, 40], radius=2.0),           # isolated
    ])
    pairs = split_pairs_by_kind(counts)
    cts = find_contacts(p, verts, radius, counts, pairs, c_max=16)
    assert isinstance(cts, Contacts)
    nv = int(jnp.sum(cts.valid))
    # cc: 1 contact; ch: 1; hh: 2 points
    assert nv == 4
    # All valid contacts have positive depth and unit normals
    assert float(jnp.min(jnp.where(cts.valid, cts.depth, 1.0))) > 0
    norms = jnp.linalg.norm(cts.normal, axis=-1)
    np.testing.assert_allclose(
        np.asarray(norms[np.asarray(cts.valid)]), 1.0, atol=1e-6)


def test_no_contact_exclusion():
    p, verts, radius, counts = make_world([
        dict(pos=[0, 0, 0], radius=1.0),
        dict(pos=[0, 1.5, 0], radius=1.0),
    ])
    allowed = np.ones((2, 2), bool)
    allowed[0, 1] = allowed[1, 0] = False
    pairs = split_pairs_by_kind(counts, allowed)
    cts = find_contacts(p, verts, radius, counts, pairs, c_max=4)
    assert int(jnp.sum(cts.valid)) == 0


def test_compaction_keeps_deepest():
    bodies = [dict(pos=[0, 2.0 * k, 0], radius=1.2) for k in range(6)]
    p, verts, radius, counts = make_world(bodies)
    pairs = split_pairs_by_kind(counts)
    # 5 overlapping neighbor pairs, capacity 3 -> keep 3 valid
    cts = find_contacts(p, verts, radius, counts, pairs, c_max=3)
    assert int(jnp.sum(cts.valid)) == 3


def test_contacts_differentiable():
    """Penetration depth gradient wrt position is the contact normal."""
    verts = jnp.zeros((2, 1, 2))
    radius = jnp.array([1.0, 1.0])
    counts = np.array([1, 1])
    pairs = split_pairs_by_kind(counts)

    def depth_sum(y):
        p = jnp.array([[0., 0., 0.], [0., 0., 1.5 + y]])
        cts = find_contacts(p, verts, radius, counts, pairs, c_max=2)
        return jnp.sum(jnp.where(cts.valid, cts.depth, 0.0))

    g = jax.grad(depth_sum)(0.0)
    np.testing.assert_allclose(g, -1.0, atol=1e-9)  # moving up reduces depth


def test_max_penetration():
    p, verts, radius, counts = make_world([
        dict(pos=[0, 0, 0], radius=1.0),
        dict(pos=[0, 1.2, 0], radius=1.0),
    ])
    pairs = split_pairs_by_kind(counts)
    pen = max_penetration(p, verts, radius, counts, pairs)
    np.testing.assert_allclose(pen, 0.8, atol=1e-9)


# ---------------------------------------------------------------------------
# SoA hull-hull narrowphase (round-3 TPU-first rewrite): element-for-element
# parity with the vmapped per-pair kernel, plus pair-budget exactness.
# ---------------------------------------------------------------------------

def random_hull(rng, n_verts, scale=1.0):
    """Random convex CCW polygon with n_verts vertices, centered."""
    ang = np.sort(rng.uniform(0, 2 * np.pi, n_verts))
    rad = rng.uniform(0.5, 1.0, n_verts) * scale
    v = np.stack([rad * np.cos(ang), rad * np.sin(ang)], axis=-1)
    return v - v.mean(axis=0)


def random_hull_world(rng, N=8, Vmax=6, spread=2.5):
    """A world of N random convex hulls scattered densely enough that many
    pairs overlap, many touch and many are separated."""
    bodies = []
    for _ in range(N):
        nv = int(rng.integers(3, Vmax + 1))
        pos = [rng.uniform(-0.4, 0.4),
               rng.uniform(-spread, spread), rng.uniform(-spread, spread)]
        bodies.append(dict(pos=pos, verts=random_hull(rng, nv)))
    return make_world(bodies)


def test_soa_hull_hull_matches_per_pair_kernel():
    from lcp_physics_tpu.core.geometry import hull_hull_pairs

    rng = np.random.default_rng(42)
    for trial in range(4):
        p, verts, radius, counts = random_hull_world(rng)
        pairs = split_pairs_by_kind(counts)
        hi, hj = pairs["hh"]
        assert len(hi) > 10
        wv = world_vertices(verts, p)
        counts_j = jnp.asarray(counts)
        pos = p[:, 1:3]
        m = jnp.asarray(rng.uniform(0.0, 0.3, len(hi)))

        # reference: the vmapped per-pair kernel
        n0, ra0, rb0, d0, v0 = jax.vmap(
            lambda i, j, mm: hull_hull(wv[i], counts_j[i], pos[i],
                                       wv[j], counts_j[j], pos[j], mm)
        )(hi, hj, m)
        nx, ny, rax, ray, rbx, rby, d1, v1 = hull_hull_pairs(
            wv, counts_j, pos, jnp.asarray(hi), jnp.asarray(hj), m)

        np.testing.assert_array_equal(np.asarray(v1.T), np.asarray(v0))
        val = np.asarray(v0)
        # compare only valid points (invalid slots may hold junk)
        np.testing.assert_allclose(
            np.asarray(d1.T)[val], np.asarray(d0)[val], atol=1e-10)
        np.testing.assert_allclose(
            np.broadcast_to(np.asarray(nx)[:, None], val.shape)[val],
            np.asarray(n0[:, 0])[:, None].repeat(2, 1)[val], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(rax.T)[val], np.asarray(ra0[..., 0])[val], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(ray.T)[val], np.asarray(ra0[..., 1])[val], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(rbx.T)[val], np.asarray(rb0[..., 0])[val], atol=1e-10)
        np.testing.assert_allclose(
            np.asarray(rby.T)[val], np.asarray(rb0[..., 1])[val], atol=1e-10)


def test_soa_sat_depths_match():
    from lcp_physics_tpu.core.geometry import hull_hull_sat_depths

    rng = np.random.default_rng(3)
    p, verts, radius, counts = random_hull_world(rng)
    pairs = split_pairs_by_kind(counts)
    hi, hj = pairs["hh"]
    wv = world_vertices(verts, p)
    counts_j = jnp.asarray(counts)

    def sat_depth(i, j):
        from lcp_physics_tpu.core.geometry import (_edge_data,
                                                   _face_separation)
        _, _, _, na, eva = _edge_data(wv[i], counts_j[i])
        _, _, _, nb, evb = _edge_data(wv[j], counts_j[j])
        sep_a = jnp.max(_face_separation(na, wv[i], eva, wv[j], counts_j[j]))
        sep_b = jnp.max(_face_separation(nb, wv[j], evb, wv[i], counts_j[i]))
        return -jnp.maximum(sep_a, sep_b)

    d0 = jax.vmap(sat_depth)(hi, hj)
    d1 = hull_hull_sat_depths(wv, counts_j, jnp.asarray(hi), jnp.asarray(hj))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), atol=1e-10)


def test_hull_budget_exact_when_budget_covers_overlaps():
    """With a budget >= the number of AABB-overlapping pairs, the budgeted
    pipeline must produce the same contact SET as the unbudgeted one."""
    from lcp_physics_tpu.core.geometry import aabb_overlap_depth

    rng = np.random.default_rng(7)
    p, verts, radius, counts = random_hull_world(rng, N=10, spread=3.0)
    pairs = split_pairs_by_kind(counts)
    hi, hj = pairs["hh"]
    boxes = aabbs(p, verts, radius, jnp.asarray(counts))
    n_overlap = int(jnp.sum(aabb_overlap_depth(boxes, hi, hj) > 0))
    assert 0 < n_overlap < len(hi)

    c_max = 64
    full = find_contacts(p, verts, radius, counts, pairs, c_max)
    budg = find_contacts(p, verts, radius, counts, pairs, c_max,
                         hull_budget=max(n_overlap, 1))

    def contact_set(cts):
        rows = []
        for k in np.nonzero(np.asarray(cts.valid))[0]:
            rows.append((int(cts.ia[k]), int(cts.ib[k]),
                         round(float(cts.depth[k]), 9),
                         round(float(cts.normal[k, 0]), 9),
                         round(float(cts.ra[k, 0]), 9)))
        return sorted(rows)

    assert contact_set(full) == contact_set(budg)


def test_hull_budget_in_simconfig_step():
    """A budgeted batched step matches the unbudgeted one when the budget
    covers all overlapping pairs (end-to-end through make_step_batched)."""
    from lcp_physics_tpu.core import make_step_batched
    from lcp_physics_tpu.core.state import WorldState, make_scene_static
    from lcp_physics_tpu.core.state import SceneParams
    from lcp_physics_tpu.utils import SimConfig

    rng = np.random.default_rng(11)
    N = 6
    sq = square_verts(0.5)
    counts = [4] * N
    static = make_scene_static(counts)
    verts = jnp.asarray(np.stack([sq] * N))
    params = SceneParams(
        mass=jnp.ones(N), inertia=jnp.ones(N),
        restitution=jnp.full(N, 0.3), fric_coeff=jnp.full(N, 0.5),
        radius=jnp.zeros(N), verts=verts,
        gravity=jnp.asarray([0.0, 9.8]), force_params=())
    # overlapping 2x3 grid (0.95 spacing on unit squares), slight jitter
    px = np.array([0.95 * (k % 3) for k in range(N)])
    py = np.array([0.95 * (k // 3) for k in range(N)])
    p = jnp.asarray(np.stack([np.zeros(N), px, py], axis=-1))
    B = 3
    states = WorldState(
        p=jnp.stack([p + 0.01 * rng.standard_normal(p.shape)
                     for _ in range(B)]),
        v=jnp.asarray(0.1 * rng.standard_normal((B, N, 3))),
        t=jnp.zeros((B,)))

    s_full = make_step_batched(static, SimConfig())
    s_budg = make_step_batched(static, SimConfig(hull_pair_budget=12))
    o_full, d_full = s_full(params, states, 0.01)
    o_budg, d_budg = s_budg(params, states, 0.01)
    np.testing.assert_allclose(np.asarray(o_budg.p), np.asarray(o_full.p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(o_budg.v), np.asarray(o_full.v),
                               atol=1e-9)


def test_take_rows_grad_matches_plain_gather():
    """ops/take.py matmul-transpose gather: VJP identical to the plain
    scatter-add transpose (repeated indices summed), static numpy and
    traced index vectors, scalar and multi-dim rows, under vmap."""
    from lcp_physics_tpu.ops.take import make_take_rows

    rng = np.random.default_rng(3)
    N, P = 7, 23
    take = make_take_rows(N)
    idx_np = rng.integers(0, N, P)            # repeats guaranteed (P > N)
    arr2 = jnp.asarray(rng.normal(size=(N, 4)))
    ct2 = jnp.asarray(rng.normal(size=(P, 4)))

    def via(fn, arr, idx, ct):
        _, pull = jax.vjp(lambda a: fn(a, idx), arr)
        return pull(ct)[0]

    plain = lambda a, i: jnp.take(a, i, axis=0)
    for idx in (idx_np, jnp.asarray(idx_np)):
        np.testing.assert_allclose(
            np.asarray(via(take, arr2, idx, ct2)),
            np.asarray(via(plain, arr2, idx, ct2)), rtol=1e-12)
    arr1 = jnp.asarray(rng.normal(size=(N,)))
    ct1 = jnp.asarray(rng.normal(size=(P,)))
    np.testing.assert_allclose(
        np.asarray(via(take, arr1, idx_np, ct1)),
        np.asarray(via(plain, arr1, idx_np, ct1)), rtol=1e-12)

    # vmapped over a batched array (the per-world narrowphase pattern)
    B = 5
    arrb = jnp.asarray(rng.normal(size=(B, N, 2)))
    ctb = jnp.asarray(rng.normal(size=(B, P, 2)))
    f_new = jax.vmap(lambda a: take(a, idx_np))
    f_old = jax.vmap(lambda a: plain(a, idx_np))
    _, pn = jax.vjp(f_new, arrb)
    _, po = jax.vjp(f_old, arrb)
    np.testing.assert_allclose(np.asarray(pn(ctb)[0]),
                               np.asarray(po(ctb)[0]), rtol=1e-12)

    # vmapped with an UNBATCHED array (shared params pattern): cotangent
    # sums over the batch
    f_new = jax.vmap(lambda _, a: take(a, idx_np), in_axes=(0, None))
    f_old = jax.vmap(lambda _, a: plain(a, idx_np), in_axes=(0, None))
    dummy = jnp.zeros((B,))
    _, pn = jax.vjp(f_new, dummy, arr2)
    _, po = jax.vjp(f_old, dummy, arr2)
    ctb2 = jnp.asarray(rng.normal(size=(B, P, 4)))
    np.testing.assert_allclose(np.asarray(pn(ctb2)[1]),
                               np.asarray(po(ctb2)[1]), rtol=1e-12)


def test_take_unique_rows_grad_matches_plain_gather():
    """Unique-index take (the top_k compaction transpose): VJP equals the
    plain gather's, including under vmap with batched indices."""
    from lcp_physics_tpu.ops.take import make_take_unique_rows

    rng = np.random.default_rng(4)
    P, C = 19, 8
    take = make_take_unique_rows(P)
    arr = jnp.asarray(rng.normal(size=(P, 7)))
    ct = jnp.asarray(rng.normal(size=(C, 7)))
    idx = jnp.asarray(rng.permutation(P)[:C])
    plain = lambda a, i: jnp.take(a, i, axis=0)
    _, pn = jax.vjp(lambda a: take(a, idx), arr)
    _, po = jax.vjp(lambda a: plain(a, idx), arr)
    np.testing.assert_allclose(np.asarray(pn(ct)[0]),
                               np.asarray(po(ct)[0]), rtol=1e-12)

    B = 4
    arrb = jnp.asarray(rng.normal(size=(B, P, 3)))
    idxb = jnp.asarray(np.stack([rng.permutation(P)[:C] for _ in range(B)]))
    ctb = jnp.asarray(rng.normal(size=(B, C, 3)))
    _, pn = jax.vjp(jax.vmap(take), arrb, idxb)
    _, po = jax.vjp(jax.vmap(plain), arrb, idxb)
    np.testing.assert_allclose(np.asarray(pn(ctb)[0]),
                               np.asarray(po(ctb)[0]), rtol=1e-12)


def test_find_contacts_grad_finite_difference():
    """End-to-end narrowphase gradient wrt positions (through the take-
    based pair gathers AND the unique-scatter compaction: 4 circles -> 6
    candidate rows compacted into c_max=4) matches finite differences."""
    p, verts, radius, counts = make_world([
        dict(pos=[0.0, 0.0, 0.0], radius=1.0),
        dict(pos=[0.0, 1.8, 0.1], radius=1.0),
        dict(pos=[0.0, 0.2, 1.7], radius=1.0),
        dict(pos=[0.0, 1.9, 1.8], radius=1.0),
    ])
    pairs = split_pairs_by_kind(counts)

    def loss(p):
        c = find_contacts(p, verts, radius, counts, pairs, 4)
        w = c.valid.astype(p.dtype)
        return (jnp.sum(w * c.depth) + jnp.sum(w[:, None] * c.normal)
                + jnp.sum(w[:, None] * (c.ra - c.rb)))

    g = jax.grad(loss)(p)
    eps = 1e-6
    for k in [(0, 1), (1, 2), (2, 1), (3, 2)]:
        dp = jnp.zeros_like(p).at[k].set(eps)
        fd = (loss(p + dp) - loss(p - dp)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(g[k]), np.asarray(fd),
                                   rtol=1e-4, atol=1e-7)
