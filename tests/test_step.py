"""Functional-core integration tests against analytic invariants
(SURVEY.md §4 test plan items 3-4: ballistic parity, restitution law,
friction behavior, joint constraint maintenance, momentum conservation).

Coordinate convention mirrors the reference's pygame worlds: y grows
downward, gravity is +y.
"""
import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.core import (JointSpec, WorldState, default_params,
                                  make_scene_static, make_step, rollout)
from lcp_physics_tpu.physics.utils import SimConfig

DT = 1.0 / 100.0
G = 10.0


def circle_world(n, radius=1.0, joints=(), **kw):
    static = make_scene_static([1] * n, joints=joints,
                               **{k: v for k, v in kw.items()
                                  if k in ("c_max", "no_contact", "force_fn")})
    params = default_params(
        static, verts=np.zeros((n, 1, 2)), radius=[radius] * n,
        **{k: v for k, v in kw.items()
           if k in ("mass", "restitution", "fric_coeff", "gravity")})
    return static, params


def box_ground_world(ground_half=(50.0, 1.0), body_kind="circle",
                     body_half=1.0, **kw):
    """Body 0 = dynamic (circle radius 1 or unit box), body 1 = static
    ground held by a TotalConstraint (the reference's pattern for walls)."""
    sq = lambda h: [[-h[0], -h[1]], [h[0], -h[1]], [h[0], h[1]], [-h[0], h[1]]]
    V = 4
    verts = np.zeros((2, V, 2))
    counts = [1, 4]
    radius = [body_half, 0.0]
    if body_kind == "box":
        counts[0] = 4
        radius[0] = 0.0
        verts[0] = sq((body_half, body_half))
    verts[1] = sq(ground_half)
    joints = (JointSpec(kind="total", body1=1, ref=(0.0, 0.0, 0.0)),)
    static = make_scene_static(counts, joints=joints)
    params = default_params(static, verts=verts, radius=radius,
                            mass=kw.pop("mass", 1.0), **kw)
    return static, params


def run(step, params, state, n):
    final, traj = rollout(jax.jit(step), params, state, DT, n)
    return final, traj


def test_ballistic_exact():
    """No contacts: exact semi-implicit Euler free fall."""
    static, params = circle_world(1, gravity=(0.0, G))
    step = make_step(static)
    s0 = WorldState(p=jnp.array([[0., 0., 0.]]),
                    v=jnp.array([[0., 3., -2.]]), t=jnp.zeros(()))
    k = 50
    final, _ = run(step, params, s0, k)
    v_exact = np.array([0., 3., -2. + k * DT * G])
    # p = p0 + dt * sum_{i=1..k} v_i
    vy = -2. + DT * G * np.arange(1, k + 1)
    p_exact = np.array([0., 3. * k * DT, np.sum(vy) * DT])
    np.testing.assert_allclose(final.v[0], v_exact, atol=1e-10)
    np.testing.assert_allclose(final.p[0], p_exact, atol=1e-9)


def test_resting_contact():
    """Ball on constrained ground: settles with |v| ~ 0, penetration tiny."""
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.0)
    # ground top at y = -1 (half-height 1, center 0); ball center y = -2
    s0 = WorldState(p=jnp.array([[0., 0., -2.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    step = make_step(static)
    final, _ = run(step, params, s0, 60)
    assert abs(float(final.v[0, 2])) < 1e-6
    # penetration bounded by one gravity step of sinking
    assert float(final.p[0, 2]) < -2.0 + 2 * G * DT * DT
    # ground never moves
    np.testing.assert_allclose(final.p[1], 0.0, atol=1e-8)


def test_restitution_bounce():
    """Outgoing normal speed ~ e * incoming speed."""
    e = 0.7
    static, params = box_ground_world(gravity=(0.0, G), restitution=e)
    s0 = WorldState(p=jnp.array([[0., 0., -3.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    step = jax.jit(make_step(static))
    _, traj = rollout(step, params, s0, DT, 200)
    vy = np.asarray(traj.v[:, 0, 2])
    # find the bounce: velocity sign flip from + (downward) to -
    idx = np.where((vy[:-1] > 0.5) & (vy[1:] < 0))[0]
    assert len(idx) >= 1
    k = idx[0]
    ratio = -vy[k + 1] / vy[k]
    np.testing.assert_allclose(ratio, e, rtol=0.05)


def test_friction_stops_slider():
    """Box sliding on ground with high friction decelerates to rest; with
    zero friction it keeps its speed (LCP friction-cone behavior)."""
    for mu, should_stop in [(0.9, True), (0.0, False)]:
        static, params = box_ground_world(body_kind="box", gravity=(0.0, G),
                                          restitution=0.0, fric_coeff=mu)
        # box sitting on ground top (y=-1), center at -2 + tiny sink
        s0 = WorldState(p=jnp.array([[0., 0., -1.9999], [0., 0., 0.]]),
                        v=jnp.array([[0., 5., 0.], [0., 0., 0.]]),
                        t=jnp.zeros(()))
        step = make_step(static)
        final, _ = run(step, params, s0, 100)
        vx = float(final.v[0, 1])
        if should_stop:
            assert abs(vx) < 0.05, f"mu={mu}: vx={vx}"
        else:
            np.testing.assert_allclose(vx, 5.0, atol=1e-4)


def test_friction_deceleration_rate():
    """Coulomb sliding: dv/dt = -mu * g while sliding."""
    mu = 0.2
    static, params = box_ground_world(body_kind="box", gravity=(0.0, G),
                                      restitution=0.0, fric_coeff=mu)
    s0 = WorldState(p=jnp.array([[0., 0., -1.9999], [0., 0., 0.]]),
                    v=jnp.array([[0., 5., 0.], [0., 0., 0.]]),
                    t=jnp.zeros(()))
    step = make_step(static)
    k = 100
    final, _ = run(step, params, s0, k)
    v_expect = 5.0 - mu * G * k * DT
    np.testing.assert_allclose(float(final.v[0, 1]), v_expect, rtol=0.05)


def test_pendulum_energy_and_anchor():
    """Point-mass pendulum on a world joint: anchor drift stays small and
    the speed at the bottom matches sqrt(2 g L) within integrator error."""
    L = 2.0
    joints = (JointSpec(kind="joint", body1=0, body2=-1,
                        local1=(-L, 0.0), ref=(0.0, 0.0, 0.0)),)
    static, params = circle_world(1, radius=0.1, joints=joints,
                                  gravity=(0.0, G))
    s0 = WorldState(p=jnp.array([[0., L, 0.]]), v=jnp.zeros((1, 3)),
                    t=jnp.zeros(()))
    step = jax.jit(make_step(static))
    _, traj = rollout(step, params, s0, DT, 120)
    p = np.asarray(traj.p[:, 0, :])
    v = np.asarray(traj.v[:, 0, :])
    # anchor = com + R(theta) (-L, 0) must stay ~ (0, 0)
    anchors = p[:, 1:3] + np.stack(
        [-L * np.cos(p[:, 0]), -L * np.sin(p[:, 0])], axis=-1)
    # velocity-level constraint: O(dt^2)-per-step drift, like the reference
    # without post-stabilization
    assert np.abs(anchors).max() < 0.05 * L
    # speed when passing the bottom (x ~ 0, y ~ +L)
    bottom = np.argmin(np.abs(p[:, 1]))
    speed = np.linalg.norm(v[bottom, 1:3])
    np.testing.assert_allclose(speed, np.sqrt(2 * G * L), rtol=0.05)


def test_pendulum_post_stabilization():
    """post_stabilization projects the joint drift away each step."""
    L = 2.0
    joints = (JointSpec(kind="joint", body1=0, body2=-1,
                        local1=(-L, 0.0), ref=(0.0, 0.0, 0.0)),)
    static, params = circle_world(1, radius=0.1, joints=joints,
                                  gravity=(0.0, G))
    s0 = WorldState(p=jnp.array([[0., L, 0.]]), v=jnp.zeros((1, 3)),
                    t=jnp.zeros(()))
    step = jax.jit(make_step(static, SimConfig(post_stabilization=True)))
    _, traj = rollout(step, params, s0, DT, 120)
    p = np.asarray(traj.p[:, 0, :])
    anchors = p[:, 1:3] + np.stack(
        [-L * np.cos(p[:, 0]), -L * np.sin(p[:, 0])], axis=-1)
    assert np.abs(anchors).max() < 2e-3 * L


def test_elastic_collision_momentum():
    """Equal-mass head-on elastic collision: velocities exchange; momentum
    conserved exactly, energy within solver tolerance."""
    static, params = circle_world(2, radius=1.0, gravity=(0.0, 0.0),
                                  restitution=1.0, fric_coeff=0.0)
    s0 = WorldState(p=jnp.array([[0., -3., 0.], [0., 3., 0.]]),
                    v=jnp.array([[0., 2., 0.], [0., -2., 0.]]),
                    t=jnp.zeros(()))
    step = make_step(static)
    final, traj = run(step, params, s0, 150)
    v = np.asarray(final.v)
    mom = v[:, 1].sum()
    np.testing.assert_allclose(mom, 0.0, atol=1e-8)
    np.testing.assert_allclose(v[0, 1], -2.0, rtol=0.02)
    np.testing.assert_allclose(v[1, 1], 2.0, rtol=0.02)


def test_vmap_batch_matches_loop():
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.5)
    step = make_step(static)
    B = 4
    heights = jnp.linspace(-4.0, -2.5, B)
    states = WorldState(
        p=jnp.stack([jnp.array([[0., 0., h], [0., 0., 0.]])
                     for h in heights]),
        v=jnp.zeros((B, 2, 3)),
        t=jnp.zeros((B,)))
    bstep = jax.jit(jax.vmap(lambda s: step(params, s, DT)[0]))
    out = states
    for _ in range(20):
        out = bstep(out)
    for k in range(B):
        s = WorldState(p=states.p[k], v=states.v[k], t=states.t[k])
        for _ in range(20):
            s = jax.jit(step)(params, s, DT)[0]
        np.testing.assert_allclose(out.p[k], s.p, atol=1e-8)


def test_gradient_through_contact_rollout():
    """Finite-difference check of d(final x)/d(initial vx) through a rollout
    containing a bounce (the property powering the inference demos)."""
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.6)
    step = make_step(static)

    def final_x(vx0):
        s0 = WorldState(
            p=jnp.array([[0., 0., -2.5], [0., 0., 0.]]),
            v=jnp.array([[0., vx0, 0.], [0., 0., 0.]]), t=jnp.zeros(()))
        f, _ = rollout(step, params, s0, DT, 40)
        return f.p[0, 1]

    g = jax.grad(final_x)(1.0)
    eps = 1e-5
    fd = (final_x(1.0 + eps) - final_x(1.0 - eps)) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-4)


def test_gradient_wrt_restitution():
    """d(bounce apex)/d(restitution) is nonzero and matches finite diff."""
    static, _ = box_ground_world(gravity=(0.0, G))

    def apex(e):
        params = default_params(
            static,
            verts=np.array([np.zeros((4, 2)),
                            [[-50., -1.], [50., -1.], [50., 1.], [-50., 1.]]]),
            radius=[1.0, 0.0], restitution=e, gravity=(0.0, G))
        s0 = WorldState(p=jnp.array([[0., 0., -2.5], [0., 0., 0.]]),
                        v=jnp.zeros((2, 3)), t=jnp.zeros(()))
        step = make_step(static)
        _, traj = rollout(step, params, s0, DT, 120)
        # apex AFTER the bounce (the initial point is higher than any
        # rebound, so a whole-trajectory min would see zero gradient)
        return -jnp.min(traj.p[60:, 0, 2])

    g = jax.grad(apex)(0.6)
    eps = 1e-5
    fd = (apex(0.6 + eps) - apex(0.6 - eps)) / (2 * eps)
    assert abs(float(g)) > 1e-3
    np.testing.assert_allclose(g, fd, rtol=1e-3)


def test_batched_step_B_equals_3N():
    """Regression (ADVICE r1, high): with B == 3N the stacked (B, 3N) mass
    diagonal used to be shape-sniffed as a shared dense Q, producing garbage
    dynamics.  The explicit q_is_diag flag makes every batch size agree with
    the single-world step."""
    from lcp_physics_tpu.core import make_step_batched
    import jax.tree_util as jtu

    static, params = circle_world(2, gravity=(0.0, G))
    step = make_step(static)
    s0 = WorldState(p=jnp.array([[0., 0., 0.], [0., 5., 0.]]),
                    v=jnp.array([[0., 0.1, 0.], [0., -0.1, 0.]]),
                    t=jnp.zeros(()))
    ref, _ = jax.jit(step)(params, s0, DT)
    for B in (5, 6, 7):  # 6 == 3 * n_bodies is the poison case
        states = jtu.tree_map(
            lambda x: jnp.broadcast_to(x[None], (B,) + x.shape), s0)
        bstep = jax.jit(make_step_batched(static))
        out, _ = bstep(params, states, DT)
        np.testing.assert_allclose(np.asarray(out.v), 
                                   np.broadcast_to(np.asarray(ref.v), 
                                                   (B, 2, 3)),
                                   atol=1e-8, err_msg=f"B={B}")


def test_lcp_solve_ambiguous_q_raises():
    """Batched (B, n) Q with B == n must be rejected unless q_is_diag is
    given explicitly."""
    import pytest
    from lcp_physics_tpu.lcp import lcp_solve

    n = 3
    Q = jnp.broadcast_to(jnp.ones((n,)), (n, n))  # ambiguous (B=n, n)
    p = jnp.zeros((n, n))
    Gm = -jnp.eye(n)[None].repeat(n, 0)
    h = jnp.ones((n, n))
    with pytest.raises(ValueError, match="ambiguous"):
        lcp_solve(Q, p, Gm, h)
    # explicit flags both work
    z_diag = lcp_solve(Q, p, Gm, h, q_is_diag=True)
    z_dense = lcp_solve(jnp.eye(n) + 0.0 * Q, p, Gm, h, q_is_diag=False)
    assert z_diag.shape == (n, n) and z_dense.shape == (n, n)


def test_batch_tile_matches_untiled():
    """batch_tile segments the step over world tiles (HBM bound); results
    and gradients must match the fused batch bit-for-bit semantics."""
    from lcp_physics_tpu.core import make_step_batched
    import jax.tree_util as jtu

    static, params = circle_world(3, gravity=(0.0, G))
    rng = np.random.default_rng(7)
    B = 8
    p = jnp.asarray(np.concatenate(
        [np.zeros((B, 3, 1)), rng.uniform(0, 4, (B, 3, 2))], -1))
    s0 = WorldState(p=p, v=jnp.asarray(rng.normal(0, 1, (B, 3, 3))),
                    t=jnp.zeros((B,)))
    full = jax.jit(make_step_batched(static, SimConfig()))
    tiled = jax.jit(make_step_batched(static, SimConfig(batch_tile=4)))
    out_f, diag_f = full(params, s0, DT)
    out_t, diag_t = tiled(params, s0, DT)
    np.testing.assert_allclose(np.asarray(out_t.p), np.asarray(out_f.p),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(diag_t.max_penetration),
                               np.asarray(diag_f.max_penetration), atol=1e-12)

    def loss(cfg):
        def f(mass):
            pr = params.__class__(**{**params.__dict__, "mass": mass})
            o, _ = make_step_batched(static, cfg)(pr, s0, DT)
            return jnp.sum(o.v ** 2)
        return jax.grad(f)(params.mass)

    g_f = loss(SimConfig())
    g_t = loss(SimConfig(batch_tile=2))
    np.testing.assert_allclose(np.asarray(g_t), np.asarray(g_f), rtol=1e-6)


def _random_contact_rich(B, N, seed, dtype=jnp.float64):
    """Random near-contact cluster worlds + assembled LCP blocks."""
    from lcp_physics_tpu.core import make_assemble, make_scene_static, \
        default_params
    rng = np.random.default_rng(seed)
    static = make_scene_static([1] * N, c_max=2 * N)
    params = default_params(static, verts=np.zeros((N, 1, 2)),
                            radius=[1.0] * N, gravity=(0.0, G),
                            restitution=0.5, fric_coeff=0.9, dtype=dtype)
    config = SimConfig(max_iter=25, solver_eps=1e-9)
    assemble, _ = make_assemble(static, config)
    # jittered line of touching circles: physical contact depths (<= ~0.2),
    # not the degenerate near-total overlaps a uniform scatter produces
    base = np.stack([np.arange(N) * 1.9, np.zeros(N)], -1)
    pos = base[None] + rng.uniform(-0.12, 0.12, (B, N, 2))
    p = jnp.asarray(np.concatenate([np.zeros((B, N, 1)), pos], -1), dtype)
    v = jnp.asarray(rng.standard_normal((B, N, 3)), dtype)
    states = WorldState(p=p, v=v, t=jnp.zeros((B,), dtype))
    blocks, contacts = jax.vmap(assemble, in_axes=(None, 0, None))(
        params, states, DT)
    return static, params, blocks, contacts


def test_friction_cone_and_complementarity():
    """SURVEY §4 item 4: on randomized contact-rich scenes the solver's
    multipliers satisfy the polyhedral friction cone mu*lam_n >= |sum beta|
    and the complementarity/KKT residuals are at solver tolerance."""
    from lcp_physics_tpu.lcp import lcp_solve_full

    B, N = 16, 6
    static, params, blocks, contacts = _random_contact_rich(B, N, 11)
    C = static.c_max
    sol = lcp_solve_full(**blocks, max_iter=30, tol=1e-10, q_is_diag=True,
                         gamma_rows=C)
    lam_n = sol.lam[:, :C]                    # normal impulses
    beta = sol.lam[:, C:3 * C]                # friction (+t, -t)
    mu = jnp.sqrt(jnp.clip(
        params.fric_coeff[contacts.ia] * params.fric_coeff[contacts.ib],
        0.0)) * contacts.valid
    net_beta = jnp.abs(beta[:, :C] - beta[:, C:2 * C])
    # cone: mu*lam_n - |sum beta| >= -tol on valid rows
    slack = mu * lam_n - net_beta
    ok = jnp.where(contacts.valid, slack, 0.0)
    assert float(jnp.min(ok)) > -1e-6
    # complementarity + KKT residuals at tolerance
    assert float(jnp.max(sol.mu)) < 1e-7
    assert float(jnp.max(sol.resid)) < 1e-6
    # duals are nonnegative
    assert float(jnp.min(sol.lam)) >= 0.0
    assert float(jnp.min(sol.s)) >= 0.0


def test_no_penetration_across_restitution_sweep():
    """SURVEY §4 item 4: post-step penetration stays below tolerance for
    every restitution in a sweep (speculative contacts resolve impacts at
    the surface)."""
    for e in (0.0, 0.3, 0.6, 0.9):
        static, params = box_ground_world(gravity=(0.0, G), restitution=e)
        s0 = WorldState(p=jnp.array([[0., 0., -2.6], [0., 0., 0.]]),
                        v=jnp.zeros((2, 3)), t=jnp.zeros(()))
        step = make_step(static)
        _, traj = rollout(jax.jit(step), params, s0, DT, 150)
        # ball never sinks below the surface beyond tol: center y <= -2+tol
        max_y = float(jnp.max(traj.p[:, 0, 2]))
        assert max_y <= -2.0 + 1e-4, f"e={e}: penetration {max_y + 2.0}"


def test_blocked_pallas_backend_trajectory_matches_xla():
    """World trajectories through the BLOCKED pallas factorization path
    (Schur system > MAX_LANE_N rows) match the pivoted XLA backend."""
    static, params = circle_world(12, c_max=32, gravity=(0.0, G))
    # Schur size = c_max*(1+fd) + q = 96 > 88 -> blocked kernel
    rng = np.random.default_rng(9)
    base = np.stack([np.arange(12) * 2.0, np.zeros(12)], -1)
    pos = base + rng.uniform(-0.08, 0.08, (12, 2))
    s0 = WorldState(
        p=jnp.asarray(np.concatenate([np.zeros((12, 1)), pos], -1)),
        v=jnp.asarray(rng.normal(0, 0.5, (12, 3))), t=jnp.zeros(()))
    trajs = {}
    for be in ("xla", "pallas"):
        step = make_step(static, SimConfig(lcp_backend=be, max_iter=20,
                                           solver_eps=1e-9))
        _, trajs[be] = rollout(jax.jit(step), params, s0, DT, 20)
    np.testing.assert_allclose(np.asarray(trajs["pallas"].p),
                               np.asarray(trajs["xla"].p),
                               atol=1e-6)


def test_penetration_backtrack_batched():
    """In-jit dt-halving (SimConfig.penetration_backtrack): a fast body
    that would tunnel/penetrate deeply in one full step gets a per-world
    halved dt; post-step penetration stays controlled with NO host
    round-trips, and untroubled worlds in the same batch keep the full
    dt (reference World.step semantics on the batched path)."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(gravity=(0.0, G), restitution=0.0)
    # ground top at y = -1; fast ball (radius 1) approaching the ground,
    # speculative OFF so the overlap-only activation can overshoot.
    tol = 1e-6
    cfg_off = SimConfig(speculative=False, tol=tol)
    cfg_on = SimConfig(speculative=False, tol=tol,
                       penetration_backtrack=True, max_dt_halvings=8)
    dt = 0.05
    # world 0: ball falling fast onto the ground; world 1: ball far away
    p0 = np.array([[[0., 0., -2.4], [0., 0., 0.]],
                   [[0., 0., -30.], [0., 0., 0.]]])
    v0 = np.array([[[0., 0., 12.0], [0., 0., 0.]],
                   [[0., 0., 0.], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.asarray(v0),
                        t=jnp.zeros((2,)))

    s_off = jax.jit(make_step_batched(static, cfg_off))
    s_on = jax.jit(make_step_batched(static, cfg_on))
    out_off, d_off = s_off(params, states, dt)
    out_on, d_on = s_on(params, states, dt)

    # Without backtrack the fast world penetrates deeply.
    assert float(d_off.max_penetration[0]) > 0.05
    # With backtrack, fresh penetration is bounded by tol.
    fresh = d_on.max_penetration - d_on.pre_penetration
    assert float(d_on.max_penetration[0]) <= tol or float(fresh[0]) <= tol
    assert float(d_on.max_penetration[0]) < 1e-3
    assert int(d_on.halvings[0]) >= 1
    # The far-away world keeps the full dt and matches the plain step.
    assert int(d_on.halvings[1]) == 0
    np.testing.assert_allclose(np.asarray(out_on.p[1]),
                               np.asarray(out_off.p[1]), atol=1e-12)
    np.testing.assert_allclose(float(out_on.t[1]), dt, atol=1e-12)
    # Backtracked world advanced by its accepted smaller dt.
    assert float(out_on.t[0]) < dt - 1e-9


def test_penetration_backtrack_noop_and_grads():
    """With nothing penetrating, backtrack on == off bit-identically, and
    gradients flow through the accepted step."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(gravity=(0.0, G), restitution=0.3)
    cfg_on = SimConfig(penetration_backtrack=True)
    cfg_off = SimConfig()
    p0 = np.array([[[0., 0., -5.], [0., 0., 0.]],
                   [[0., 1., -4.], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.zeros((2, 2, 3)),
                        t=jnp.zeros((2,)))
    s_on = jax.jit(make_step_batched(static, cfg_on))
    s_off = jax.jit(make_step_batched(static, cfg_off))
    o_on, d_on = s_on(params, states, DT)
    o_off, _ = s_off(params, states, DT)
    np.testing.assert_array_equal(np.asarray(o_on.p), np.asarray(o_off.p))
    np.testing.assert_array_equal(np.asarray(o_on.v), np.asarray(o_off.v))
    assert int(jnp.max(d_on.halvings)) == 0

    step_on = make_step_batched(static, cfg_on)

    def loss(mass):
        pr = params.__class__(**{**params.__dict__,
                                 "mass": params.mass.at[0].set(mass)})
        out, _ = step_on(pr, states, DT)
        return jnp.sum(out.p ** 2) + jnp.sum(out.v ** 2)

    g = jax.grad(loss)(1.0)
    assert np.isfinite(float(g))


def test_penetration_backtrack_dt_gradient():
    """Worlds that accept the FULL step keep the exact d/d(dt) of the
    plain path with backtrack on (code-review r3: dt_full's stop_gradient
    used to sever it to exactly 0); a halved dt is a data-dependent
    choice and stays stop-gradient."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(gravity=(0.0, G), restitution=0.3)
    p0 = np.array([[[0., 0., -5.], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.zeros((1, 2, 3)),
                        t=jnp.zeros((1,)))

    def loss_of(cfg):
        bstep = make_step_batched(static, cfg)

        def loss(dt):
            out, _ = bstep(params, states, dt)
            return jnp.sum(out.p ** 2)
        return loss

    g_on = jax.grad(loss_of(SimConfig(penetration_backtrack=True)))(DT)
    g_off = jax.grad(loss_of(SimConfig()))(DT)
    assert abs(float(g_off)) > 1e-8          # dt genuinely matters here
    np.testing.assert_allclose(float(g_on), float(g_off), rtol=1e-10)


def test_penetration_backtrack_exhaustion_signal():
    """When the halving budget cannot cure fresh penetration, halvings
    reports max_dt_halvings + 1 — the unambiguous exhaustion signal (a
    world CAN legitimately be accepted at exactly max_dt_halvings
    halvings, so max_h alone could not distinguish the two;
    code-review r3 x2)."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(gravity=(0.0, G), restitution=0.0)
    tol = 1e-6
    # max_dt_halvings=1 with a deep fast impact (speculative off, so the
    # overlap-only activation overshoots): ground top at y=-1, ball
    # radius 1 starting at y=-2.4 with v=30 moves 1.5 at dt=0.05
    # (penetration ~1.1) and 0.75 at dt=0.025 (penetration ~0.35) — one
    # halving deterministically cannot cure it, the budget exhausts.
    cfg = SimConfig(speculative=False, tol=tol,
                    penetration_backtrack=True, max_dt_halvings=1)
    p0 = np.array([[[0., 0., -2.4], [0., 0., 0.]]])
    v0 = np.array([[[0., 0., 30.0], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.asarray(v0),
                        t=jnp.zeros((1,)))
    out, diag = jax.jit(make_step_batched(static, cfg))(params, states,
                                                        0.05)
    fresh = float(diag.max_penetration[0] - diag.pre_penetration[0])
    assert fresh > tol, "scenario must exhaust the budget to test it"
    assert int(diag.halvings[0]) == cfg.max_dt_halvings + 1


def test_contact_free_fast_path_matches_solver():
    """contact_free_fast_path dispatches a tile with zero active contact
    rows to the closed-form equality solve (core/step.py::_equality_solve)
    via lax.cond.  Trajectories and gradients must match the always-solve
    path through a rollout that starts contact-free, collides mid-way
    (cond flips to the LCP branch), and separates again."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = circle_world(2, gravity=(0.0, 0.0), restitution=0.5)
    p0 = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2.6, 0.0]])
    v0 = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]])
    B = 3
    states = WorldState(p=jnp.stack([p0] * B), v=jnp.stack([v0] * B),
                        t=jnp.zeros((B,)))

    def run_traj(flag):
        step = jax.jit(make_step_batched(
            static, SimConfig(contact_free_fast_path=flag)))
        s = states
        for _ in range(20):
            s, _ = step(params, s, 1.0 / 30.0)
        return s

    s_on, s_off = run_traj(True), run_traj(False)
    # collision actually happened (restitution 0.5 bounce)
    assert float(s_on.v[0, 0, 1]) < -0.45
    np.testing.assert_allclose(np.asarray(s_on.p), np.asarray(s_off.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(s_on.v), np.asarray(s_off.v),
                               atol=1e-12)

    def grad_of(flag):
        step = make_step_batched(
            static, SimConfig(contact_free_fast_path=flag))

        def loss(mass):
            pr = params.__class__(**{**params.__dict__, "mass": mass})
            fs, _ = rollout(step, pr, states, 1.0 / 30.0, 5)
            return jnp.sum(fs.p ** 2)

        return jax.jit(jax.grad(loss))(params.mass)

    np.testing.assert_allclose(np.asarray(grad_of(True)),
                               np.asarray(grad_of(False)), atol=1e-12)


def test_contact_free_fast_path_with_joints():
    """q > 0 exercises the ridge-regularized equality-KKT closed form: a
    jointed, contact-free world must step identically (to solver tol)
    with the fast path on and off, and the joint must stay satisfied."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(gravity=(0.0, G))
    # dynamic body far above the ground: no contact rows active, but the
    # ground's TotalConstraint keeps q = 3 equality rows in the system
    p0 = np.array([[[0.0, 0.0, -30.0], [0.0, 0.0, 0.0]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.zeros((1, 2, 3)),
                        t=jnp.zeros((1,)))
    outs = {}
    for flag in (True, False):
        step = jax.jit(make_step_batched(
            static, SimConfig(contact_free_fast_path=flag)))
        outs[flag], _ = step(params, states, DT)
    np.testing.assert_allclose(np.asarray(outs[True].v),
                               np.asarray(outs[False].v), atol=1e-7)
    # the held ground body does not move on the fast path
    np.testing.assert_allclose(np.asarray(outs[True].v[0, 1]),
                               np.zeros(3), atol=1e-9)


def test_aabb_predicate_boundary_matches_solver():
    """AABB-gated dispatch boundary case: two circles whose AABBs overlap
    (diagonal offset < box reach) but that do NOT touch.  The conservative
    predicate sends the tile down the solver branch, which must still
    produce the exact equality solution and zero contact diagnostics —
    identical to fast path off and to a truly-free configuration."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = circle_world(2, gravity=(0.0, G), restitution=0.5)
    # centers 1.9 apart on EACH axis: AABB overlap (radius 1 boxes touch
    # within 2.0 per axis) but center distance 2.69 > 2 -> no contact.
    p0 = jnp.asarray([[0.0, 0.0, 0.0], [0.0, 1.9, 1.9]])
    states = WorldState(p=jnp.stack([p0] * 2),
                        v=jnp.zeros((2, 2, 3)), t=jnp.zeros((2,)))
    s_on = jax.jit(make_step_batched(
        static, SimConfig(contact_free_fast_path=True)))
    s_off = jax.jit(make_step_batched(
        static, SimConfig(contact_free_fast_path=False)))
    o_on, d_on = s_on(params, states, DT)
    o_off, d_off = s_off(params, states, DT)
    np.testing.assert_allclose(np.asarray(o_on.p), np.asarray(o_off.p),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(o_on.v), np.asarray(o_off.v),
                               atol=1e-12)
    assert int(jnp.max(d_on.n_contacts)) == 0
    np.testing.assert_allclose(np.asarray(d_on.pre_penetration), 0.0)


def test_penetration_backtrack_hulls():
    """In-jit backtrack with the SAT/clipping narrowphase: a fast unit
    box that would tunnel deep into the ground in one full step gets a
    halved dt (hull-hull contacts flow through the same conservative
    AABB gate and diagnostics as circles)."""
    from lcp_physics_tpu.core import make_step_batched

    static, params = box_ground_world(body_kind="box", gravity=(0.0, G),
                                      restitution=0.0)
    tol = 1e-6
    cfg_off = SimConfig(speculative=False, tol=tol)
    cfg_on = SimConfig(speculative=False, tol=tol,
                       penetration_backtrack=True, max_dt_halvings=8)
    p0 = np.array([[[0., 0., -2.4], [0., 0., 0.]]])
    v0 = np.array([[[0., 0., 12.0], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.asarray(v0),
                        t=jnp.zeros((1,)))
    dt = 0.05
    _, d_off = jax.jit(make_step_batched(static, cfg_off))(params, states,
                                                           dt)
    out_on, d_on = jax.jit(make_step_batched(static, cfg_on))(params,
                                                              states, dt)
    assert float(d_off.max_penetration[0]) > 0.05      # plain step sinks
    fresh = float(d_on.max_penetration[0] - d_on.pre_penetration[0])
    assert (float(d_on.max_penetration[0]) <= tol or fresh <= tol)
    assert 1 <= int(d_on.halvings[0]) <= 8
    assert float(out_on.t[0]) < dt - 1e-9


def test_fuzz_random_scenes_stay_finite_and_bounded():
    """Property fuzz over randomized mixed scenes (circles + boxes,
    random masses/restitutions/frictions/velocities): batched rollouts
    must stay finite, never deep-penetrate (speculative contacts bound
    fresh penetration), and conserve linear momentum in gravity-free
    worlds (internal contact impulses are equal-and-opposite)."""
    from lcp_physics_tpu.core import make_step_batched
    from lcp_physics_tpu.parallel import tile_state

    rng = np.random.default_rng(42)
    for trial in range(3):
        n = int(rng.integers(4, 9))
        counts = [1 if rng.random() < 0.5 else 4 for _ in range(n)]
        verts = np.zeros((n, 4, 2))
        radius = np.zeros(n)
        for k, c in enumerate(counts):
            if c == 1:
                radius[k] = rng.uniform(0.5, 1.2)
            else:
                h = rng.uniform(0.5, 1.2, 2)
                verts[k] = [[-h[0], -h[1]], [h[0], -h[1]],
                            [h[0], h[1]], [-h[0], h[1]]]
        static = make_scene_static(counts, c_max=32)
        gravity = (0.0, 0.0) if trial == 0 else (0.0, G)
        params = default_params(
            static, verts=verts, radius=radius,
            mass=rng.uniform(0.5, 3.0, n),
            restitution=rng.uniform(0.0, 0.9, n),
            fric_coeff=rng.uniform(0.0, 1.0, n), gravity=gravity)
        # random cluster, bodies within a few radii of each other
        pos = rng.uniform(0.0, 3.0 * n, (n, 2))
        p0 = np.concatenate([rng.uniform(-1, 1, (n, 1)), pos], -1)
        v0 = np.concatenate([rng.normal(0, 1, (n, 1)),
                             rng.normal(0, 3, (n, 2))], -1)
        state = WorldState(p=jnp.asarray(p0), v=jnp.asarray(v0),
                           t=jnp.zeros(()))
        states = tile_state(state, 4)
        bstep = jax.jit(make_step_batched(static, SimConfig()))
        s, max_post = states, 0.0
        for _ in range(40):
            s, diag = bstep(params, s, 0.01)
            max_post = max(max_post, float(jnp.max(diag.max_penetration)))
        assert bool(jnp.all(jnp.isfinite(s.p))), f"trial {trial}: NaN p"
        assert bool(jnp.all(jnp.isfinite(s.v))), f"trial {trial}: NaN v"
        # speculative contacts keep fresh penetration ~one-step-bounded
        assert max_post < 0.3, f"trial {trial}: penetration {max_post}"
        if gravity == (0.0, 0.0):
            m = np.asarray(params.mass)
            mom0 = (m[:, None] * np.asarray(state.v[:, 1:3])).sum(0)
            mom1 = (m[None, :, None]
                    * np.asarray(s.v[:, :, 1:3])).sum(1)
            np.testing.assert_allclose(
                mom1, np.broadcast_to(mom0, mom1.shape), rtol=0, atol=1e-6)


def test_rollout_diagnostics_surface_backtrack():
    """VERDICT r3 missing #5: scan rollouts used to DROP StepDiagnostics,
    making the in-jit backtrack's halvings/exhaustion signal invisible in
    exactly the mode it serves.  ``rollout(..., with_diagnostics=True)``
    and ``parallel.batched_rollout(..., with_diagnostics=True)`` return
    the reduced-over-time diagnostics: a tunneling world must surface
    max_halvings > 0 from inside the scan."""
    from lcp_physics_tpu.core import make_step_batched, rollout
    from lcp_physics_tpu.parallel import batched_rollout

    static, params = box_ground_world(gravity=(0.0, G), restitution=0.0)
    tol = 1e-6
    cfg = SimConfig(speculative=False, tol=tol,
                    penetration_backtrack=True, max_dt_halvings=8)
    dt = 0.05
    # world 0: fast ball slamming into the ground (backtracks);
    # world 1: ball far away (never backtracks).
    p0 = np.array([[[0., 0., -2.4], [0., 0., 0.]],
                   [[0., 0., -30.], [0., 0., 0.]]])
    v0 = np.array([[[0., 0., 12.0], [0., 0., 0.]],
                   [[0., 0., 0.], [0., 0., 0.]]])
    states = WorldState(p=jnp.asarray(p0), v=jnp.asarray(v0),
                        t=jnp.zeros((2,)))

    bstep = make_step_batched(static, cfg)
    final, traj, rd = jax.jit(
        lambda p_, s: rollout(bstep, p_, s, dt, 4, with_diagnostics=True)
    )(params, states)
    assert traj.p.shape[0] == 4
    assert int(rd.max_halvings[0]) >= 1
    assert int(rd.max_halvings[1]) == 0
    assert float(rd.max_penetration[0]) < 1e-3
    # contact counter: n_contacts counts depth > 0 at the INPUT state, and
    # the backtrack accepts sub-steps that keep penetration <= tol, so the
    # impacting world may legitimately report 0; the far world must.
    assert int(rd.total_contacts[1]) == 0
    # within budget: the exhaustion sentinel (max_h + 1) must NOT appear
    assert int(rd.max_halvings[0]) <= cfg.max_dt_halvings

    # same surface through parallel.batched_rollout
    final2, traj2, rd2 = batched_rollout(static, cfg, params, states, dt, 4,
                                         with_diagnostics=True)
    np.testing.assert_allclose(np.asarray(final2.p), np.asarray(final.p),
                               atol=1e-12)
    assert int(rd2.max_halvings[0]) == int(rd.max_halvings[0])
    # the 2-tuple signature is unchanged when the flag is off
    out = batched_rollout(static, cfg, params, states, dt, 2)
    assert len(out) == 2
