"""Solver-level unit tests: KKT optimality of the PDIPM forward solve on
random QP and mixed-LCP instances (SURVEY.md §4 test plan, item 1)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcp_physics_tpu.lcp import lcp_solve_full, pdipm_solve, solve_eq_kkt


def random_qp(rng, n, m, q, with_F=False):
    """Generate a strictly feasible random QP/LCP instance."""
    L = rng.standard_normal((n, n))
    Q = L @ L.T + n * np.eye(n)
    p = rng.standard_normal(n)
    G = rng.standard_normal((m, n))
    z0 = rng.standard_normal(n)
    s0 = rng.uniform(0.5, 1.5, m)
    h = G @ z0 + s0  # strictly feasible
    if q:
        A = rng.standard_normal((q, n))
        b = A @ z0
    else:
        A = np.zeros((0, n))
        b = np.zeros((0,))
    if with_F:
        # Skew coupling keeps lam^T F lam = 0 (monotone LCP), mirroring the
        # friction-cone structure the engine produces.
        S = rng.standard_normal((m, m))
        F = S - S.T
    else:
        F = np.zeros((m, m))
    return tuple(map(jnp.asarray, (Q, p, G, h, A, b, F)))


def check_kkt(Q, p, G, h, A, b, F, sol, tol=1e-6):
    z, s, lam, nu = sol.z, sol.s, sol.lam, sol.nu
    np.testing.assert_allclose(
        Q @ z + p + G.T @ lam + A.T @ nu, 0, atol=tol)
    np.testing.assert_allclose(G @ z + F @ lam + s - h, 0, atol=tol)
    if A.shape[0]:
        np.testing.assert_allclose(A @ z - b, 0, atol=tol)
    assert float(jnp.min(s)) >= -tol
    assert float(jnp.min(lam)) >= -tol
    assert float(jnp.max(s * lam)) < 1e-5


@pytest.mark.parametrize("n,m,q", [(5, 3, 0), (8, 6, 2), (12, 20, 4)])
def test_qp_kkt_optimality(n, m, q):
    rng = np.random.default_rng(0)
    for trial in range(5):
        Q, p, G, h, A, b, F = random_qp(rng, n, m, q)
        sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=25, tol=1e-10)
        check_kkt(Q, p, G, h, A, b, F, sol)


@pytest.mark.parametrize("n,m,q", [(6, 4, 0), (10, 8, 3)])
def test_lcp_with_F_kkt(n, m, q):
    rng = np.random.default_rng(1)
    for trial in range(5):
        Q, p, G, h, A, b, F = random_qp(rng, n, m, q, with_F=True)
        sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=30, tol=1e-10)
        check_kkt(Q, p, G, h, A, b, F, sol)


def test_matches_unconstrained_when_inactive():
    """With h huge, all constraints inactive: z = -Q^{-1} p exactly."""
    rng = np.random.default_rng(2)
    Q, p, G, h, A, b, F = random_qp(rng, 7, 4, 0)
    h = h + 1e3
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=25, tol=1e-11)
    np.testing.assert_allclose(sol.z, -jnp.linalg.solve(Q, p), atol=1e-6)


def test_equality_only_path():
    rng = np.random.default_rng(3)
    n, q = 6, 2
    L = rng.standard_normal((n, n))
    Q = jnp.asarray(L @ L.T + n * np.eye(n))
    p = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((q, n)))
    b = jnp.asarray(rng.standard_normal(q))
    z, nu = solve_eq_kkt(Q, p, A, b)
    np.testing.assert_allclose(Q @ z + p + A.T @ nu, 0, atol=1e-8)
    np.testing.assert_allclose(A @ z - b, 0, atol=1e-8)
    # m == 0 route through pdipm_solve agrees
    sol = pdipm_solve(Q, p, jnp.zeros((0, n)), jnp.zeros((0,)), A, b,
                      jnp.zeros((0, 0)), max_iter=10, tol=1e-10)
    np.testing.assert_allclose(sol.z, z, atol=1e-8)


def test_padded_inactive_rows_are_harmless():
    """The engine pads unused contact slots as zero G rows with h = 1;
    solutions must match the unpadded problem."""
    rng = np.random.default_rng(4)
    n, m, q = 8, 5, 2
    Q, p, G, h, A, b, F = random_qp(rng, n, m, q)
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=25, tol=1e-10)

    pad = 7
    Gp = jnp.concatenate([G, jnp.zeros((pad, n))])
    hp = jnp.concatenate([h, jnp.ones(pad)])
    Fp = jnp.zeros((m + pad, m + pad)).at[:m, :m].set(F)
    solp = pdipm_solve(Q, p, Gp, hp, A, b, Fp, max_iter=25, tol=1e-10)
    np.testing.assert_allclose(solp.z, sol.z, atol=1e-6)
    np.testing.assert_allclose(solp.lam[m:], 0, atol=1e-6)


def test_vmap_batched_matches_loop():
    rng = np.random.default_rng(5)
    n, m, q, B = 6, 5, 2, 8
    instances = [random_qp(rng, n, m, q, with_F=True) for _ in range(B)]
    stacked = [jnp.stack(xs) for xs in zip(*instances)]

    batched = jax.vmap(
        lambda Q, p, G, h, A, b, F: pdipm_solve(
            Q, p, G, h, A, b, F, max_iter=25, tol=1e-10).z)
    z_batch = batched(*stacked)
    for i, (Q, p, G, h, A, b, F) in enumerate(instances):
        z_i = pdipm_solve(Q, p, G, h, A, b, F, max_iter=25, tol=1e-10).z
        np.testing.assert_allclose(z_batch[i], z_i, atol=1e-7)


def test_jit_compiles_and_matches():
    rng = np.random.default_rng(6)
    Q, p, G, h, A, b, F = random_qp(rng, 6, 4, 2)
    f = jax.jit(lambda *xs: pdipm_solve(*xs, max_iter=25, tol=1e-10).z)
    np.testing.assert_allclose(
        f(Q, p, G, h, A, b, F),
        pdipm_solve(Q, p, G, h, A, b, F, max_iter=25, tol=1e-10).z,
        atol=1e-9)


def test_lcp_solve_full_diagnostics():
    rng = np.random.default_rng(7)
    Q, p, G, h, A, b, F = random_qp(rng, 6, 4, 0)
    sol = lcp_solve_full(Q, p, G, h, F=F, max_iter=25, tol=1e-10)
    assert float(sol.mu) < 1e-8
    assert float(sol.resid) < 1e-6
    assert int(sol.iters) < 25


def test_diag_q_schur_path_matches_dense():
    """Passing Q as a diagonal activates the Schur fast path; solutions and
    gradients must match the dense-Q path."""
    from lcp_physics_tpu.lcp import lcp_solve

    rng = np.random.default_rng(21)
    n, m, q = 6, 5, 2
    qd = jnp.asarray(rng.uniform(0.5, 3.0, n))
    Q = jnp.diag(qd)
    p = jnp.asarray(rng.standard_normal(n))
    G = jnp.asarray(rng.standard_normal((m, n)))
    z0 = rng.standard_normal(n)
    h = jnp.asarray(G @ z0 + rng.uniform(0.5, 1.5, m))
    A = jnp.asarray(rng.standard_normal((q, n)))
    b = jnp.asarray(A @ z0)
    S = rng.standard_normal((m, m))
    F = jnp.asarray(S - S.T)

    kw = dict(max_iter=30, tol=1e-11)
    z_dense = lcp_solve(Q, p, G, h, A, b, F, **kw)
    z_schur = lcp_solve(qd, p, G, h, A, b, F, **kw)
    np.testing.assert_allclose(z_schur, z_dense, atol=1e-7)

    g_dense = jax.grad(lambda p: lcp_solve(Q, p, G, h, A, b, F, **kw).sum())(p)
    g_schur = jax.grad(lambda p: lcp_solve(qd, p, G, h, A, b, F, **kw).sum())(p)
    np.testing.assert_allclose(g_schur, g_dense, atol=1e-7)

    # batched diagonal Q too
    B = 3
    qd_b = jnp.stack([qd * (1 + 0.1 * k) for k in range(B)])
    zb = lcp_solve(qd_b, jnp.stack([p] * B), jnp.stack([G] * B),
                   jnp.stack([h] * B), jnp.stack([A] * B),
                   jnp.stack([b] * B), jnp.stack([F] * B), **kw)
    z0_single = lcp_solve(qd_b[0], p, G, h, A, b, F, **kw)
    np.testing.assert_allclose(zb[0], z0_single, atol=1e-9)


def test_row_mask_pins_padding_and_matches_unmasked():
    """Padded rows (zero G/F row, h > 0) pinned at s = h, lam ~ 0 and
    excluded from convergence: results match the unmasked solve on the
    real rows, and an all-padding instance converges in zero iterations."""
    import numpy as np
    from lcp_physics_tpu.lcp import lcp_solve_full

    rng = np.random.default_rng(5)
    B, n, m_real, m_pad = 4, 6, 4, 12
    m = m_real + m_pad
    q_diag = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    p = jnp.asarray(rng.standard_normal((B, n)))
    G = jnp.zeros((B, m, n)).at[:, :m_real].set(
        rng.standard_normal((B, m_real, n)))
    h = jnp.ones((B, m)).at[:, :m_real].set(
        jnp.einsum("bmn,bn->bm", G[:, :m_real],
                   jnp.asarray(rng.standard_normal((B, n))))
        + jnp.asarray(rng.uniform(0.5, 1.5, (B, m_real))))
    mask = jnp.zeros((B, m)).at[:, :m_real].set(1.0)

    sol_m = lcp_solve_full(q_diag, p, G, h, max_iter=25, tol=1e-10,
                           q_is_diag=True, row_mask=mask)
    sol_u = lcp_solve_full(q_diag, p, G, h, max_iter=25, tol=1e-10,
                           q_is_diag=True)
    np.testing.assert_allclose(np.asarray(sol_m.z), np.asarray(sol_u.z),
                               rtol=1e-6, atol=1e-8)
    # padded rows sit exactly at their solution
    np.testing.assert_allclose(np.asarray(sol_m.s[:, m_real:]), 1.0,
                               atol=1e-12)
    assert float(jnp.max(sol_m.lam[:, m_real:])) < 1e-8
    # masked solve needs about the same iterations as unmasked here (the
    # big win is the few-active-rows case below); allow +-1 wiggle
    assert int(jnp.max(sol_m.iters)) <= int(jnp.max(sol_u.iters)) + 1

    # all-padding instance: converged at iteration zero
    sol_0 = lcp_solve_full(q_diag, p, jnp.zeros_like(G), jnp.ones((B, m)),
                           max_iter=25, tol=1e-10, q_is_diag=True,
                           row_mask=jnp.zeros((B, m)))
    assert int(jnp.max(sol_0.iters)) == 0
    # and the solution is the unconstrained minimizer -Q^-1 p
    np.testing.assert_allclose(np.asarray(sol_0.z),
                               np.asarray(-p / q_diag), rtol=1e-8)


def test_cone_f_matches_dense():
    """Structured friction-cone F (never materialized) must agree with the
    dense F it represents: matvec, solutions and gradients wrt mu."""
    import numpy as np
    from lcp_physics_tpu.lcp import ConeF, lcp_solve, lcp_solve_full

    rng = np.random.default_rng(3)
    B, n, C, fd = 5, 9, 4, 2
    m = C * (2 + fd)
    qd = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    p = jnp.asarray(rng.standard_normal((B, n)))
    valid = jnp.asarray((rng.random((B, C)) < 0.7).astype(float))
    mu = jnp.asarray(rng.uniform(0.3, 1.0, (B, C))) * valid
    Jc = rng.standard_normal((B, C, n)) * np.asarray(valid)[..., None]
    Jf = rng.standard_normal((B, fd * C, n)) \
        * np.tile(np.asarray(valid), fd)[..., None]
    G = jnp.asarray(np.concatenate([-Jc, -Jf, np.zeros((B, C, n))], axis=1))
    jcv = jnp.einsum("bcn,bn->bc", jnp.asarray(Jc), p)
    h = jnp.concatenate([jnp.where(valid > 0, 0.3 * jcv, 1.0),
                         jnp.where(jnp.tile(valid, (1, fd)) > 0, 0.0, 1.0),
                         jnp.where(valid > 0, 0.0, 1.0)], axis=-1)
    rmask = jnp.concatenate([valid, jnp.tile(valid, (1, fd)), valid], -1)
    Fc = ConeF(mu=mu, valid=valid, fd=fd)
    Fd = Fc.dense()
    lam_t = jnp.asarray(rng.standard_normal((B, m)))
    np.testing.assert_allclose(
        np.asarray(Fc.matvec(lam_t)),
        np.asarray(jnp.einsum("bij,bj->bi", Fd, lam_t)), atol=1e-13)

    kw = dict(max_iter=25, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask)
    sc = lcp_solve_full(qd, p, G, h, None, None, Fc, **kw)
    sd = lcp_solve_full(qd, p, G, h, None, None, Fd, **kw)
    np.testing.assert_allclose(np.asarray(sc.z), np.asarray(sd.z),
                               atol=1e-10)

    def loss(mu_, use_cone):
        F = ConeF(mu_, valid, fd)
        z = lcp_solve(qd, p, G, h, None, None,
                      F if use_cone else F.dense(), **kw)
        return jnp.sum(z ** 2)

    g_c = jax.grad(loss)(mu, True)
    g_d = jax.grad(loss)(mu, False)
    np.testing.assert_allclose(np.asarray(g_c), np.asarray(g_d), atol=1e-10)
    eps = 1e-6
    fd_ = (loss(mu.at[0, 0].add(eps), True)
           - loss(mu.at[0, 0].add(-eps), True)) / (2 * eps)
    np.testing.assert_allclose(float(g_c[0, 0]), float(fd_), rtol=1e-4)


def test_refine_matches_unrefined_f64():
    """Iterative refinement is a no-op at f64 precision (same solutions);
    the knob exists to recover f32 digits on TPU (PERF.md)."""
    from lcp_physics_tpu.lcp import lcp_solve

    rng = np.random.default_rng(8)
    n, m = 7, 5
    qd = jnp.asarray(rng.uniform(0.5, 2.0, n))
    p = jnp.asarray(rng.standard_normal(n))
    G = jnp.asarray(rng.standard_normal((m, n)))
    h = jnp.asarray(G @ rng.standard_normal(n) + rng.uniform(0.5, 1.5, m))
    z0 = lcp_solve(qd, p, G, h, max_iter=25, tol=1e-11, gamma_rows=0)
    z1 = lcp_solve(qd, p, G, h, max_iter=25, tol=1e-11, gamma_rows=0,
                   refine=1)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-9)


def test_stall_exit_returns_best_iterate():
    """Reference notImprovedLim semantics: with the per-instance stall
    exit on, a batch returns a solution whose KKT merit is no worse than
    the full-budget run's — the exit only saves the iterations a stalled
    instance would have wasted.  (Exact bitwise equality is NOT asserted:
    Mehrotra merit is non-monotone, so the full-budget run may
    legitimately find a better iterate after the stall window on some
    seeds/platforms — ADVICE r2.)"""
    rng = np.random.default_rng(11)
    n, m, q, B = 8, 6, 2, 5
    batch = [random_qp(rng, n, m, q, with_F=True) for _ in range(B)]
    args = tuple(jnp.stack([inst[k] for inst in batch]) for k in range(7))

    # Loose iteration budget + unreachably tight tol forces the plateau
    # regime where the stall exit matters.
    sol_off = pdipm_solve(*args, max_iter=25, tol=1e-30,
                          not_improved_lim=0)
    sol_on = pdipm_solve(*args, max_iter=25, tol=1e-30,
                         not_improved_lim=3)

    def merit(sol):
        """Same merit the solver tracks: duality mu + inf-norm residuals."""
        Q, p, G, h, A, b, F = (np.asarray(a) for a in args)
        z, s, lam, nu = (np.asarray(x) for x in (sol.z, sol.s, sol.lam,
                                                 sol.nu))
        rx = np.einsum("bij,bj->bi", Q, z) + p \
            + np.einsum("bmi,bm->bi", G, lam) \
            + np.einsum("bqi,bq->bi", A, nu)
        rz = np.einsum("bmi,bi->bm", G, z) \
            + np.einsum("bmk,bk->bm", F, lam) + s - h
        ry = np.einsum("bqi,bi->bq", A, z) - b
        mu = np.sum(s * lam, axis=-1) / s.shape[-1]
        return (mu + np.max(np.abs(rx), axis=-1)
                + np.max(np.abs(rz), axis=-1)
                + np.max(np.abs(ry), axis=-1, initial=0.0))

    m_on, m_off = merit(sol_on), merit(sol_off)
    # Stall-on must be within noise of (or better than) the full run.
    np.testing.assert_array_less(m_on, m_off + 1e-8)
    # and the exit actually fired somewhere (budget not exhausted)
    assert int(jnp.min(sol_on.iters)) < 25


def test_stall_rtol_saves_iterations_same_solution():
    """stall_rtol > 0 (plateau-creep exit, PERF.md round 4) may only cut
    iterations a strict-improvement run spends shaving <rtol per
    iteration near its floor: the returned solution must stay in the
    same accuracy class, and the iteration count must never go UP."""
    rng = np.random.default_rng(23)
    n, m, q, B = 8, 6, 2, 6
    batch = [random_qp(rng, n, m, q, with_F=True) for _ in range(B)]
    args = tuple(jnp.stack([inst[k] for inst in batch]) for k in range(7))

    # Unreachably tight tol + stall exit on: the strict run creeps at its
    # f64 floor, the rtol run exits once improvement falls below 2%.
    kw = dict(max_iter=25, tol=1e-30, not_improved_lim=2)
    sol_strict = pdipm_solve(*args, **kw)
    sol_rtol = pdipm_solve(*args, stall_rtol=0.02, **kw)

    # same solution class (both converged way past any physics tolerance)
    np.testing.assert_allclose(np.asarray(sol_rtol.z),
                               np.asarray(sol_strict.z),
                               rtol=1e-5, atol=1e-7)
    for inst in range(B):
        check_kkt(*(a[inst] for a in args),
                  jax.tree.map(lambda x: x[inst], sol_rtol), tol=1e-5)
    # the relaxed criterion can only stop the counter resetting EARLIER
    assert np.all(np.asarray(sol_rtol.iters)
                  <= np.asarray(sol_strict.iters))
    assert int(np.min(np.asarray(sol_rtol.iters))) < 25


def test_stall_rtol_fused_kernel_matches_loop():
    """The fused whole-IPM kernel (interpret mode off-TPU) honors
    stall_rtol with the same semantics as the packed XLA loop."""
    rng = np.random.default_rng(5)
    B, n, C = 4, 9, 4
    qd, p, G, h, F, rmask = _engine_layout_instance(rng, B, n, C)
    kw = dict(max_iter=20, tol=1e-30, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, not_improved_lim=2, stall_rtol=0.05)
    sol_x = lcp_solve_full(qd, p, G, h, None, None, F, backend="xla", **kw)
    sol_f = lcp_solve_full(qd, p, G, h, None, None, F, backend="fused",
                           **kw)
    np.testing.assert_allclose(np.asarray(sol_f.z), np.asarray(sol_x.z),
                               rtol=2e-4, atol=2e-6)
    # the relaxed stall criterion fires in the kernel too
    assert int(np.max(np.asarray(sol_f.iters))) < 20


def test_lazy_block_assembly_matches_xla():
    """The lazy block-grid Schur assembly (backend='pallas', blocked size,
    refine=0 — S_red never materialized) must match the dense-assembly
    'xla' path on an engine-layout cone system."""
    from lcp_physics_tpu.lcp import ConeF, lcp_solve_full

    rng = np.random.default_rng(7)
    B, n, C, fd = 3, 12, 32, 2          # K = C*(1+fd) = 96 > MAX_LANE_N
    m = C * (2 + fd)
    qd = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    p = jnp.asarray(rng.standard_normal((B, n)))
    valid = jnp.asarray((rng.random((B, C)) < 0.8).astype(float))
    mu = jnp.asarray(rng.uniform(0.3, 1.0, (B, C))) * valid
    Jc = rng.standard_normal((B, C, n)) * np.asarray(valid)[..., None]
    Jf = rng.standard_normal((B, fd * C, n)) \
        * np.tile(np.asarray(valid), fd)[..., None]
    G = jnp.asarray(np.concatenate([-Jc, -Jf, np.zeros((B, C, n))], axis=1))
    jcv = jnp.einsum("bcn,bn->bc", jnp.asarray(Jc), p)
    h = jnp.concatenate([jnp.where(valid > 0, 0.3 * jcv, 1.0),
                         jnp.where(jnp.tile(valid, (1, fd)) > 0, 0.0, 1.0),
                         jnp.where(valid > 0, 0.0, 1.0)], axis=-1)
    rmask = jnp.concatenate([valid, jnp.tile(valid, (1, fd)), valid], -1)
    F = ConeF(mu=mu, valid=valid, fd=fd)
    kw = dict(max_iter=20, tol=1e-10, q_is_diag=True, gamma_rows=C,
              row_mask=rmask)
    sp = lcp_solve_full(qd, p, G, h, None, None, F, backend="pallas", **kw)
    sx = lcp_solve_full(qd, p, G, h, None, None, F, backend="xla", **kw)
    np.testing.assert_allclose(np.asarray(sp.z), np.asarray(sx.z),
                               atol=5e-8)


def test_factor_precision_knob_plumbs_through():
    """factor_precision reaches the forward factorization (trace-time
    ambient precision) without changing results on CPU (where f32 matmuls
    are exact regardless); gradients still flow.  The accuracy effect is
    TPU-only (PERF.md round-3 merit-floor finding)."""
    rng = np.random.default_rng(12)
    n, m, q = 8, 6, 2
    Q, p, G, h, A, b, F = random_qp(rng, n, m, q)
    qd = jnp.asarray(np.diag(np.asarray(Q)))

    from lcp_physics_tpu.lcp import lcp_solve

    z0 = lcp_solve(qd, p, G, h, A, b, None, q_is_diag=True, max_iter=25,
                   tol=1e-10)
    z1 = lcp_solve(qd, p, G, h, A, b, None, q_is_diag=True, max_iter=25,
                   tol=1e-10, factor_precision="highest")
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-9)

    g = jax.grad(lambda hh: jnp.sum(lcp_solve(
        qd, p, G, hh, A, b, None, q_is_diag=True, max_iter=25, tol=1e-10,
        factor_precision="highest") ** 2))(h)
    assert np.all(np.isfinite(np.asarray(g)))


def _engine_layout_instance(rng, B, n, C, fd=2):
    """Random batch with the ENGINE's row structure: G = [-Jc; -Jf1; -Jf2;
    0_gamma] with Jf2 = -Jf1 bit-exactly (orthogonal_tangents returns
    (+t, -t)), ConeF coupling, padded rows via valid mask."""
    from lcp_physics_tpu.lcp import ConeF

    qd = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    p = jnp.asarray(rng.standard_normal((B, n)))
    valid = jnp.asarray((rng.random((B, C)) < 0.8).astype(float))
    mu = jnp.asarray(rng.uniform(0.3, 1.0, (B, C))) * valid
    Jc = rng.standard_normal((B, C, n)) * np.asarray(valid)[..., None]
    Jf1 = rng.standard_normal((B, C, n)) * np.asarray(valid)[..., None]
    Jf = np.concatenate([Jf1, -Jf1], axis=1)
    G = jnp.asarray(np.concatenate([-Jc, -Jf, np.zeros((B, C, n))], axis=1))
    jcv = jnp.einsum("bcn,bn->bc", jnp.asarray(Jc), p)
    h = jnp.concatenate([jnp.where(valid > 0, 0.3 * jcv, 1.0),
                         jnp.where(jnp.tile(valid, (1, fd)) > 0, 0.0, 1.0),
                         jnp.where(valid > 0, 0.0, 1.0)], axis=-1)
    rmask = jnp.concatenate([valid, jnp.tile(valid, (1, fd)), valid], -1)
    F = ConeF(mu=mu, valid=valid, fd=fd)
    return qd, p, G, h, F, rmask


def test_fric_pair_rotation_matches_plain_gamma():
    """The friction-pair rotation elimination (third-level Schur,
    lcp/pdipm.py _rot_factor_factory) must reproduce the plain gamma
    path's solutions and gradients on engine-structured systems."""
    from lcp_physics_tpu.lcp import lcp_solve, lcp_solve_full

    rng = np.random.default_rng(23)
    B, n, C = 3, 12, 8
    qd, p, G, h, F, rmask = _engine_layout_instance(rng, B, n, C)
    kw = dict(max_iter=25, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, backend="xla")
    s0 = lcp_solve_full(qd, p, G, h, None, None, F, **kw)
    s1 = lcp_solve_full(qd, p, G, h, None, None, F, fric_pair=True, **kw)
    # different elimination order -> slightly different iterates; both
    # converge to the same KKT point within solver tolerance
    np.testing.assert_allclose(np.asarray(s1.z), np.asarray(s0.z),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.lam), np.asarray(s0.lam),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(s1.s), np.asarray(s0.s),
                               atol=1e-4)

    # gradients (implicit KKT backward goes through the rotated factor's
    # trans=1 solve): same as the plain path up to iterate differences,
    # and consistent with finite differences of the rot path itself.
    def loss(fp, h_):
        return jnp.sum(lcp_solve(qd, p, G, h_, None, None, F,
                                 fric_pair=fp, **kw) ** 2)

    g0 = jax.grad(lambda h_: loss(False, h_))(h)
    g1 = jax.grad(lambda h_: loss(True, h_))(h)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=1e-4)
    eps = 1e-6
    rng2 = np.random.default_rng(0)
    for _ in range(4):
        b_ = int(rng2.integers(0, h.shape[0]))
        k_ = int(rng2.integers(0, h.shape[1]))
        hp = h.at[b_, k_].add(eps)
        hm = h.at[b_, k_].add(-eps)
        fd_g = (loss(True, hp) - loss(True, hm)) / (2 * eps)
        np.testing.assert_allclose(float(g1[b_, k_]), float(fd_g),
                                   rtol=2e-3, atol=1e-5)


def test_fric_pair_rotation_lazy_blocked_path():
    """Rotation + lazy block-grid assembly (pallas interpret on CPU) must
    match the xla rotation path when K2 = 2C+q exceeds the lane kernel."""
    from lcp_physics_tpu.lcp import lcp_solve_full

    rng = np.random.default_rng(29)
    B, n, C = 2, 10, 64                   # K2 = 128 > MAX_LANE_N
    qd, p, G, h, F, rmask = _engine_layout_instance(rng, B, n, C)
    kw = dict(max_iter=20, tol=1e-10, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, fric_pair=True)
    sx = lcp_solve_full(qd, p, G, h, None, None, F, backend="xla", **kw)
    sp = lcp_solve_full(qd, p, G, h, None, None, F, backend="pallas", **kw)
    # pivotless vs pivoted factorization -> slightly different iterates
    np.testing.assert_allclose(np.asarray(sp.z), np.asarray(sx.z),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sp.lam), np.asarray(sx.lam),
                               atol=1e-4)


def test_gondzio_correctors_same_solution_fewer_iters():
    """Gondzio multiple centrality correctors (solver knob ``gondzio``)
    must reach the same KKT point as plain Mehrotra — they only reshape
    the path to it — and never increase the iteration count on a batch of
    well-posed instances (each corrector is accepted per instance only if
    it buys step length)."""
    rng = np.random.default_rng(31)
    B, n, m, q = 32, 12, 10, 3
    qd = jnp.asarray(np.abs(rng.standard_normal((B, n))) + 0.5)
    p = jnp.asarray(rng.standard_normal((B, n)))
    G = jnp.asarray(rng.standard_normal((B, m, n)))
    h = jnp.asarray(rng.standard_normal((B, m)) + 2.0)
    A = jnp.asarray(rng.standard_normal((B, q, n)))
    b = jnp.asarray(rng.standard_normal((B, q)))
    kw = dict(max_iter=40, tol=1e-10, q_is_diag=True, not_improved_lim=0)
    s0 = lcp_solve_full(qd, p, G, h, A, b, None, gondzio=0, **kw)
    s2 = lcp_solve_full(qd, p, G, h, A, b, None, gondzio=2, **kw)
    assert float(jnp.max(s0.resid)) < 1e-9
    assert float(jnp.max(s2.resid)) < 1e-9
    np.testing.assert_allclose(np.asarray(s2.z), np.asarray(s0.z),
                               atol=1e-7)
    assert float(jnp.mean(s2.iters)) <= float(jnp.mean(s0.iters))


def test_gondzio_engine_layout_and_gradients():
    """gondzio on the engine layout (diag Q + ConeF + gamma + row_mask +
    fric_pair) matches gondzio=0, and the implicit gradient is identical
    (the backward pass never sees the forward path)."""
    from lcp_physics_tpu.lcp import lcp_solve

    rng = np.random.default_rng(32)
    B, n, C = 4, 12, 6
    qd, p, G, h, F, rmask = _engine_layout_instance(rng, B, n, C)
    kw = dict(max_iter=30, tol=1e-10, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, fric_pair=True, backend="xla")

    def loss(p_, gz):
        return jnp.sum(lcp_solve(qd, p_, G, h, None, None, F,
                                 gondzio=gz, **kw) ** 2)

    z0 = lcp_solve(qd, p, G, h, None, None, F, gondzio=0, **kw)
    z2 = lcp_solve(qd, p, G, h, None, None, F, gondzio=2, **kw)
    np.testing.assert_allclose(np.asarray(z2), np.asarray(z0), atol=1e-7)
    g0 = jax.grad(loss)(p, 0)
    g2 = jax.grad(loss)(p, 2)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(g0),
                               rtol=1e-5, atol=1e-7)


def test_verbose_plumbs_through_and_is_solution_neutral(capfd):
    """VERDICT r3 weak #4: ``verbose`` is now honored on the public
    surfaces (lcp_solve / LCPFunction), forces the UNFUSED loop (the
    fused kernel has no print channel) and never changes the solution."""
    from lcp_physics_tpu.lcp import LCPFunction, lcp_solve

    rng = np.random.default_rng(33)
    B, n, C = 4, 12, 6
    qd, p, G, h, F, rmask = _engine_layout_instance(rng, B, n, C)
    kw = dict(max_iter=15, tol=1e-10, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, fric_pair=True)
    z_quiet = lcp_solve(qd, p, G, h, None, None, F, **kw)
    capfd.readouterr()  # drop anything buffered so far
    # backend='fused' + verbose: the fused dispatch must yield to the
    # unfused loop instead of silently dropping the dump.
    z_loud = lcp_solve(qd, p, G, h, None, None, F, verbose=True,
                       backend="fused", **kw)
    np.testing.assert_allclose(np.asarray(z_loud), np.asarray(z_quiet),
                               atol=1e-9)
    out = capfd.readouterr()
    assert "pdipm iter" in out.out + out.err

    # reference-parity shim: LCPFunction(verbose=) reaches the same dump
    rngq = np.random.default_rng(34)
    Q, pq, Gq, hq, Aq, bq, Fq = random_qp(rngq, 6, 4, 2)
    fn = LCPFunction(verbose=1, maxIter=10)
    z1 = fn(Q, pq, Gq, hq, Aq, bq, Fq)
    out = capfd.readouterr()
    assert "pdipm iter" in out.out + out.err
    z0 = LCPFunction(maxIter=10)(Q, pq, Gq, hq, Aq, bq, Fq)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z0), atol=1e-9)
