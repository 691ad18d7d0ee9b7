"""Fused whole-IPM Pallas kernel vs the unfused solver loop (interpret
mode on CPU; the same kernel compiles on TPU).  The fused path must
reproduce the unfused path's solutions on engine-layout instances
(diag Q + ConeF + gamma elimination + row_mask), including with an
equality block and with padded rows."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcp_physics_tpu.lcp import ConeF, lcp_solve_full
from lcp_physics_tpu.lcp.pdipm import pdipm_solve


def engine_instance(rng, B, n, C, fd=2, q=0, valid_frac=0.7, pair=False):
    """pair=True builds the engine's ± friction-row structure
    (G_f2 = -G_f1 exactly), the precondition of the fric_pair rotation."""
    m = C * (2 + fd)
    qd = jnp.asarray(rng.uniform(0.5, 2.0, (B, n)))
    p = jnp.asarray(rng.standard_normal((B, n)))
    valid = jnp.asarray((rng.random((B, C)) < valid_frac).astype(float))
    mu = jnp.asarray(rng.uniform(0.3, 1.0, (B, C))) * valid
    Jc = rng.standard_normal((B, C, n)) * np.asarray(valid)[..., None]
    if pair:
        assert fd == 2
        Jf1 = rng.standard_normal((B, C, n)) \
            * np.asarray(valid)[..., None]
        Jf = np.concatenate([Jf1, -Jf1], axis=1)
    else:
        Jf = rng.standard_normal((B, fd * C, n)) \
            * np.tile(np.asarray(valid), fd)[..., None]
    G = jnp.asarray(np.concatenate([-Jc, -Jf, np.zeros((B, C, n))], 1))
    jcv = jnp.einsum("bcn,bn->bc", jnp.asarray(Jc), p)
    h = jnp.concatenate([jnp.where(valid > 0, 0.3 * jcv, 1.0),
                         jnp.where(jnp.tile(valid, (1, fd)) > 0, 0.0, 1.0),
                         jnp.where(valid > 0, 0.0, 1.0)], axis=-1)
    rmask = jnp.concatenate([valid, jnp.tile(valid, (1, fd)), valid], -1)
    if q:
        A = jnp.asarray(rng.standard_normal((B, q, n)))
        b = jnp.einsum("bqn,bn->bq", A,
                       jnp.asarray(rng.standard_normal((B, n)))) * 0.1
    else:
        A = jnp.zeros((B, 0, n))
        b = jnp.zeros((B, 0))
    F = ConeF(mu=mu, valid=valid, fd=fd)
    return qd, p, G, h, A, b, F, rmask


@pytest.mark.parametrize("q", [0, 3])
def test_fused_matches_unfused(q):
    rng = np.random.default_rng(17)
    B, n, C = 6, 9, 4
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C, q=q)
    kw = dict(max_iter=25, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask)
    ref = pdipm_solve(qd, p, G, h, A, b, F, backend="xla", **kw)
    fus = pdipm_solve(qd, p, G, h, A, b, F, backend="fused", **kw)
    np.testing.assert_allclose(np.asarray(fus.z), np.asarray(ref.z),
                               rtol=1e-7, atol=1e-8)
    np.testing.assert_allclose(np.asarray(fus.lam), np.asarray(ref.lam),
                               rtol=1e-6, atol=1e-7)
    assert float(jnp.max(fus.resid)) < 1e-8
    assert float(jnp.max(fus.mu)) < 1e-9
    # padded rows pinned exactly
    np.testing.assert_allclose(
        np.asarray(jnp.where(rmask > 0, 0.0, fus.s - h)), 0.0, atol=1e-12)


@pytest.mark.parametrize("q", [0, 3])
def test_fused_rot_matches_unfused(q):
    """The friction-pair ROTATED fused kernel (K = 2C + q) reproduces the
    plain xla solve on ±-pair instances."""
    rng = np.random.default_rng(31)
    B, n, C = 6, 9, 4
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C, q=q,
                                                  pair=True)
    kw = dict(max_iter=25, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask)
    ref = pdipm_solve(qd, p, G, h, A, b, F, backend="xla", **kw)
    fus = pdipm_solve(qd, p, G, h, A, b, F, backend="fused",
                      fric_pair=True, **kw)
    np.testing.assert_allclose(np.asarray(fus.z), np.asarray(ref.z),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(fus.lam), np.asarray(ref.lam),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.max(fus.resid)) < 1e-8
    assert float(jnp.max(fus.mu)) < 1e-9
    np.testing.assert_allclose(
        np.asarray(jnp.where(rmask > 0, 0.0, fus.s - h)), 0.0, atol=1e-12)


def test_fused_rot_larger_than_plain_cap():
    """A scene whose UNROTATED system exceeds MAX_FUSED_K but whose
    rotated system fits still dispatches to the fused kernel."""
    from lcp_physics_tpu.ops.ipm import MAX_FUSED_K, fused_supported

    C = MAX_FUSED_K // 3 + 2           # 3C > MAX_FUSED_K, 2C <= MAX
    assert not fused_supported(3 * C, 0, C, 2)
    assert fused_supported(3 * C, 0, C, 2, fric_pair=True)
    rng = np.random.default_rng(37)
    B, n = 3, 12
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C, pair=True)
    kw = dict(max_iter=25, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask)
    ref = pdipm_solve(qd, p, G, h, A, b, F, backend="xla", **kw)
    fus = pdipm_solve(qd, p, G, h, A, b, F, backend="fused",
                      fric_pair=True, **kw)
    np.testing.assert_allclose(np.asarray(fus.z), np.asarray(ref.z),
                               rtol=1e-6, atol=1e-7)


def test_fused_through_lcp_solve_full():
    """The public entry point routes to the fused kernel and returns the
    same diagnostics shape."""
    rng = np.random.default_rng(23)
    B, n, C = 4, 6, 3
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C)
    sol = lcp_solve_full(qd, p, G, h, None, None, F, max_iter=20,
                         tol=1e-10, q_is_diag=True, gamma_rows=C,
                         row_mask=rmask, backend="fused")
    ref = lcp_solve_full(qd, p, G, h, None, None, F, max_iter=20,
                         tol=1e-10, q_is_diag=True, gamma_rows=C,
                         row_mask=rmask, backend="xla")
    np.testing.assert_allclose(np.asarray(sol.z), np.asarray(ref.z),
                               rtol=1e-7, atol=1e-8)


@pytest.mark.parametrize("q", [0, 8])
def test_fused_iter_kernel_matches_xla(q, monkeypatch):
    """The fused per-ITERATION kernel (ops/ipm_iter.py: blocked explicit-
    inverse factor + one Pallas kernel per iteration) reproduces the xla
    loop on large rotated systems (K2 > MAX_FUSED_K, B a lane multiple).
    z is the unique QP solution and must match tightly; lam may differ on
    dual-degenerate instances, so optimality is asserted via the merit."""
    import lcp_physics_tpu.lcp.pdipm as pdipm_mod
    import lcp_physics_tpu.ops.ipm_iter as ipm_iter
    from lcp_physics_tpu.ops.ipm_iter import fused_iter_supported

    monkeypatch.setattr(pdipm_mod, "FUSE_ITER", True)
    B, n, C = 128, 64, 48                  # K2 = 96 + q > MAX_LANE_N
    assert fused_iter_supported(C, q, B)
    assert not fused_iter_supported(C, q, B - 8)     # lane-multiple gate
    calls = []
    orig = ipm_iter.fused_iter_ipm
    monkeypatch.setattr(ipm_iter, "fused_iter_ipm",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    rng = np.random.default_rng(11)
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C, q=q,
                                                  pair=True)
    kw = dict(max_iter=20, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, fric_pair=True)
    ref = pdipm_solve(qd, p, G, h, A, b, F, backend="xla", **kw)
    fus = pdipm_solve(qd, p, G, h, A, b, F, backend="pallas", **kw)
    assert calls, "fused per-iteration kernel was not dispatched"
    ref_merit = np.asarray(ref.resid + ref.mu)
    fus_merit = np.asarray(fus.resid + fus.mu)
    # no instance meaningfully worse than the unfused path
    np.testing.assert_array_less(fus_merit, ref_merit * 10 + 1e-8)
    ok = ref_merit < 1e-8
    assert ok.sum() >= int(0.9 * B)        # generator sanity
    np.testing.assert_allclose(np.asarray(fus.z)[ok],
                               np.asarray(ref.z)[ok], rtol=1e-5, atol=1e-6)
    # padded rows pinned exactly
    np.testing.assert_allclose(
        np.asarray(jnp.where(rmask > 0, 0.0, fus.s - h)), 0.0, atol=1e-12)


def test_fused_iter_gradients_match(monkeypatch):
    """Implicit-KKT gradients are forward-backend independent WHERE the
    two forwards land on the same KKT point: the gradient is a function
    of the solution, and on dual-degenerate instances the two paths may
    pick different (equally valid) lam with genuinely different implicit
    gradients — so the comparison is restricted to instances whose duals
    agree, and those must be the large majority."""
    from lcp_physics_tpu.lcp import lcp_solve
    import lcp_physics_tpu.lcp.pdipm as pdipm_mod
    import lcp_physics_tpu.ops.ipm_iter as ipm_iter

    monkeypatch.setattr(pdipm_mod, "FUSE_ITER", True)
    B, n, C = 128, 64, 48
    calls = []
    orig = ipm_iter.fused_iter_ipm
    monkeypatch.setattr(ipm_iter, "fused_iter_ipm",
                        lambda *a, **k: (calls.append(1), orig(*a, **k))[1])
    rng = np.random.default_rng(13)
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C, pair=True)
    kw = dict(max_iter=20, tol=1e-11, q_is_diag=True, gamma_rows=C,
              row_mask=rmask, fric_pair=True)

    def loss(h_, be):
        z = lcp_solve(qd, p, G, h_, None, None, F, backend=be, **kw)
        return jnp.sum(z ** 2)

    g_p = jax.grad(loss)(h, "pallas")
    assert calls
    g_x = jax.grad(loss)(h, "xla")
    s_p = pdipm_solve(qd, p, G, h, A, b, F, backend="pallas", **kw)
    s_x = pdipm_solve(qd, p, G, h, A, b, F, backend="xla", **kw)
    same = np.asarray(jnp.max(jnp.abs(s_p.lam - s_x.lam), -1)) < 1e-5
    assert same.sum() >= int(0.8 * B)
    np.testing.assert_allclose(np.asarray(g_p)[same], np.asarray(g_x)[same],
                               rtol=1e-4, atol=1e-5)


def test_fused_gradients_match():
    """custom_vjp gradients are backend-independent (implicit KKT): the
    fused forward must produce the same gradients as xla."""
    from lcp_physics_tpu.lcp import lcp_solve

    rng = np.random.default_rng(29)
    B, n, C = 3, 6, 3
    qd, p, G, h, A, b, F, rmask = engine_instance(rng, B, n, C)

    def loss(h_, be):
        z = lcp_solve(qd, p, G, h_, None, None, F, max_iter=25, tol=1e-11,
                      q_is_diag=True, gamma_rows=C, row_mask=rmask,
                      backend=be)
        return jnp.sum(z ** 2)

    g_f = jax.grad(loss)(h, "fused")
    g_x = jax.grad(loss)(h, "xla")
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_x),
                               rtol=1e-5, atol=1e-7)
