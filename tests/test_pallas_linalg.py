"""Pallas lane-batched LU kernels vs the pivoted XLA path (interpret mode
on CPU; the same code runs compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lcp_physics_tpu.ops.linalg import plu_factor, plu_solve


def kkt_like_batch(B, n, m, rng):
    """Random regularized quasi-definite KKT matrices (the class the IPM
    produces): [[Q, G^T], [G, -D]]."""
    nk = n + m
    K = np.zeros((B, nk, nk), np.float32)
    for b in range(B):
        L = rng.standard_normal((n, n)).astype(np.float32)
        Q = L @ L.T + n * np.eye(n, dtype=np.float32)
        G = rng.standard_normal((m, n)).astype(np.float32)
        D = np.diag(rng.uniform(0.1, 10.0, m).astype(np.float32))
        K[b, :n, :n] = Q
        K[b, :n, n:] = G.T
        K[b, n:, :n] = G
        K[b, n:, n:] = -D
    return jnp.asarray(K)


@pytest.mark.parametrize("B,n,m", [(3, 5, 3), (2, 11, 6)])
def test_plu_solve_matches_dense(B, n, m):
    rng = np.random.default_rng(0)
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac = plu_factor(K)
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)


def test_plu_solve_transpose():
    rng = np.random.default_rng(1)
    B, n, m = 2, 6, 4
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac = plu_factor(K)
    x = plu_solve(fac, r, trans=1)
    x_ref = jnp.linalg.solve(jnp.swapaxes(K, -1, -2), r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=2e-4, atol=2e-4)


def test_plu_in_pdipm_backend():
    """End-to-end: the 'pallas' backend solves the same LCP as 'xla'."""
    from lcp_physics_tpu.lcp import lcp_solve_full

    rng = np.random.default_rng(2)
    B, n, m = 2, 6, 4
    L = rng.standard_normal((B, n, n)).astype(np.float32)
    Q = jnp.asarray(L @ L.transpose(0, 2, 1) + n * np.eye(n, dtype=np.float32))
    p = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32))
    G = jnp.asarray(rng.standard_normal((B, m, n)).astype(np.float32))
    z0 = rng.standard_normal((B, n)).astype(np.float32)
    h = jnp.asarray(np.einsum("bmn,bn->bm", np.asarray(G), z0)
                    + rng.uniform(0.5, 1.5, (B, m)).astype(np.float32))

    sol_x = lcp_solve_full(Q, p, G, h, max_iter=15, tol=1e-6, backend="xla")
    sol_p = lcp_solve_full(Q, p, G, h, max_iter=15, tol=1e-6,
                           backend="pallas")
    np.testing.assert_allclose(np.asarray(sol_p.z), np.asarray(sol_x.z),
                               rtol=1e-3, atol=1e-3)


def test_blocked_lu_matches_dense():
    """Large systems route to the blocked per-world kernel."""
    rng = np.random.default_rng(3)
    B, n, m = 2, 80, 60  # nk = 140 > MAX_LANE_N -> blocked path
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac = plu_factor(K)
    assert fac[0] == "blocked"
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-3, atol=5e-3)
    xt = plu_solve(fac, r, trans=1)
    xt_ref = jnp.linalg.solve(jnp.swapaxes(K, -1, -2), r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_ref),
                               rtol=5e-3, atol=5e-3)


def test_blocked_lu_many_panels():
    """The T=9-panel regime (n > the old 896 ceiling — raised round 4
    after the bigworld probe measured a 20x XLA-fallback cliff at
    K2=1024) factors and solves correctly."""
    rng = np.random.default_rng(7)
    B, n, m = 1, 600, 500  # nk = 1100 -> T = 9 panels
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac = plu_factor(K)
    assert fac[0] == "blocked"
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-3, atol=5e-3)


def test_blocked_lu_at_cap():
    """T = 12 panels — the raised MAX_BLOCKED_N = 1536 ceiling itself
    (VERDICT r4 item 7: the top third of the round-4 raise was never
    correctness-tested; the round-5 bigworld probe measures its TPU
    throughput/compile cost)."""
    rng = np.random.default_rng(12)
    B, n, m = 1, 800, 700  # nk = 1500 -> T = 12 panels
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac = plu_factor(K)
    assert fac[0] == "blocked"
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=5e-3, atol=5e-3)


def test_blocked_lu_f64_precision():
    """f64 inputs keep f64 accumulation through the blocked path (ADVICE
    r1: preferred_element_type was hardcoded to f32, silently downcasting
    CPU x64 parity runs)."""
    rng = np.random.default_rng(4)
    B, n, m = 1, 80, 60
    K = jnp.asarray(np.asarray(kkt_like_batch(B, n, m, rng)), jnp.float64)
    r = jnp.asarray(rng.standard_normal((B, n + m)))
    fac = plu_factor(K)
    assert fac[0] == "blocked"
    assert all(x.dtype == jnp.float64 for x in jax.tree.leaves(fac[1]))
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    # f64 accumulation: residual far below anything f32 could reach
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-9, atol=1e-9)


def test_blocked_gj_kernel_matches_inverse():
    """The rank-b MXU Gauss-Jordan variant (GJ_BLOCKED) inverts correctly.

    On CPU the dispatch normally falls back to the scalar kernel; "force"
    runs the blocked kernel in interpret mode, where its dot_generals are
    f32-exact, so the comparison can be tight."""
    import lcp_physics_tpu.ops.linalg as linalg

    rng = np.random.default_rng(7)
    B, P = 8, 128
    K = jnp.asarray(
        rng.standard_normal((B, P, P)).astype(np.float32) * 0.1
        + np.eye(P, dtype=np.float32) * 6.0)
    old = linalg.GJ_BLOCKED
    try:
        linalg.GJ_BLOCKED = "force"
        inv = linalg._gj_inverse(K)
    finally:
        linalg.GJ_BLOCKED = old
    ref = np.linalg.inv(np.asarray(K, np.float64))
    np.testing.assert_allclose(np.asarray(inv), ref, rtol=2e-4, atol=2e-4)


def test_blocked_bf16_factor_storage():
    """plu_factor(solve_dtype=bf16) stores bf16 blocks; the solve still
    accumulates f32 and lands within bf16-direction tolerance of the f32
    factor (used for forward IPM iterations only — pdipm._fwd_store_dtype
    gates it off the backward path and off CPU)."""
    from lcp_physics_tpu.lcp.pdipm import _fwd_store_dtype

    rng = np.random.default_rng(3)
    B, n, m = 2, 80, 60  # nk = 140 -> blocked path
    K = kkt_like_batch(B, n, m, rng)
    r = jnp.asarray(rng.standard_normal((B, n + m)).astype(np.float32))
    fac16 = plu_factor(K, solve_dtype=jnp.bfloat16)
    assert fac16[0] == "blocked"
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(fac16[1]))
    x16 = plu_solve(fac16, r)
    assert x16.dtype == jnp.float32
    x32 = plu_solve(plu_factor(K), r)
    scale = float(jnp.max(jnp.abs(x32)))
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32),
                               atol=0.05 * scale)
    # CPU runs never turn the cast on implicitly
    assert _fwd_store_dtype(jnp.float32) is None
    assert _fwd_store_dtype(jnp.float64) is None


@pytest.mark.parametrize("n", [100, 250])   # T = 1 and T = 2 panels
def test_inv_factor_blocks_matches_dense(n):
    """Explicit-inverse factor mode (round 4): inv_factor_blocks over a
    lazy block source must solve K x = r and K^T x = r to the same class
    as the dense reference, for one- and two-panel systems."""
    from lcp_physics_tpu.ops.linalg import (PANEL, _ru, inv_factor_blocks,
                                            inv_supported)

    assert inv_supported(n)
    B = 2
    rng = np.random.default_rng(5)
    # f64 on CPU: the scalar GJ kernel path, precision-exact
    K = np.asarray(kkt_like_batch(B, n // 2, n - n // 2, rng),
                   np.float64)
    K = jnp.asarray(K)
    n_pad = _ru(n, PANEL)
    Kp = jnp.zeros((B, n_pad, n_pad), K.dtype).at[:, :n, :n].set(K)
    if n_pad > n:
        idx = jnp.arange(n, n_pad)
        Kp = Kp.at[:, idx, idx].set(1.0)

    def get_block(t, s):
        return Kp[:, t * PANEL:(t + 1) * PANEL, s * PANEL:(s + 1) * PANEL]

    fac = inv_factor_blocks(get_block, B, n, K.dtype)
    assert fac[0] == "inv"
    r = jnp.asarray(rng.standard_normal((B, n)))
    x = plu_solve(fac, r)
    x_ref = jnp.linalg.solve(K, r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-8, atol=1e-8)
    xt = plu_solve(fac, r, trans=1)
    xt_ref = jnp.linalg.solve(jnp.swapaxes(K, -1, -2), r[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(xt), np.asarray(xt_ref),
                               rtol=1e-8, atol=1e-8)
