"""Differentiable LCP layer: implicit-gradient ``custom_vjp`` around the
batched PDIPM forward solve.

Parity target: reference ``lcp_physics/lcp/lcp.py`` (``LCPFunction``): the
forward runs the interior-point solver; the backward differentiates the KKT
optimality system at the epsilon-interior solution via the implicit function
theorem — ONE transposed KKT solve, never unrolling solver iterations
(SURVEY.md §3.2).

Derivation used by :func:`_lcp_bwd` (independent of the reference's code):
stationary conditions at the solution (z*, s*, lam*, nu*)

    r1 = Q z + p + G^T lam + A^T nu = 0
    r2 = G z + F lam + s - h        = 0
    r3 = A z - b                    = 0
    r4 = s o lam                    = 0   (epsilon-interior: ~ mu)

Eliminating the s-block of the transposed Jacobian gives

    K(d)^T w = [g; 0; 0],   d_inv = s*/lam*,

with K(d) the same reduced KKT matrix the last forward iteration used, and
then

    dL/dQ = -(w_z z^T)                    dL/dp = -w_z
    dL/dG = -(w_l z^T + lam w_z^T)        dL/dh = +w_l
    dL/dA = -(w_n z^T + nu w_z^T)         dL/db = +w_n
    dL/dF = -(w_l lam^T)

which is the same gradient family the reference computes with ``bger``
batched outer products (the reference symmetrizes dQ because it treats Q as a
symmetric parameter; we return the raw Jacobian of the KKT map, which agrees
for symmetric perturbations) — validated by finite differences in
tests/test_lcp_grad.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from lcp_physics_tpu.lcp.pdipm import (
    PdipmSolution, _assemble_kkt, _dtype_consts, pdipm_solve, solve_eq_kkt)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _lcp_solve_core(Q, p, G, h, A, b, F, max_iter, tol):
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol)
    return sol.z


def _lcp_fwd(Q, p, G, h, A, b, F, max_iter, tol):
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol)
    residuals = (sol.z, sol.s, sol.lam, sol.nu, Q, G, A, F)
    return sol.z, residuals


def _lcp_bwd(max_iter, tol, residuals, g):
    z, s, lam, nu, Q, G, A, F = residuals
    n, m = Q.shape[0], G.shape[0]
    dt = Q.dtype
    consts = _dtype_consts(dt)

    if m == 0:
        # Pure equality KKT: differentiate [[Q, A^T], [A, 0]] solve directly.
        wz, wn = solve_eq_kkt(Q, g, A, jnp.zeros_like(nu))
        wz = -wz  # solve_eq_kkt solves with rhs [-p; b]; we want [g; 0]
        wn = -wn
        dQ = -jnp.outer(wz, z)
        dp = -wz
        dA = -(jnp.outer(wn, z) + jnp.outer(nu, wz))
        db = wn
        zero_G = jnp.zeros_like(G)
        return (dQ, dp, zero_G, jnp.zeros_like(s), dA, db, jnp.zeros_like(F))

    lam_safe = jnp.maximum(lam, consts["tiny"])
    d_inv = jnp.clip(s / lam_safe, consts["dinv_min"], consts["dinv_max"])
    K = _assemble_kkt(Q, G, A, F, d_inv, consts["reg"])
    rhs = jnp.concatenate([g, jnp.zeros((m,), dt), jnp.zeros_like(nu)])
    lu = lu_factor(K)
    w = lu_solve(lu, rhs, trans=1)  # solves K^T w = rhs
    wz, wl, wn = w[:n], w[n:n + m], w[n + m:]

    dQ = -jnp.outer(wz, z)
    dp = -wz
    dG = -(jnp.outer(wl, z) + jnp.outer(lam, wz))
    dh = wl
    dA = -(jnp.outer(wn, z) + jnp.outer(nu, wz))
    db = wn
    dF = -jnp.outer(wl, lam)
    return (dQ, dp, dG, dh, dA, db, dF)


_lcp_solve_core.defvjp(_lcp_fwd, _lcp_bwd)


def lcp_solve(Q, p, G, h, A=None, b=None, F=None, *,
              max_iter=20, tol=1e-7):
    """Differentiable mixed-LCP solve; returns the primal solution ``z``.

    Single-instance shapes (``vmap`` for batches): Q (n,n) or (n,) diagonal,
    p (n,), G (m,n), h (m,), A (q,n), b (q,), F (m,m).  ``A``/``b`` default
    to an empty equality block, ``F`` to zeros (plain QP — the qpth case).

    Gradients flow to all seven inputs via the implicit KKT backward.
    """
    dt = jnp.result_type(Q, p)
    Q = jnp.asarray(Q, dt)
    if Q.ndim == 1:
        Q = jnp.diag(Q)
    p = jnp.asarray(p, dt)
    G = jnp.asarray(G, dt)
    h = jnp.asarray(h, dt)
    n = Q.shape[0]
    m = G.shape[0]
    if A is None:
        A = jnp.zeros((0, n), dt)
        b = jnp.zeros((0,), dt)
    else:
        A = jnp.asarray(A, dt)
        b = jnp.asarray(b, dt)
    if F is None:
        F = jnp.zeros((m, m), dt)
    else:
        F = jnp.asarray(F, dt)
    return _lcp_solve_core(Q, p, G, h, A, b, F, max_iter, tol)


def lcp_solve_full(Q, p, G, h, A=None, b=None, F=None, *,
                   max_iter=20, tol=1e-7) -> PdipmSolution:
    """Non-differentiable diagnostic solve returning the full
    :class:`PdipmSolution` (slacks, multipliers, residuals, iteration count).
    """
    dt = jnp.result_type(Q, p)
    Q = jnp.asarray(Q, dt)
    if Q.ndim == 1:
        Q = jnp.diag(Q)
    n = Q.shape[0]
    m = jnp.asarray(G).shape[0]
    if A is None:
        A = jnp.zeros((0, n), dt)
        b = jnp.zeros((0,), dt)
    if F is None:
        F = jnp.zeros((m, m), dt)
    return pdipm_solve(Q, jnp.asarray(p, dt), jnp.asarray(G, dt),
                       jnp.asarray(h, dt), jnp.asarray(A, dt),
                       jnp.asarray(b, dt), jnp.asarray(F, dt),
                       max_iter=max_iter, tol=tol)
