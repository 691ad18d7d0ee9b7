r"""Mehrotra predictor–corrector primal–dual interior-point solver for the
mixed LCP / QP that underlies contact dynamics.

Problem (single instance; batch via ``jax.vmap``):

    minimize_z   1/2 z^T Q z + p^T z
    subject to   G z + F lam + s = h,   s >= 0,  lam >= 0,  s \perp lam
                 A z = b

With ``F = 0`` this is the standard inequality/equality QP (the reference's
qpth lineage); a nonzero ``F`` couples the inequality slacks to their own
multipliers, which is exactly the Stewart–Trinkle friction-cone structure the
reference's LCP extension adds (reference: ``lcp_physics/lcp/solvers/batch.py``
— ``forward``, ``pre_factor_kkt``, ``factor_kkt``, ``solve_kkt``; see
SURVEY.md §2.1).

TPU-first design notes
----------------------
* Fixed trip count: the IPM runs a static ``max_iter`` ``lax.fori_loop`` with
  convergence masking (converged instances stop updating) instead of the
  reference's Python early-exit — one traced path, XLA-friendly.
* Each iteration assembles the reduced KKT matrix

      K(d) = [[Q + r I,  G^T,              A^T     ],
              [G,        F - diag(s/lam) - r I,  0 ],
              [A,        0,               -r_eq I  ]]

  and LU-factors it once, reusing the factorization for the affine
  (predictor) and combined (corrector) solves.  Under ``vmap`` this becomes a
  single batched LU across all worlds — the batch axis, not the tiny
  per-world system, is what fills the TPU.
* Where the reference pre-factors Q and maintains a Schur complement
  (``pre_factor_kkt``/``factor_kkt``), we deliberately refactor the full
  dense KKT: per-world systems are tiny (O(100) rows) and batched dense LU
  maps better onto XLA than the reference's partial-refactor bookkeeping.
  A diagonal-Q Schur fast path lives in :func:`pdipm_solve_schur` (the
  physics engine's mass matrix is diagonal).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve


class PdipmSolution(NamedTuple):
    z: jax.Array      # primal solution (n,)
    s: jax.Array      # inequality slacks (m,)
    lam: jax.Array    # inequality multipliers (m,)
    nu: jax.Array     # equality multipliers (q,)
    mu: jax.Array     # final complementarity measure (scalar)
    resid: jax.Array  # final max KKT residual (scalar)
    iters: jax.Array  # iterations until convergence mask latched (scalar int)


def _dtype_consts(dtype):
    if dtype == jnp.float64:
        return dict(dinv_min=1e-12, dinv_max=1e12, reg=1e-11, tiny=1e-300)
    return dict(dinv_min=1e-6, dinv_max=1e6, reg=1e-7, tiny=1e-30)


def _assemble_kkt(Q, G, A, F, d_inv, reg):
    """Reduced (slack-eliminated) KKT matrix K(d).  Shapes: Q (n,n), G (m,n),
    A (q,n), F (m,m), d_inv (m,) = s/lam."""
    n, m, q = Q.shape[0], G.shape[0], A.shape[0]
    dt = Q.dtype
    top = jnp.concatenate(
        [Q + reg * jnp.eye(n, dtype=dt), G.T, A.T], axis=1)
    mid = jnp.concatenate(
        [G, F - jnp.diag(d_inv) - reg * jnp.eye(m, dtype=dt),
         jnp.zeros((m, q), dt)], axis=1)
    bot = jnp.concatenate(
        [A, jnp.zeros((q, m), dt), -reg * jnp.eye(q, dtype=dt)], axis=1)
    return jnp.concatenate([top, mid, bot], axis=0)


def _split(sol, n, m):
    return sol[:n], sol[n:n + m], sol[n + m:]


def _max_step(v, dv, tiny):
    """Largest alpha in (0, 1] with v + alpha*dv >= 0 (v > 0 elementwise)."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio, initial=jnp.inf) * (1.0 - tiny))


def solve_eq_kkt(Q, p, A, b, reg=None):
    """Equality-only KKT solve: [[Q, A^T], [A, 0]] [z; nu] = [-p; b].

    The reference's contact-free fast path (``PdipmEngine.solve_dynamics``
    when ``world.collisions`` is empty) solves exactly this system.
    """
    n, q = Q.shape[0], A.shape[0]
    dt = Q.dtype
    if reg is None:
        reg = _dtype_consts(dt)["reg"]
    K = jnp.concatenate([
        jnp.concatenate([Q + reg * jnp.eye(n, dtype=dt), A.T], axis=1),
        jnp.concatenate([A, -reg * jnp.eye(q, dtype=dt)], axis=1),
    ], axis=0)
    rhs = jnp.concatenate([-p, b])
    sol = jnp.linalg.solve(K, rhs)
    return sol[:n], sol[n:]


def pdipm_solve(Q, p, G, h, A, b, F, *, max_iter=20, tol=1e-7):
    """Solve one mixed-LCP instance.  All inputs are single-instance arrays;
    wrap in ``jax.vmap`` for the batched solver (the engine does).

    Returns a :class:`PdipmSolution`.
    """
    n = Q.shape[0]
    m = G.shape[0]
    q = A.shape[0]
    dt = Q.dtype
    consts = _dtype_consts(dt)
    reg = consts["reg"]

    if m == 0:
        z, nu = solve_eq_kkt(Q, p, A, b, reg)
        zero_m = jnp.zeros((0,), dt)
        return PdipmSolution(z, zero_m, zero_m, nu,
                             jnp.asarray(0.0, dt), jnp.asarray(0.0, dt),
                             jnp.asarray(0, jnp.int32))

    # ---- Initialization: one Newton step from the origin with d_inv = 1,
    # then shift (s, lam) into the strict interior (qpth-style start).
    ones_m = jnp.ones((m,), dt)
    K0 = _assemble_kkt(Q, G, A, F, ones_m, reg)
    rhs0 = jnp.concatenate([-p, h, b])
    lu0 = lu_factor(K0)
    sol0 = lu_solve(lu0, rhs0)
    z, lam, nu = _split(sol0, n, m)
    s = -lam  # with d_inv = 1 and zero complementarity residual, ds = -dlam
    s = s + jax.nn.relu(1.0 - jnp.min(s, initial=jnp.inf))
    lam = lam + jax.nn.relu(1.0 - jnp.min(lam, initial=jnp.inf))

    big = jnp.asarray(jnp.finfo(dt).max / 8, dt)

    def kkt_residuals(z, s, lam, nu):
        rx = Q @ z + p + G.T @ lam + A.T @ nu
        rz = G @ z + F @ lam + s - h
        ry = A @ z - b
        return rx, rz, ry

    def body(i, carry):
        z, s, lam, nu, best, best_merit, done, iters = carry

        rx, rz, ry = kkt_residuals(z, s, lam, nu)
        mu = jnp.dot(s, lam) / m
        resid = jnp.maximum(
            jnp.max(jnp.abs(rx), initial=0.0),
            jnp.maximum(jnp.max(jnp.abs(rz), initial=0.0),
                        jnp.max(jnp.abs(ry), initial=0.0)))
        merit = mu + resid

        improved = merit < best_merit
        best = jax.tree.map(
            lambda new, old: jnp.where(improved, new, old),
            (z, s, lam, nu), best)
        best_merit = jnp.minimum(merit, best_merit)

        new_done = done | (merit < tol)
        iters = jnp.where(new_done & ~done, i, iters)

        lam_safe = jnp.maximum(lam, consts["tiny"])
        d_inv = jnp.clip(s / lam_safe, consts["dinv_min"], consts["dinv_max"])
        K = _assemble_kkt(Q, G, A, F, d_inv, reg)
        lu = lu_factor(K)

        # Predictor (affine scaling) direction.
        r4 = s * lam
        rhs_aff = jnp.concatenate([-rx, -rz + r4 / lam_safe, -ry])
        dz_a, dlam_a, _dnu_a = _split(lu_solve(lu, rhs_aff), n, m)
        ds_a = -r4 / lam_safe - d_inv * dlam_a

        alpha_a = jnp.minimum(_max_step(s, ds_a, 0.0),
                              _max_step(lam, dlam_a, 0.0))
        mu_aff = jnp.dot(s + alpha_a * ds_a, lam + alpha_a * dlam_a) / m
        sigma = (jnp.clip(mu_aff / jnp.maximum(mu, consts["tiny"]), 0.0, 1.0)
                 ) ** 3

        # Corrector (combined Mehrotra) direction, same factorization.
        r4c = s * lam + ds_a * dlam_a - sigma * mu
        rhs_c = jnp.concatenate([-rx, -rz + r4c / lam_safe, -ry])
        dz, dlam, dnu = _split(lu_solve(lu, rhs_c), n, m)
        ds = -r4c / lam_safe - d_inv * dlam

        alpha = 0.99 * jnp.minimum(_max_step(s, ds, 0.0),
                                   _max_step(lam, dlam, 0.0))

        z_n = z + alpha * dz
        s_n = jnp.maximum(s + alpha * ds, consts["tiny"])
        lam_n = jnp.maximum(lam + alpha * dlam, consts["tiny"])
        nu_n = nu + alpha * dnu

        # NaN/overflow guard: reject a diverged update, freeze the instance.
        bad = ~jnp.isfinite(
            jnp.abs(z_n).max() + jnp.abs(s_n).max() + jnp.abs(lam_n).max()
            + (jnp.abs(nu_n).max() if q else jnp.asarray(0.0, dt)))
        halt = new_done | bad

        keep = lambda new, old: jnp.where(halt, old, new)
        z, s, lam, nu = (keep(z_n, z), keep(s_n, s),
                         keep(lam_n, lam), keep(nu_n, nu))
        return z, s, lam, nu, best, best_merit, halt | done, iters

    init = (z, s, lam, nu, (z, s, lam, nu), big,
            jnp.asarray(False), jnp.asarray(max_iter, jnp.int32))
    z, s, lam, nu, best, best_merit, done, iters = jax.lax.fori_loop(
        0, max_iter, body, init)

    # Return the best iterate seen (covers non-monotone tails, mirroring the
    # reference's notImprovedLim best-iterate fallback).
    rx, rz, ry = kkt_residuals(z, s, lam, nu)
    mu = jnp.dot(s, lam) / m
    resid = jnp.maximum(
        jnp.max(jnp.abs(rx), initial=0.0),
        jnp.maximum(jnp.max(jnp.abs(rz), initial=0.0),
                    jnp.max(jnp.abs(ry), initial=0.0)))
    final_merit = mu + resid
    use_best = best_merit < final_merit
    z, s, lam, nu = jax.tree.map(
        lambda b_, c: jnp.where(use_best, b_, c), best, (z, s, lam, nu))
    mu = jnp.dot(s, lam) / m
    rx, rz, ry = kkt_residuals(z, s, lam, nu)
    resid = jnp.maximum(
        jnp.max(jnp.abs(rx), initial=0.0),
        jnp.maximum(jnp.max(jnp.abs(rz), initial=0.0),
                    jnp.max(jnp.abs(ry), initial=0.0)))
    return PdipmSolution(z, s, lam, nu, mu, resid, iters)
