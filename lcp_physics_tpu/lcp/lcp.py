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

    dL/dQ = -(w_z z^T)                    dL/dp = -w_z
    dL/dG = -(w_l z^T + lam w_z^T)        dL/dh = +w_l
    dL/dA = -(w_n z^T + nu w_z^T)         dL/db = +w_n
    dL/dF = -(w_l lam^T)

the same batched-outer-product (``bger``) gradient family the reference
computes (the reference symmetrizes dQ because it treats Q as a symmetric
parameter; we return the raw Jacobian of the KKT map, which agrees for
symmetric perturbations) — validated by finite differences in
tests/test_lcp_grad.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from lcp_physics_tpu.lcp.cone import ConeF
from lcp_physics_tpu.lcp.pdipm import (PdipmSolution, _dtype_consts,
                                       make_kkt_factor, pdipm_solve,
                                       resolve_backend, solve_eq_kkt)
from lcp_physics_tpu.lcp.util import bger

# Default matmul precision for the backward one-shot transposed KKT solve
# when the caller did not pick one (lcp_solve(bwd_precision=None)).  The
# backward is a single solve with no outer loop to correct it, so it cannot
# ride the forward's fast-factor mixed-precision scheme — but on TPU
# 'highest' is a 6-pass bf16 emulation while 'high' (3-pass) already
# reaches ~f32 accuracy, far below the default profile's own solution
# accuracy.  Measured sweep: PERF.md "backward precision sweep" (round 4).
BWD_MATMUL_PRECISION = "highest"


def _bwd_precision_ctx(factor_precision, bwd_precision=None):
    if factor_precision in ("highest", "float32"):
        # An exact forward profile gets gradients of matching accuracy.
        return jax.default_matmul_precision("highest")
    return jax.default_matmul_precision(bwd_precision
                                        or BWD_MATMUL_PRECISION)


@partial(jax.custom_vjp,
         nondiff_argnums=(8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
                          20))
def _lcp_solve_core(Q, p, G, h, A, b, F, row_mask, max_iter, tol, backend,
                    diag_q, gamma_rows, refine, not_improved_lim,
                    factor_precision, fric_pair, gondzio, bwd_precision,
                    verbose, stall_rtol):
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol,
                      backend=backend, q_is_diag=diag_q,
                      gamma_rows=gamma_rows, row_mask=row_mask,
                      refine=refine, not_improved_lim=not_improved_lim,
                      factor_precision=factor_precision,
                      fric_pair=fric_pair, gondzio=gondzio, verbose=verbose,
                      stall_rtol=stall_rtol)
    return sol.z


def _lcp_fwd(Q, p, G, h, A, b, F, row_mask, max_iter, tol, backend, diag_q,
             gamma_rows, refine, not_improved_lim, factor_precision,
             fric_pair, gondzio, bwd_precision, verbose, stall_rtol):
    sol = pdipm_solve(Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol,
                      backend=backend, q_is_diag=diag_q,
                      gamma_rows=gamma_rows, row_mask=row_mask,
                      refine=refine, not_improved_lim=not_improved_lim,
                      factor_precision=factor_precision,
                      fric_pair=fric_pair, gondzio=gondzio, verbose=verbose,
                      stall_rtol=stall_rtol)
    residuals = (sol.z, sol.s, sol.lam, sol.nu, Q, G, A, F, row_mask)
    return sol.z, residuals


def _lcp_bwd(max_iter, tol, backend, diag_q, gamma_rows, refine,
             not_improved_lim, factor_precision, fric_pair, gondzio,
             bwd_precision, verbose, stall_rtol, residuals, g):
    # The backward one-shot solve traces its matmuls under
    # _bwd_precision_ctx ('highest' unless bwd_precision relaxes the
    # default profile); factor_precision additionally selects the
    # precision-exact scalar-GJ factor kernel (ambient precision alone
    # does not fix the blocked kernel's rank-16 explicit pivot inverses —
    # PERF.md round-3), so a 'highest' forward profile gets gradients
    # of matching accuracy.
    with _bwd_precision_ctx(factor_precision, bwd_precision):
        return _lcp_bwd_impl(max_iter, tol, backend, diag_q, gamma_rows,
                             refine, residuals, g, fric_pair,
                             factor_precision)


def _lcp_bwd_impl(max_iter, tol, backend, diag_q, gamma_rows, refine,
                  residuals, g, fric_pair=False, factor_precision=None):
    z, s, lam, nu, Q, G, A, F, row_mask = residuals
    # Q stays in DIAGONAL form ((B, n) / (n,)) on the physics path; its
    # cotangent is then the diagonal -(w_z o z) instead of a dense outer.
    single = G.ndim == 2
    if single:
        z, s, lam, nu, Q, G, A, F, g = jax.tree.map(
            lambda x: x[None], (z, s, lam, nu, Q, G, A, F, g))
    # (row_mask is only needed for its zero cotangent below)
    n, m = G.shape[-1], G.shape[-2]
    q = nu.shape[-1]
    dt = Q.dtype
    consts = _dtype_consts(dt)
    # backend resolution happens inside make_kkt_factor / solve_eq_kkt at
    # the size of the system actually factored (Schur/gamma-reduced).

    def dQ_of(wz):
        return -(wz * z) if diag_q else -bger(wz, z)

    if m == 0:
        Qd = Q[..., None] * jnp.eye(n, dtype=dt) if diag_q else Q
        wz, wn = solve_eq_kkt(Qd, g, A, jnp.zeros_like(nu), backend=backend)
        wz = -wz  # solve_eq_kkt solves with rhs [-p; b]; we want [g; 0]
        wn = -wn
        grads = (dQ_of(wz), -wz, jnp.zeros_like(G), jnp.zeros_like(s),
                 -(bger(wn, z) + bger(nu, wz)), wn,
                 jax.tree.map(jnp.zeros_like, F))
    else:
        lam_safe = jnp.maximum(lam, consts["tiny"])
        d_inv = jnp.clip(s / lam_safe, consts["dinv_min"],
                         consts["dinv_max"])
        kkt = make_kkt_factor(Q, Q if diag_q else None, G, A, F,
                              consts["reg"], backend,
                              gamma_rows if diag_q else 0,
                              refine=refine, fric_pair=fric_pair,
                              fwd_precision=factor_precision)(d_inv)
        rhs = jnp.concatenate(
            [g, jnp.zeros_like(s), jnp.zeros_like(nu)], axis=-1)
        w = kkt(rhs, trans=1)
        wz, wl, wn = w[..., :n], w[..., n:n + m], w[..., n + m:]
        if isinstance(F, ConeF):
            # F carries only mu (at [gamma_i, normal_i] = -mu_i): the
            # dense cotangent dF = -(w_l lam^T) restricted to those
            # entries, chained through the -1, is w_l[gamma] * lam[normal].
            mg = F.m - F.C
            dF = ConeF(wl[..., mg:] * lam[..., :F.C],
                       jnp.zeros_like(F.valid), F.fd)
        else:
            dF = -bger(wl, lam)
        grads = (
            dQ_of(wz),                     # dQ
            -wz,                           # dp
            -(bger(wl, z) + bger(lam, wz)),  # dG
            wl,                            # dh
            -(bger(wn, z) + bger(nu, wz)),   # dA
            wn,                            # db
            dF,                            # dF
        )
    if single:
        grads = jax.tree.map(lambda x: x[0], grads)
    return grads + (jax.tree.map(jnp.zeros_like, row_mask),)


_lcp_solve_core.defvjp(_lcp_fwd, _lcp_bwd)


def _normalize(Q, p, G, h, A, b, F, q_is_diag=None):
    dt = jnp.result_type(Q, p)
    Q = jnp.asarray(Q, dt)
    p = jnp.asarray(p, dt)
    G = jnp.asarray(G, dt)
    h = jnp.asarray(h, dt)
    batched = p.ndim == 2
    n = p.shape[-1]
    if q_is_diag is not None:
        # Explicit flag (callers that KNOW, e.g. core/step.py passing the
        # mass diagonal) — no shape sniffing, no ambiguity.
        diag_q = bool(q_is_diag)
        allowed = {1, p.ndim} if diag_q else {2, p.ndim + 1}
        if Q.ndim not in allowed:
            raise ValueError(
                f"q_is_diag={q_is_diag} but Q.ndim={Q.ndim} does not match "
                f"p.ndim={p.ndim} (diagonal Q must be (n,) or (B, n); dense "
                "Q must be (n, n) or (B, n, n))")
    elif batched:
        # Diagonal-Q detection by shape: a 1-D Q is always a diagonal; a
        # 2-D Q with a batched p is a per-instance diagonal when it matches
        # (B, n).  The B == n case is genuinely ambiguous (could equally be
        # one shared dense (n, n)) and silently guessing produced garbage
        # dynamics downstream — refuse and demand the explicit flag.
        B_ = p.shape[0]
        if Q.ndim == 2 and Q.shape == (B_, n) and B_ == n:
            raise ValueError(
                f"Q shape {Q.shape} with batch B == n == {n} is ambiguous: "
                "pass q_is_diag=True (per-instance diagonals) or "
                "q_is_diag=False (shared dense Q)")
        diag_q = Q.ndim == 1 or (Q.ndim == 2 and Q.shape == (B_, n))
    else:
        diag_q = Q.ndim == 1
    if diag_q and batched and Q.ndim == 1:
        # Keep Q in diagonal form (never expanded to (B, n, n)); just give
        # a shared diagonal the explicit batch axis the solver expects.
        Q = jnp.broadcast_to(Q[None], (p.shape[0], n))
    m = G.shape[-2]
    lead = (p.shape[0],) if batched else ()
    if A is None:
        A = jnp.zeros(lead + (0, n), dt)
        b = jnp.zeros(lead + (0,), dt)
    else:
        A = jnp.asarray(A, dt)
        b = jnp.asarray(b, dt)
    if F is None:
        F = jnp.zeros(lead + (m, m), dt)
    elif isinstance(F, ConeF):
        F = ConeF(jnp.asarray(F.mu, dt), jnp.asarray(F.valid, dt), F.fd)
    else:
        F = jnp.asarray(F, dt)
    return diag_q, (Q, p, G, h, A, b, F)


def lcp_solve(Q, p, G, h, A=None, b=None, F=None, *,
              max_iter=20, tol=1e-7, backend="auto", gamma_rows=0,
              q_is_diag=None, row_mask=None, refine=0,
              not_improved_lim=3, factor_precision=None, fric_pair=False,
              gondzio=0, bwd_precision=None, verbose=False,
              stall_rtol=0.0):
    """Differentiable mixed-LCP solve; returns the primal solution ``z``.

    Shapes: single instance (Q (n,n) or diagonal (n,), p (n,), G (m,n),
    h (m,), A (q,n), b (q,), F (m,m)) or the same with a leading batch axis
    on every argument.  ``A``/``b`` default to an empty equality block,
    ``F`` to zeros (plain QP — the qpth case).

    Passing Q as a 1-D diagonal (the physics mass matrix) activates the
    Schur fast path in the solver.  ``q_is_diag`` makes the interpretation
    explicit: True = Q is a (per-instance) diagonal (n,)/(B, n); False =
    dense (n, n)/(B, n, n); None = infer from shape, erroring on the
    ambiguous batched B == n case.  Gradients flow to all seven inputs via
    the implicit KKT backward.

    ``bwd_precision`` sets the matmul precision of that backward solve
    (None = module default ``BWD_MATMUL_PRECISION``); ignored when
    ``factor_precision`` requests an exact forward, which always gets an
    exact ('highest') backward.

    ``verbose`` prints the per-iteration residual dump (the reference
    ``LCPFunction(verbose=)`` behavior, via ``jax.debug.print``).  It
    forces the UNFUSED solver loop — the fused whole-IPM Pallas kernel
    has no print channel — so expect lower throughput while it is on.

    ``stall_rtol`` (0.0 = reference semantics): relative merit improvement
    required to reset the ``not_improved_lim`` stall counter — exits
    precision-floor plateau creep early on iteration-bound scenes (see
    :func:`~lcp_physics_tpu.lcp.pdipm.pdipm_solve`).
    """
    diag_q, (Q, p, G, h, A, b, F) = _normalize(Q, p, G, h, A, b, F,
                                               q_is_diag)
    if row_mask is not None:
        row_mask = jnp.asarray(row_mask, h.dtype)
    return _lcp_solve_core(Q, p, G, h, A, b, F, row_mask, max_iter, tol,
                           backend, diag_q, gamma_rows, refine,
                           not_improved_lim, factor_precision, fric_pair,
                           gondzio, bwd_precision, bool(verbose),
                           float(stall_rtol))


def lcp_solve_full(Q, p, G, h, A=None, b=None, F=None, *,
                   max_iter=20, tol=1e-7, backend="auto",
                   gamma_rows=0, q_is_diag=None,
                   row_mask=None, refine=0,
                   not_improved_lim=3, factor_precision=None,
                   fric_pair=False, gondzio=0,
                   verbose=False, stall_rtol=0.0) -> PdipmSolution:
    """Non-differentiable diagnostic solve returning the full
    :class:`PdipmSolution` (slacks, multipliers, residuals, iteration
    counts)."""
    diag_q, (Q, p, G, h, A, b, F) = _normalize(Q, p, G, h, A, b, F,
                                               q_is_diag)
    if row_mask is not None:
        row_mask = jnp.asarray(row_mask, h.dtype)
    return pdipm_solve(Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol,
                       backend=backend, q_is_diag=diag_q,
                       gamma_rows=gamma_rows, row_mask=row_mask,
                       refine=refine, not_improved_lim=not_improved_lim,
                       factor_precision=factor_precision,
                       fric_pair=fric_pair, gondzio=gondzio,
                       verbose=verbose, stall_rtol=stall_rtol)


class LCPFunction:
    """API-parity shim for the reference's ``LCPFunction`` (an old-style
    torch autograd Function instantiated per call: ``LCPFunction(eps,
    verbose, notImprovedLim, maxIter)(Q, p, G, h, A, b, F)``).

    In JAX the differentiable entry point is :func:`lcp_solve`; this class
    maps the reference's constructor knobs onto it so reference user code
    ports mechanically.  ``notImprovedLim`` maps to the solver's
    per-instance stall exit (``not_improved_lim``): an instance whose merit
    stops improving for that many iterations freezes at its best iterate.
    """

    def __init__(self, eps=1e-7, verbose=0, notImprovedLim=3, maxIter=20,
                 backend="auto"):
        self.eps = eps
        self.verbose = verbose
        self.notImprovedLim = notImprovedLim
        self.maxIter = maxIter
        self.backend = backend
        # populated after a call, mirroring the reference's saved state
        self.zhats = None

    def __call__(self, Q, p, G, h, A=None, b=None, F=None):
        self.zhats = lcp_solve(Q, p, G, h, A, b, F,
                               max_iter=self.maxIter, tol=self.eps,
                               backend=self.backend,
                               not_improved_lim=self.notImprovedLim,
                               verbose=bool(self.verbose))
        return self.zhats
