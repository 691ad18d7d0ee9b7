r"""Mehrotra predictor–corrector primal–dual interior-point solver for the
mixed LCP / QP that underlies contact dynamics.

Problem (batched; leading batch axis B):

    minimize_z   1/2 z^T Q z + p^T z
    subject to   G z + F lam + s = h,   s >= 0,  lam >= 0,  s ⊥ lam
                 A z = b

With ``F = 0`` this is the standard inequality/equality QP (the reference's
qpth lineage); a nonzero ``F`` couples the inequality slacks to their own
multipliers — the Stewart–Trinkle friction-cone structure of the reference's
LCP extension (reference: ``lcp_physics/lcp/solvers/batch.py`` —
``forward``, ``pre_factor_kkt``, ``factor_kkt``, ``solve_kkt``;
SURVEY.md §2.1).

TPU-first design notes
----------------------
* The solver is BATCH-NATIVE: every quantity carries a leading (B, ...)
  axis and every reduction is per-instance.  This widens the reference's
  nBatch seam into the primary TPU scaling axis: one solver call factors
  thousands of tiny KKT systems as one fused program.
* Fixed trip count ``lax.fori_loop`` with per-instance convergence masking
  (converged instances freeze) — one traced path, XLA-friendly; no Python
  early exit.
* Each iteration assembles the reduced KKT matrix

      K(d) = [[Q + r I,  G^T,                    A^T   ],
              [G,        F - diag(s/lam) - r I,  0     ],
              [A,        0,                      -r_eq I]]

  factors it once and reuses the factorization for the predictor and the
  Mehrotra corrector solves.
* The factorization backend is pluggable (``backend=``):
  - 'xla':    batched ``lu_factor``/``lu_solve`` (row pivoting; the
              reference semantics, works everywhere).
  - 'pallas': fused pivotless-LU TPU kernel with the batch laid out on the
              vector lanes (``lcp_physics_tpu.ops.linalg``) — the
              factorization becomes ~n sequential VPU ops over 1024 worlds
              at a time instead of XLA's serialized row operations.
  - 'auto':   'pallas' on TPU, 'xla' elsewhere.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import lu_factor, lu_solve

from lcp_physics_tpu.lcp.cone import ConeF


class PdipmSolution(NamedTuple):
    z: jax.Array      # primal solution (B, n)
    s: jax.Array      # inequality slacks (B, m)
    lam: jax.Array    # inequality multipliers (B, m)
    nu: jax.Array     # equality multipliers (B, q)
    mu: jax.Array     # final complementarity measure (B,)
    resid: jax.Array  # final max KKT residual (B,)
    iters: jax.Array  # per-instance iterations to convergence (B,) int32


# Mixed-precision scheme.  XLA's default f32 dot precision on TPU is
# single-pass bf16 — measured (PERF.md): it floors the achievable KKT
# residual at ~3e-3 on 384-row contact systems regardless of backend or
# refinement (previously mislabeled the "f32 conditioning floor").  The
# IPM is self-correcting: an INEXACT search direction (factor + solve at
# fast bf16) is repaired by later iterations as long as the RESIDUALS
# feeding each right-hand side are computed accurately.  So:
#   * residual matvecs, RHS assembly, P = Ghat Q^-1 Ghat^T, and the
#     refinement matvec run at 'highest' (3-pass f32 on the MXU);
#   * the per-iteration factor and triangular solves stay at the fast
#     default precision;
#   * one-shot solves with no outer loop to correct them (the implicit
#     gradient's transposed KKT solve, solve_eq_kkt) run entirely at
#     'highest'.
SOLVER_MATMUL_PRECISION = "highest"

# Ambient matmul precision for the FORWARD per-iteration factorization
# (the blocked-GJ panel inversions' big dots, the blocked-LU trailing
# updates and the two-level Schur-split matmuls all follow the ambient
# precision at trace time — ops/linalg.py).  None = fast default
# (single-pass bf16).  Round-3 finding: the dense-scene merit floor
# TRACKS this knob (bf16 factor -> ~4e-2, exact f32 factor -> ~1e-4;
# the xla backend and CPU both floor at ~1e-4), because the direction
# error is ~kappa(S) * eps_factor and the IPM stalls once that reaches
# O(1) — the round-2 "algorithmic floor" claim was an artifact of the
# experiment never reaching these trace-time-ambient dots.
FWD_FACTOR_PRECISION = None

# Explicit-inverse solve mode for the lazy blocked factor (round 4;
# ops/linalg.py ``inv_factor_blocks``): on the flagship rotated path the
# factor is assembled into a FULL explicit inverse (2x2 block-Schur
# identity over the lazy 128-panel grid — 3 extra MXU matmuls vs blocked
# LU), so each of the two KKT solves per IPM iteration is ONE batched
# matvec instead of 6 chained block matvecs + concats.  INV_REFINE
# structured refinement steps per solve (residual from P2 + diagonal +
# band, S2 never materialized) recover substitution-class accuracy,
# mirroring the fused small-K kernel's explicit-inverse + refinement
# scheme (PERF.md round 3).
#
# Measured round 4 (dense 64-body flagship, B=256, after the compact-
# residual/single-z loop rework): blocked LU 16,095 steps/s vs inv
# 15,160 (refine=0) / 11,494 (INV_REFINE=1) — the 3 extra factor
# matmuls cost more than the solve-latency win, so the inverse mode is
# NOT the refine=0 default.  It engages when ``refine > 0`` (KKT floor
# 5.8e-4 vs 1.5e-2; lets refinement ride the lazy path with S2 never
# materialized) and as the substrate of the fused per-iteration kernel.
FWD_INV_SOLVE = True
INV_REFINE = 1

# Fused per-ITERATION Pallas kernel (ops/ipm_iter.py) for rotated
# systems past the whole-IPM kernel's K cap (flagship dense scene:
# K2 = 256): factor on the XLA/MXU blocked explicit-inverse path, the
# entire rest of the iteration in one Pallas kernel with the inverse
# and Ghat2 VMEM-resident.  Module switch for A/B benchmarks; DEFAULT
# OFF — measured TWICE on the dense 64-body flagship:
#   * round 4 (chunked-VPU matvecs + per-iteration lane transpose of
#     the inverse): 14,686 steps/s fused vs 16,058 unfused;
#   * round 5 (transpose ELIMINATED — the kernel consumes the factor's
#     native (B, K, K) layout and runs the matvecs on the MXU via
#     outer-batch products, see ops/ipm_iter.py): marginal cost
#     2.178 ms/iteration fused vs 1.801 unfused (max_iter sweep,
#     tol=0) — still 21% slower per iteration.  The round-4 postmortem
#     blamed the transpose; round 5 also measured the standalone
#     transpose at ~0 ms (XLA fuses it into the inverse build), so the
#     honest conclusion is that the reworked unfused loop's XLA-level
#     batched matmuls + fused elementwise simply beat a hand-fused
#     VMEM-resident kernel at this shape, in ADDITION to the
#     explicit-inverse factor's +0.12 ms/iter build cost (same reason
#     FWD_INV_SOLVE is refine>0-only above).  Both negatives recorded
#     in PERF.md; the kernel stays in-tree (tests force it via
#     monkeypatch and assert solution + gradient parity) as the
#     measured record.
FUSE_ITER = False


def _precision_ctx():
    return jax.default_matmul_precision(SOLVER_MATMUL_PRECISION)


def _fwd_factor_ctx(prec=None):
    import contextlib

    prec = FWD_FACTOR_PRECISION if prec is None else prec
    if prec is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(prec)


def _dtype_consts(dtype):
    if dtype == jnp.float64:
        return dict(dinv_min=1e-12, dinv_max=1e12, reg=1e-11, tiny=1e-300)
    return dict(dinv_min=1e-6, dinv_max=1e6, reg=1e-7, tiny=1e-30)


def resolve_backend(backend: str, nk: int = None) -> str:
    """'auto' -> 'pallas' on TPU when the lane-batched kernels support the
    system size, else 'xla'.  'fused' (the whole-IPM kernel) resolves like
    'auto' for the individual factor/solve calls that remain outside it."""
    if backend == "fused":
        backend = "auto"
    if backend == "pallas" and nk is not None:
        from lcp_physics_tpu.ops.linalg import pallas_supported

        if not pallas_supported(nk):
            return "xla"
        return backend
    if backend != "auto":
        return backend
    plat = jax.default_backend()
    if plat not in ("tpu", "axon"):
        return "xla"
    if nk is not None:
        from lcp_physics_tpu.ops.linalg import pallas_supported

        if not pallas_supported(nk):
            return "xla"
    return "pallas"


def make_kkt_factor(Q, q_diag, G, A, F, reg, backend, gamma_rows=0,
                    refine=0, fwd_fast=False, fwd_precision=None,
                    fric_pair=False):
    """KKT solve operator factory.

    Returns ``factor(d_inv) -> solve(rhs, trans)`` for the reduced KKT
    system K(d).  Two strategies:

    * dense: assemble K(d) and LU it (pallas lane-batched when it fits,
      else XLA) — the general-Q path.
    * Schur (q_diag given): the physics mass matrix is DIAGONAL, so
      P = Ghat Q^-1 Ghat^T is formed ONCE (one MXU matmul — the TPU
      analog of the reference's ``pre_factor_kkt``), and each iteration
      only factors the (m+q)-row Schur complement S(d) = B(d) - P:

          K [z; w] = [r1; r2]   =>   S w = r2 - Ghat Q^-1 r1,
                                     z = Q^-1 (r1 - Ghat^T w).

      The transpose solve (implicit gradients) uses S^T with the same
      factorization.  This shrinks the 3N+m+q dense factor to m+q rows
      and routes mid-size systems back into the lane-batched kernel.
    """
    B, n = Q.shape[0], Q.shape[-1]
    m, q = G.shape[-2], A.shape[-2]
    dt = Q.dtype
    cone = isinstance(F, ConeF)
    # 'highest' also selects the precision-exact scalar GJ kernel for the
    # blocked pallas factor: the rank-16 blocked elimination floors the
    # IPM residual at ~8e-3 even with all matmuls at 'highest' (explicit
    # inverses of ill-conditioned pivot blocks), while the scalar kernel
    # reaches ~1e-4 — parity with pivoted XLA LU (PERF.md round-3).
    exact_fwd = fwd_precision in ("highest", "float32")
    # bf16 factor storage only on the fast forward path — an exact
    # (factor_precision='highest') factor must stay f32 end to end.
    store_dt = _fwd_store_dtype(dt) if (fwd_fast and not exact_fwd) \
        else None

    if q_diag is None:
        if cone:
            F = F.dense()  # generic dense path: fall back

        def factor_dense(d_inv):
            be = resolve_backend(backend, n + m + q)
            K = _assemble_kkt(Q, G, A, F, d_inv, reg)
            with _fwd_factor_ctx(fwd_precision):
                fac = _factor(K, be, store_dt, exact=exact_fwd)
            # r1_zero accepted for interface parity (no transform to skip
            # on the dense path)
            return lambda rhs, trans=0, r1_zero=False: _solve_refined(
                fac, K, rhs, be, trans, refine)

        return factor_dense

    mq = m + q
    qinv = 1.0 / q_diag                               # (B, n)
    eye_q = jnp.eye(q, dtype=dt)

    if gamma_rows == 0 or gamma_rows > m:
        if cone:
            F = F.dense()
        be = resolve_backend(backend, mq)
        Ghat = jnp.concatenate([G, A], axis=-2)      # (B, mq, n)
        with _precision_ctx():
            P = jnp.einsum("bmn,bn,bkn->bmk", Ghat, qinv, Ghat)
        eye_m = jnp.eye(m, dtype=dt)

        def factor_schur(d_inv):
            S = -P
            S = S.at[:, :m, :m].add(F - d_inv[..., None] * eye_m
                                    - reg * eye_m)
            if q:
                S = S.at[:, m:, m:].add(-reg * eye_q)
            with _fwd_factor_ctx(fwd_precision):
                fac = _factor(S, be, store_dt, exact=exact_fwd)

            def solve(rhs, trans=0, r1_zero=False):
                r1, r2 = rhs[..., :n], rhs[..., n:]
                if r1_zero:
                    t = r2
                else:
                    with _precision_ctx():  # rhs/solution transform: exact
                        t = r2 - jnp.einsum("bmn,bn->bm", Ghat, qinv * r1)
                # substitutions stay at default precision (same mixed-
                # precision scheme as factor_schur_gamma; the refine
                # residual inside _solve_refined raises its own context)
                w = _solve_refined(fac, S, t, be, trans, refine)
                with _precision_ctx():
                    z = qinv * (r1 - jnp.einsum("bmn,bm->bn", Ghat, w))
                return jnp.concatenate([z, w], axis=-1)

            return solve

        return factor_schur

    # ---- gamma elimination (second-level Schur) -------------------------
    # The engine's friction-cone slack rows (the trailing `gamma_rows` of
    # the inequality block) have ZERO G rows and ZERO F diagonal block, so
    # their Schur-complement block S_gg = -(d_inv_g + reg) is DIAGONAL and
    # can be eliminated analytically, shrinking the factored system from
    # m+q to (m - gamma) + q rows (e.g. 512 -> 384 on a 64-body world).
    g_ = gamma_rows
    mg = m - g_                                      # kept inequality rows
    K = mg + q

    # ---- friction-pair rotation (third-level Schur; round 3) ------------
    # The engine's two friction directions per contact are EXACT negatives
    # (orthogonal_tangents returns (+t, -t), so the G row for f2 is -1 *
    # the row for f1 bit-exactly).  Rotating each (f1, f2) pair to
    # (u, v) = ((f1+f2)/sqrt2, (f1-f2)/sqrt2) makes the u rows' dense
    # Schur part VANISH (G_u = 0): u couples only diagonally to itself,
    # its own v partner, and its own normal row — so u is eliminated in
    # closed form exactly like the gamma rows, shrinking the factored
    # system from C*(1+fd)+q to 2C+q rows (384 -> 256 on the 64-body
    # dense scene: one fewer 128-panel to invert, 0.44x the S plane).
    # Only valid when the caller GUARANTEES the +-pair structure
    # (``fric_pair=True`` — core/step.py's assembly always satisfies it);
    # arbitrary user Jf takes the plain gamma path below.
    if cone and fric_pair and F.fd == 2 and g_ == F.C and mg == 3 * F.C:
        return _rot_factor_factory(
            Q, q_diag, G, A, F, reg, backend, refine, fwd_fast,
            fwd_precision, B, n, m, q, dt, qinv, store_dt, exact_fwd)

    be = resolve_backend(backend, K)
    Ghat_k = jnp.concatenate([G[:, :mg, :], A], axis=-2)  # (B, K, n)
    with _precision_ctx():
        P = jnp.einsum("bmn,bn,bkn->bmk", Ghat_k, qinv, Ghat_k)
    eye_mg = jnp.eye(mg, dtype=dt)

    if cone:
        # Structured coupling: Skg = [0_C; -E; 0_q], Sgk = [-diag(mu),
        # E^T, 0_q] with E = fd stacked masked identities.  Every product
        # against them is O(C) — F is never materialized.
        C_, fd = F.C, F.fd
        assert g_ == C_ and mg == C_ * (1 + fd), (
            "gamma elimination with ConeF expects the engine row layout")
        v, mu_v = F.valid, F.mu

        def skg_apply(tD):
            """Skg @ tD onto the K kept rows (friction rows only)."""
            fr = jnp.concatenate([-v * tD] * fd, axis=-1)
            pad_q = jnp.zeros(tD.shape[:-1] + (q,), dt)
            return jnp.concatenate(
                [jnp.zeros_like(tD), fr, pad_q], axis=-1)

        def sgk_t_apply(tD):
            """Sgk^T @ tD onto the K kept rows."""
            fr = jnp.concatenate([v * tD] * fd, axis=-1)
            pad_q = jnp.zeros(tD.shape[:-1] + (q,), dt)
            return jnp.concatenate([-mu_v * tD, fr, pad_q], axis=-1)

        def sgk_apply(wk):
            """Sgk @ wk -> gamma rows."""
            wf = sum(wk[..., C_ * (1 + d):C_ * (2 + d)] for d in range(fd))
            return -mu_v * wk[..., :C_] + v * wf

        def skg_t_apply(wk):
            """Skg^T @ wk -> gamma rows."""
            wf = sum(wk[..., C_ * (1 + d):C_ * (2 + d)] for d in range(fd))
            return -v * wf

        # One-pass banded assembly of S_red = -P + diag/band corrections.
        # The scatter form (six .at[rows, cols].add diagonals plus an
        # eye-materialized diag add) cost ~1 ms/iteration of pure HBM
        # traffic at B=256/K=384; every correction is a DIAGONAL BAND of
        # the (K, K) plane, so static iota masks turn the whole assembly
        # into one fused elementwise pass over -P.  Masks are built in
        # NumPy so the LAZY block path below can statically skip blocks a
        # band never touches.
        import numpy as _np
        rowK = _np.arange(K)[:, None]
        colK = _np.arange(K)[None, :]
        diagK_np = rowK == colK
        band_specs = []                 # (mask_np, col_offset) per band
        for d in range(fd):
            band_specs.append(((rowK - C_ * (1 + d) == colK)
                               & (colK < C_), "cn"))
            for d2 in range(fd):
                band_specs.append(
                    ((rowK - C_ * (1 + d) == colK - C_ * (1 + d2))
                     & (colK >= C_ * (1 + d2)) & (colK < C_ * (2 + d2)),
                     C_ * (1 + d2)))

        def correction_vectors(d_inv, Dginv):
            # diag: -(d_inv + reg) on kept inequality rows, -reg on eq rows
            dmain = jnp.concatenate(
                [d_inv[..., :mg] + reg,
                 jnp.full((B, q), reg, dt)], axis=-1)          # (B, K)
            cn = v * mu_v * Dginv                              # (B, C)
            cf = -v * Dginv
            wides = []
            for _, off in band_specs:
                vals = cn if off == "cn" else cf
                start = 0 if off == "cn" else off
                wides.append(jnp.zeros((B, K), dt)
                             .at[:, start:start + C_].set(vals))
            return dmain, wides

        def assemble_S(d_inv, Dginv):
            dmain, wides = correction_vectors(d_inv, Dginv)
            S = -P - jnp.where(jnp.asarray(diagK_np),
                               dmain[..., None, :], 0.0)
            for (mask, _), wide in zip(band_specs, wides):
                S = S + jnp.where(jnp.asarray(mask), wide[..., None, :],
                                  0.0)
            return S

        F_kk = 0.0  # F[:mg, :mg] is structurally zero
    else:
        zeros_qg = jnp.zeros((B, q, g_), dt)
        Skg = jnp.concatenate([F[:, :mg, mg:m], zeros_qg],
                              axis=-2)               # (B, K, g)
        Sgk = jnp.concatenate([F[:, mg:m, :mg],
                               jnp.swapaxes(zeros_qg, -1, -2)], axis=-1)
        skg_apply = lambda tD: jnp.einsum("bkg,bg->bk", Skg, tD)
        sgk_t_apply = lambda tD: jnp.einsum("bgk,bg->bk", Sgk, tD)
        sgk_apply = lambda wk: jnp.einsum("bgk,bk->bg", Sgk, wk)
        skg_t_apply = lambda wk: jnp.einsum("bkg,bk->bg", Skg, wk)
        add_correction = lambda S, Dginv: S + jnp.einsum(
            "bkg,bg,bgj->bkj", Skg, Dginv, Sgk)
        F_kk = F[:, :mg, :mg]

    # LAZY blocked assembly: when the factor goes through the block-grid
    # pallas path with no refinement, S_red is never materialized — each
    # (B, PANEL, PANEL) block's "-P + banded corrections" expression is
    # handed to the factorization, and XLA fuses it into the block's
    # first consumer.  Saves a full (B, K, K) HBM write+read per IPM
    # iteration.  (refine > 0 needs the dense S_red for its residual
    # matvec; the xla/lane backends take dense input anyway.)
    lazy_ok = False
    if cone and refine == 0:
        from lcp_physics_tpu.ops.linalg import (MAX_LANE_N, PANEL,
                                                _ru as _ru_)

        lazy_ok = (be == "pallas" and _ru_(K, 8) > MAX_LANE_N)
        if lazy_ok:
            K_pad = _ru_(K, PANEL)
            negP_pad = jnp.zeros((B, K_pad, K_pad), dt)
            negP_pad = negP_pad.at[:, :K, :K].set(-P)   # once per solve
            if K_pad > K:
                idxp = jnp.arange(K, K_pad)
                negP_pad = negP_pad.at[:, idxp, idxp].set(1.0)
            # pad the static band masks so partial edge blocks slice clean
            band_masks_pad = []
            for mask, _ in band_specs:
                mp = _np.zeros((K_pad, K_pad), bool)
                mp[:K, :K] = mask
                band_masks_pad.append(mp)

            def make_get_block(dmain, wides):
                def get_block(t, s):
                    r0, c0 = t * PANEL, s * PANEL
                    val = negP_pad[:, r0:r0 + PANEL, c0:c0 + PANEL]
                    cs = slice(c0, min(c0 + PANEL, K))
                    w = cs.stop - cs.start
                    if t == s and w > 0:   # diag correction, this block
                        dsub = jnp.zeros((B, PANEL), dt).at[:, :w].set(
                            dmain[..., cs])
                        eye_p = jnp.eye(PANEL, dtype=dt)
                        val = val - dsub[..., None, :] * eye_p
                    for mask, wide in zip(band_masks_pad, wides):
                        sub = mask[r0:r0 + PANEL, c0:c0 + PANEL]
                        if not sub.any():
                            continue     # static skip: band misses block
                        wsub = jnp.zeros((B, PANEL), dt).at[:, :w].set(
                            wide[..., cs])
                        val = val + jnp.where(jnp.asarray(sub),
                                              wsub[..., None, :], 0.0)
                    return val
                return get_block

    def factor_schur_gamma(d_inv):
        Dg = d_inv[..., mg:] + reg                   # -S_gg diagonal
        Dginv = 1.0 / Dg
        if cone and lazy_ok:
            from lcp_physics_tpu.ops.linalg import plu_factor_blocks

            dmain, wides = correction_vectors(d_inv, Dginv)
            with _fwd_factor_ctx(fwd_precision):
                fac = plu_factor_blocks(make_get_block(dmain, wides), B, K,
                                        dt, store_dt, exact=exact_fwd)
            S_red = None                              # refine == 0
        elif cone:
            S_red = assemble_S(d_inv, Dginv)
            with _fwd_factor_ctx(fwd_precision):
                fac = _factor(S_red, be, store_dt, exact=exact_fwd)
        else:
            S = -P
            S = S.at[:, :mg, :mg].add(F_kk - d_inv[..., :mg, None] * eye_mg
                                      - reg * eye_mg)
            if q:
                S = S.at[:, mg:, mg:].add(-reg * eye_q)
            S_red = add_correction(S, Dginv)
            with _fwd_factor_ctx(fwd_precision):
                fac = _factor(S_red, be, store_dt, exact=exact_fwd)

        def solve_red(rhs_red, trans):
            return _solve_refined(fac, S_red, rhs_red, be, trans, refine)

        def reduced(rhs, trans=0, r1_zero=False):
            r1, r2 = rhs[..., :n], rhs[..., n:]
            rk = jnp.concatenate([r2[..., :mg], r2[..., m:]], axis=-1)
            rg = r2[..., mg:m]
            if r1_zero:
                tk = rk
            else:
                with _precision_ctx():  # rhs/solution transforms: exact
                    tk = rk - jnp.einsum("bkn,bn->bk", Ghat_k, qinv * r1)
            tg = rg                                  # gamma G rows are zero
            if trans == 0:
                rhs_red = tk + skg_apply(Dginv * tg)
                wk = solve_red(rhs_red, 0)
                wg = -Dginv * (tg - sgk_apply(wk))
            else:
                rhs_red = tk + sgk_t_apply(Dginv * tg)
                wk = solve_red(rhs_red, 1)
                wg = -Dginv * (tg - skg_t_apply(wk))
            w_full = jnp.concatenate(
                [wk[..., :mg], wg, wk[..., mg:]], axis=-1)
            return w_full, wk

        def z_from(r1, wk):
            with _precision_ctx():
                return qinv * (r1 - jnp.einsum("bkn,bk->bn", Ghat_k, wk))

        def solve(rhs, trans=0, r1_zero=False):
            w_full, wk = reduced(rhs, trans, r1_zero)
            z = z_from(rhs[..., :n], wk)
            return jnp.concatenate([z, w_full], axis=-1)

        solve.reduced = reduced
        solve.z_from = z_from
        return solve

    # Compact residual operators: G's gamma rows are structurally zero,
    # so residual products ride Ghat_k = [G_kept; A] (B, K, n) instead
    # of the full G (B, m, n) plus separate A matvecs.
    def res_down_g(z):
        y = jnp.einsum("bkn,bn->bk", Ghat_k, z)       # (B, K)
        Gz = jnp.concatenate(
            [y[..., :mg], jnp.zeros(y.shape[:-1] + (g_,), dt)], axis=-1)
        return jnp.concatenate([Gz, y[..., mg:]], axis=-1)

    def res_up_g(lam, nu):
        u = jnp.concatenate([lam[..., :mg], nu], axis=-1)
        return jnp.einsum("bkn,bk->bn", Ghat_k, u)

    factor_schur_gamma.residual_ops = (res_down_g, res_up_g)
    factor_schur_gamma.has_reduced = True
    return factor_schur_gamma


def _rot_factor_factory(Q, q_diag, G, A, F, reg, backend, refine, fwd_fast,
                        fwd_precision, B, n, m, q, dt, qinv, store_dt,
                        exact_fwd):
    r"""Gamma + friction-pair-rotation KKT solve factory (see the call
    site in :func:`make_kkt_factor` for the derivation sketch).

    Row layouts:
      original kept rows (post gamma-elim): [c (C), f1 (C), f2 (C), q]
      rotated/reduced core rows:            [c (C), v (C), q],  K2 = 2C+q
    with u = (f1+f2)/sqrt2 eliminated analytically.  Writing the
    per-contact banded pieces (cn = valid*mu*Dginv, cf = -valid*Dginv,
    a_d = -(d_inv_fd + reg) + cf, alpha = (a1+a2)/2, delta = (a1-a2)/2):

      S'[u,u] = alpha + cf =: g_u        S'[u,v] = S'[v,u] = delta
      S'[u,c] = sqrt2 * cn               S'[c,u] = S'[q,u] = 0
      S'[v,v] = alpha - cf  (+ dense -2 P_f1f1)
      S'[v,c] = 0 (+ dense)              S'[c,v], dense only

    so eliminating u adds only DIAGONAL corrections:
      S''[v,v] += -delta^2 / g_u
      S''[v,c]  = -delta * sqrt2 * cn / g_u   (S'[v,c] = 0)
    and the dense part of S'' is exactly -Ghat2 Q^-1 Ghat2^T with
    Ghat2 = [G_c; sqrt2 * G_f1; A].
    """
    C_ = F.C
    mg = 3 * C_
    K2 = 2 * C_ + q
    be = resolve_backend(backend, K2)
    sq2 = jnp.sqrt(jnp.asarray(2.0, dt))
    v_, mu_v = F.valid, F.mu
    Ghat2 = jnp.concatenate([G[:, :C_, :], sq2 * G[:, C_:2 * C_, :], A],
                            axis=-2)                      # (B, K2, n)
    with _precision_ctx():
        P2 = jnp.einsum("bmn,bn,bkn->bmk", Ghat2, qinv, Ghat2)

    import numpy as _np
    rowK = _np.arange(K2)[:, None]
    colK = _np.arange(K2)[None, :]
    diag_np = rowK == colK
    band_vc_np = (rowK - C_ == colK) & (colK < C_)   # (v-row, c-col) diag

    def make_apply_S2(dmain, bn):
        """Apply S2 (or S2^T) from its STRUCTURED form — the refinement
        residual for the explicit-inverse solve mode, never materializing
        S2: one P2 matvec (P2 is symmetric) + the diagonal + the (v, c)
        band."""
        def apply(x, trans=0):
            with _precision_ctx():     # accurate residual is the point
                y = -jnp.einsum("bij,bj->bi", P2, x)
            y = y - dmain * x
            if trans == 0:
                y = y.at[..., C_:2 * C_].add(bn * x[..., :C_])
            else:
                y = y.at[..., :C_].add(bn * x[..., C_:2 * C_])
            return y
        return apply

    def rot_scalars(d_inv, Dginv):
        cn = v_ * mu_v * Dginv
        cf = -v_ * Dginv
        d_c = d_inv[..., :C_]
        a1 = -(d_inv[..., C_:2 * C_] + reg) + cf
        a2 = -(d_inv[..., 2 * C_:3 * C_] + reg) + cf
        alpha = 0.5 * (a1 + a2)
        delta = 0.5 * (a1 - a2)
        g_u = alpha + cf                              # < 0, nonsingular
        # S = -P2 - diag(dmain) + band; dmain holds the NEGATED diagonal
        # corrections (matching the plain gamma path's convention).
        dmain = jnp.concatenate([
            d_c + reg,
            -(alpha - cf - delta * delta / g_u),
            jnp.full((B, q), reg, dt)], axis=-1)
        bn = -sq2 * cn * delta / g_u
        return cn, delta, g_u, dmain, bn

    def assemble_S2(dmain, bn):
        S = -P2 - jnp.where(jnp.asarray(diag_np), dmain[..., None, :], 0.0)
        wide = jnp.zeros((B, K2), dt).at[:, :C_].set(bn)
        return S + jnp.where(jnp.asarray(band_vc_np),
                             wide[..., None, :], 0.0)

    # Lazy block-grid assembly (mirrors the plain gamma path): S2 is never
    # materialized on the blocked pallas path.  Solve strategy on that
    # path: the EXPLICIT-INVERSE mode (ops/linalg.py inv_factor_blocks)
    # whenever the system fits INV_MAX_PANELS — each KKT solve is then
    # ONE batched matvec plus INV_REFINE structured-refinement steps
    # (residual from P2/diag/band, never a materialized S2), which also
    # lets ``refine > 0`` ride the lazy path; blocked LU + substitution
    # otherwise.  refine > 0 without inverse mode still needs dense S2.
    from lcp_physics_tpu.ops.linalg import (MAX_LANE_N, PANEL,
                                            _ru as _ru_, inv_supported)

    blocked_ok = (be == "pallas" and _ru_(K2, 8) > MAX_LANE_N)
    # refine > 0 only: at refine == 0 the blocked-LU substitution is
    # faster end to end (see the FWD_INV_SOLVE note at the top).
    inv_ok = (blocked_ok and FWD_INV_SOLVE and inv_supported(K2)
              and refine > 0)
    lazy_ok = blocked_ok and (refine == 0 or inv_ok)
    if lazy_ok:
        K_pad = _ru_(K2, PANEL)
        negP_pad = jnp.zeros((B, K_pad, K_pad), dt)
        negP_pad = negP_pad.at[:, :K2, :K2].set(-P2)
        if K_pad > K2:
            idxp = jnp.arange(K2, K_pad)
            negP_pad = negP_pad.at[:, idxp, idxp].set(1.0)
        band_pad = _np.zeros((K_pad, K_pad), bool)
        band_pad[:K2, :K2] = band_vc_np

        def make_get_block(dmain, bn):
            bn_wide = jnp.zeros((B, K2), dt).at[:, :C_].set(bn)

            def get_block(t, s):
                r0, c0 = t * PANEL, s * PANEL
                val = negP_pad[:, r0:r0 + PANEL, c0:c0 + PANEL]
                cs = slice(c0, min(c0 + PANEL, K2))
                w = cs.stop - cs.start
                if t == s and w > 0:
                    dsub = jnp.zeros((B, PANEL), dt).at[:, :w].set(
                        dmain[..., cs])
                    eye_p = jnp.eye(PANEL, dtype=dt)
                    val = val - dsub[..., None, :] * eye_p
                sub = band_pad[r0:r0 + PANEL, c0:c0 + PANEL]
                if sub.any():
                    wsub = jnp.zeros((B, PANEL), dt).at[:, :w].set(
                        bn_wide[..., cs])
                    val = val + jnp.where(jnp.asarray(sub),
                                          wsub[..., None, :], 0.0)
                return val
            return get_block

    def factor_rot(d_inv):
        Dg = d_inv[..., mg:] + reg                   # -S_gg diagonal
        Dginv = 1.0 / Dg
        cn, delta, g_u, dmain, bn = rot_scalars(d_inv, Dginv)
        if lazy_ok and inv_ok:
            from lcp_physics_tpu.ops.linalg import (inv_factor_blocks,
                                                    plu_solve)

            with _fwd_factor_ctx(fwd_precision):
                fac = inv_factor_blocks(make_get_block(dmain, bn), B, K2,
                                        dt, store_dt, exact=exact_fwd)
            apply_S2 = make_apply_S2(dmain, bn)
            n_ref = INV_REFINE + refine

            def solve_red(rhs_red, trans):
                x = plu_solve(fac, rhs_red, trans)
                for _ in range(n_ref):
                    r = rhs_red - apply_S2(x, trans)
                    x = x + plu_solve(fac, r, trans)
                return x
        elif lazy_ok:
            from lcp_physics_tpu.ops.linalg import plu_factor_blocks

            with _fwd_factor_ctx(fwd_precision):
                fac = plu_factor_blocks(make_get_block(dmain, bn), B, K2,
                                        dt, store_dt, exact=exact_fwd)
            S2 = None

            def solve_red(rhs_red, trans):
                return _solve_refined(fac, S2, rhs_red, be, trans, refine)
        else:
            S2 = assemble_S2(dmain, bn)
            with _fwd_factor_ctx(fwd_precision):
                fac = _factor(S2, be, store_dt, exact=exact_fwd)

            def solve_red(rhs_red, trans):
                return _solve_refined(fac, S2, rhs_red, be, trans, refine)

        def reduced(rhs, trans=0, r1_zero=False):
            # ``r1_zero``: caller guarantees the r1 (z-row) block is
            # structurally zero (the Mehrotra corrector-DELTA and gondzio
            # rhs), so the Ghat2 rhs transform — a full read of the
            # (B, K2, n) tensor — is skipped outright.
            # Returns (w_full, wk) WITHOUT the z block: the IPM loop
            # recovers z once per iteration from the SUMMED predictor +
            # corrector wk (z-recovery is linear in wk), halving the
            # (B, K2, n) 'highest' matvec count (round 4).
            r1, r2 = rhs[..., :n], rhs[..., n:]
            r_c = r2[..., :C_]
            r_f1 = r2[..., C_:2 * C_]
            r_f2 = r2[..., 2 * C_:3 * C_]
            rg = r2[..., mg:m]                       # gamma rows
            r_q = r2[..., m:]
            ru = (r_f1 + r_f2) / sq2
            rv = (r_f1 - r_f2) / sq2
            if r1_zero:
                t_c, t_v, t_q = r_c, rv, r_q
            else:
                with _precision_ctx():               # rhs transform: exact
                    y = jnp.einsum("bkn,bn->bk", Ghat2, qinv * r1)
                t_c = r_c - y[..., :C_]
                t_v = rv - y[..., C_:2 * C_]
                t_q = r_q - y[..., 2 * C_:]
            tD = Dginv * rg
            if trans == 0:
                # gamma rhs correction (Skg): friction rows get -v*tD
                # each -> u only; then eliminate u.
                t_u = ru - sq2 * v_ * tD
                rhs2 = jnp.concatenate(
                    [t_c, t_v - (delta / g_u) * t_u, t_q], axis=-1)
                wk = solve_red(rhs2, 0)
                w_c = wk[..., :C_]
                w_v = wk[..., C_:2 * C_]
                w_q = wk[..., 2 * C_:]
                w_u = (t_u - sq2 * cn * w_c - delta * w_v) / g_u
                # wg = -Dginv (rg - Sgk wk);  Sgk wk = -mu v w_c
                #   + v (w_f1 + w_f2) = -mu v w_c + sqrt2 v w_u
                wg = -Dginv * (rg - (-mu_v * w_c + sq2 * v_ * w_u))
            else:
                # transpose: Sgk^T rhs correction, then eliminate u of
                # S'^T (u-row [0, g_u, delta]; u-col [sqrt2 cn, delta]).
                t_c = t_c - mu_v * tD
                t_u = ru + sq2 * v_ * tD
                rhs2 = jnp.concatenate(
                    [t_c - sq2 * cn * t_u / g_u,
                     t_v - (delta / g_u) * t_u, t_q], axis=-1)
                wk = solve_red(rhs2, 1)
                w_c = wk[..., :C_]
                w_v = wk[..., C_:2 * C_]
                w_q = wk[..., 2 * C_:]
                w_u = (t_u - delta * w_v) / g_u
                # wg = -Dginv (rg - Skg^T wk);  Skg^T wk = -v (w_f1 +
                # w_f2) = -sqrt2 v w_u
                wg = -Dginv * (rg + sq2 * v_ * w_u)
            w_f1 = (w_u + w_v) / sq2
            w_f2 = (w_u - w_v) / sq2
            w_full = jnp.concatenate([w_c, w_f1, w_f2, wg, w_q], axis=-1)
            return w_full, wk

        def z_from(r1, wk):
            # Same formula for trans=0/1: the KKT coupling blocks are
            # exact transposes of each other (Ghat2 / Ghat2^T).
            with _precision_ctx():
                return qinv * (r1 - jnp.einsum("bkn,bk->bn", Ghat2, wk))

        def solve(rhs, trans=0, r1_zero=False):
            w_full, wk = reduced(rhs, trans, r1_zero)
            z = z_from(rhs[..., :n], wk)
            return jnp.concatenate([z, w_full], axis=-1)

        solve.reduced = reduced
        solve.z_from = z_from
        return solve

    # Compact residual operators (round 4): G's rotated structure means
    # the loop's residual matvecs never need the full (B, m, n) G — the
    # f2 rows are exact negatives of f1 and the gamma rows are zero, so
    # both the down (G z / A z) and up (G^T lam + A^T nu) products ride
    # the already-formed Ghat2 (B, K2, n), halving residual HBM bytes
    # and dropping the separate A matvecs.  Callers apply their own
    # precision context.
    C2 = F.C

    def res_down(z):
        y = jnp.einsum("bkn,bn->bk", Ghat2, z)        # (B, K2)
        gf1 = y[..., C2:2 * C2] / sq2
        Gz = jnp.concatenate(
            [y[..., :C2], gf1, -gf1,
             jnp.zeros(y.shape[:-1] + (m - 3 * C2,), dt)], axis=-1)
        return jnp.concatenate([Gz, y[..., 2 * C2:]], axis=-1)

    def res_up(lam, nu):
        u = jnp.concatenate(
            [lam[..., :C2],
             (lam[..., C2:2 * C2] - lam[..., 2 * C2:3 * C2]) / sq2,
             nu], axis=-1)
        return jnp.einsum("bkn,bk->bn", Ghat2, u)

    factor_rot.residual_ops = (res_down, res_up)
    factor_rot.has_reduced = True

    # Substrate of the fused per-ITERATION kernel (ops/ipm_iter.py):
    # a raw-explicit-inverse builder over the SAME lazy block grid, so
    # the kernel's two KKT solves per iteration are masked matvecs
    # against a VMEM-resident inverse.  Only attached when the blocked
    # pallas path with the block-Schur inverse is available.
    if lazy_ok and inv_supported(K2):
        from lcp_physics_tpu.ops.linalg import inv_factor_blocks

        def iter_inv_raw(d_inv):
            """(B, m) d_inv -> raw (B, K_pad, K_pad) explicit inverse of
            the rotated reduced system (identity on padding rows)."""
            Dginv = 1.0 / (d_inv[..., mg:] + reg)
            _cn, _delta, _gu, dmain, bn = rot_scalars(d_inv, Dginv)
            with _fwd_factor_ctx(fwd_precision):
                _tag, inv, _sh = inv_factor_blocks(
                    make_get_block(dmain, bn), B, K2, dt, store_dt,
                    exact=exact_fwd)
            return inv

        factor_rot.iter_inv_raw = iter_inv_raw
    return factor_rot


# Store forward-iteration blocked factors in bf16 on TPU: the MXU reads
# f32 operands as bf16 at default precision anyway, so the cast halves
# the HBM bytes of every block-substitution solve without changing the
# computed direction.  Round-2 measured this OFF (solves were then
# XLA-op-overhead bound and the cast cost ~2%); after the round-3
# friction-pair rotation the substitutions sit at the HBM roofline
# (tools/roofline.py: 0.43 ms vs 0.29 ms floor) and bf16 storage is a
# +8% dense-step win (11,248 -> 12,163 steps/s), so it is now ON.
# Never applied on the backward/one-shot path (traces without fwd_fast,
# at 'highest') nor when factor_precision='highest' requests an exact
# f32 factor.
FWD_FACTOR_STORE_BF16 = True


def _fwd_store_dtype(dt):
    if (FWD_FACTOR_STORE_BF16 and dt == jnp.float32
            and jax.default_backend() in ("tpu", "axon")):
        return jnp.bfloat16
    return None


def _factor(K, backend, solve_dtype=None, exact=False):
    if backend == "pallas":
        from lcp_physics_tpu.ops.linalg import plu_factor

        return plu_factor(K, solve_dtype=solve_dtype, exact=exact)
    return lu_factor(K)


_XLA_SOLVE_CHUNK = 1024


def _solve_refined(fac, K, rhs, backend, trans=0, refine=0):
    """Solve with optional iterative-refinement steps (recovers the digit
    an f32 factorization loses; exact no-op change at f64).  ``K`` may be
    None when refine == 0 (the lazy block-assembly path never
    materializes it)."""
    x = _solve(fac, rhs, backend, trans)
    for _ in range(refine):
        Kop = K if trans == 0 else jnp.swapaxes(K, -1, -2)
        with _precision_ctx():  # accurate residual is the point of refine
            r = rhs - jnp.einsum("bij,bj->bi", Kop, x)
        x = x + _solve(fac, r, backend, trans)
    return x


def _solve(fac, rhs, backend, trans=0):
    if backend == "pallas":
        from lcp_physics_tpu.ops.linalg import plu_solve

        return plu_solve(fac, rhs, trans=trans)
    B, nk = rhs.shape[0], rhs.shape[-1]
    if B > _XLA_SOLVE_CHUNK and B % _XLA_SOLVE_CHUNK == 0 and nk >= 88:
        # XLA's batched lu_solve allocates a scoped VMEM buffer that scales
        # with the batch and OOMs around B=4096, nk>=88 (PERF.md); chunk
        # the triangular solves so the 'xla' fallback stays usable.
        T = B // _XLA_SOLVE_CHUNK
        chop = lambda x: x.reshape((T, _XLA_SOLVE_CHUNK) + x.shape[1:])
        out = jax.lax.map(
            lambda a: lu_solve((a[0], a[1]), a[2], trans=trans),
            (chop(fac[0]), chop(fac[1]), chop(rhs)))
        return out.reshape((B, nk))
    return lu_solve(fac, rhs, trans=trans)


def _assemble_kkt(Q, G, A, F, d_inv, reg):
    """Reduced (slack-eliminated) KKT matrix K(d), batched.

    Q (B,n,n), G (B,m,n), A (B,q,n), F (B,m,m), d_inv (B,m) = s/lam.
    """
    B, n = Q.shape[0], Q.shape[-1]
    m, q = G.shape[-2], A.shape[-2]
    dt = Q.dtype
    eye_n = jnp.eye(n, dtype=dt)
    eye_m = jnp.eye(m, dtype=dt)
    eye_q = jnp.eye(q, dtype=dt)
    top = jnp.concatenate(
        [Q + reg * eye_n, jnp.swapaxes(G, -1, -2),
         jnp.swapaxes(A, -1, -2)], axis=-1)
    mid = jnp.concatenate(
        [G, F - d_inv[..., None] * eye_m - reg * eye_m,
         jnp.zeros((B, m, q), dt)], axis=-1)
    bot = jnp.concatenate(
        [A, jnp.zeros((B, q, m), dt),
         jnp.broadcast_to(-reg * eye_q, (B, q, q))], axis=-1)
    return jnp.concatenate([top, mid, bot], axis=-2)


def _split(sol, n, m):
    return sol[..., :n], sol[..., n:n + m], sol[..., n + m:]


def _max_step(v, dv, mask=None):
    """Per-instance largest alpha in (0, 1] with v + alpha*dv >= 0
    (restricted to ``mask`` rows when given)."""
    neg = dv < 0 if mask is None else (dv < 0) & mask
    ratio = jnp.where(neg, -v / jnp.where(neg, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio, axis=-1, initial=jnp.inf))


def _expand_batch(arrays, base_rank=(2, 1, 2, 1, 2, 1, 2)):
    """Promote single-instance inputs to batch-of-1; report whether any
    input was already batched."""
    batched = any(a.ndim == r + 1 for a, r in zip(arrays, base_rank))
    out = []
    B = max((a.shape[0] for a, r in zip(arrays, base_rank)
             if a.ndim == r + 1), default=1)
    for a, r in zip(arrays, base_rank):
        if a.ndim == r:
            a = jnp.broadcast_to(a[None], (B,) + a.shape)
        out.append(a)
    return batched, out


def solve_eq_kkt(Q, p, A, b, reg=None, backend="xla"):
    """Equality-only KKT solve: [[Q, A^T], [A, 0]] [z; nu] = [-p; b].

    The reference's contact-free fast path (``PdipmEngine.solve_dynamics``
    with no collisions) solves exactly this system.  Single-instance or
    batched.
    """
    with _precision_ctx():
        return _solve_eq_kkt(Q, p, A, b, reg, backend)


def _solve_eq_kkt(Q, p, A, b, reg=None, backend="xla"):
    single = Q.ndim == 2
    if single:
        Q, p, A, b = Q[None], p[None], A[None], b[None]
    B, n = Q.shape[0], Q.shape[-1]
    q = A.shape[-2]
    dt = Q.dtype
    if reg is None:
        reg = _dtype_consts(dt)["reg"]
    K = jnp.concatenate([
        jnp.concatenate([Q + reg * jnp.eye(n, dtype=dt),
                         jnp.swapaxes(A, -1, -2)], axis=-1),
        jnp.concatenate([A, -reg * jnp.eye(q, dtype=dt)
                         * jnp.ones((B, 1, 1), dt)], axis=-1),
    ], axis=-2)
    rhs = jnp.concatenate([-p, b], axis=-1)
    backend = resolve_backend(backend, n + q)
    sol = _solve(_factor(K, backend), rhs, backend)
    z, nu = sol[..., :n], sol[..., n:]
    if single:
        z, nu = z[0], nu[0]
    return z, nu


def pdipm_solve(Q, p, G, h, A, b, F, *, max_iter=20, tol=1e-7,
                backend="auto", q_diag=None, verbose=False,
                gamma_rows=0, q_is_diag=None, row_mask=None, refine=0,
                not_improved_lim=3, factor_precision=None,
                fric_pair=False, gondzio=0, stall_rtol=0.0):
    """Solve a batch of mixed-LCP instances (single instances are
    auto-promoted to a batch of one and squeezed back).

    Q may be passed in DIAGONAL form (shape matching p) — it is then never
    expanded to a dense matrix.  ``q_is_diag`` makes the interpretation
    explicit (None infers from shape).  ``q_diag`` (B, n): alternatively,
    pass a dense Q plus its diagonal to enable the Schur fast path
    (see make_kkt_factor) while keeping dense residual semantics.

    ``row_mask`` (B, m): 1.0 on REAL inequality rows, 0.0 on padding rows
    (zero G/F row, h > 0 — the engine's inactive contact slots).  Padded
    rows are pinned at their exact solution (s = h, lam ~ 0) and excluded
    from the complementarity measure, residual norm and step-length ratio
    test, so convergence is governed only by the physically active rows —
    a world with few active contacts no longer spends interior-point
    iterations centering its padding.

    ``not_improved_lim`` (0 = off): per-instance stall exit — an instance
    whose merit (complementarity + KKT residual) has not improved on its
    best for this many consecutive iterations freezes at its best iterate.
    This is the reference's ``notImprovedLim`` early exit (reference
    ``lcp_physics/lcp/solvers/batch.py::forward``), and it matters most at
    f32: contact-rich systems plateau at the f32 conditioning floor well
    above ``tol``, and without a stall exit they burn every remaining
    iteration making no progress.

    ``stall_rtol`` (0.0 = reference semantics): relative merit improvement
    required to RESET the stall counter.  With strict improvement (0.0),
    precision-floor plateau creep — merit shaving <1% per iteration near
    the f32/bf16 floor — keeps resetting the counter and iteration-bound
    scenes (fresh impacts every step) run to max_iter for no accuracy
    (measured: the joint-chain scene converges by ~iter 5 then creeps to
    12, PERF.md round 4).  A small value (0.01-0.05) exits the creep one
    ``not_improved_lim`` after significant progress stops; the returned
    iterate is still the strict best seen.

    ``gondzio`` (0 = off, reference Mehrotra semantics): number of Gondzio
    multiple-centrality-corrector rounds per iteration.  Each round reuses
    the iteration's factorization for one extra cheap solve, trading
    solves for iterations — worthwhile when the factorization dominates
    (large contact systems) and the solve genuinely converges (the
    accurate ``factor_precision='highest'`` profile).

    Returns a :class:`PdipmSolution`.
    """
    return _pdipm_solve(
        Q, p, G, h, A, b, F, max_iter=max_iter, tol=tol,
        backend=backend, q_diag=q_diag, verbose=verbose,
        gamma_rows=gamma_rows, q_is_diag=q_is_diag, row_mask=row_mask,
        refine=refine, not_improved_lim=not_improved_lim,
        factor_precision=factor_precision, fric_pair=fric_pair,
        gondzio=gondzio, stall_rtol=stall_rtol)


def _pdipm_solve(Q, p, G, h, A, b, F, *, max_iter, tol, backend, q_diag,
                 verbose, gamma_rows, q_is_diag, row_mask, refine,
                 not_improved_lim, factor_precision=None,
                 fric_pair=False, gondzio=0, stall_rtol=0.0):
    stall_rtol = float(stall_rtol)
    # Q may arrive in DIAGONAL form (shape == p.shape): the physics mass
    # matrix.  It is then never expanded to (B, n, n) — the Schur path
    # only needs its shape/dtype and the residuals use an elementwise
    # multiply.  This removes an O(B n^2) tensor + one dense matvec per
    # IPM iteration from the hot path.
    if q_is_diag is None:
        diag_form = Q.shape == p.shape or (Q.ndim == 1 and p.ndim == 2
                                           and Q.shape[0] == p.shape[-1])
    else:
        diag_form = bool(q_is_diag)
    q_rank = 1 if diag_form else 2
    cone = isinstance(F, ConeF)
    if cone:
        single, (Q, p, G, h, A, b, Fmu, Fv) = (lambda t: (not t[0], t[1]))(
            _expand_batch((Q, p, G, h, A, b, F.mu, F.valid),
                          (q_rank, 1, 2, 1, 2, 1, 1, 1)))
        F = ConeF(Fmu, Fv, F.fd)
    else:
        single, (Q, p, G, h, A, b, F) = (lambda t: (not t[0], t[1]))(
            _expand_batch((Q, p, G, h, A, b, F),
                          (q_rank, 1, 2, 1, 2, 1, 2)))
    B, n = p.shape[0], p.shape[-1]
    m = G.shape[-2]
    q = A.shape[-2]
    dt = Q.dtype
    consts = _dtype_consts(dt)
    reg = consts["reg"]
    if diag_form and q_diag is None:
        q_diag = Q
    # NOTE: backend stays unresolved here; make_kkt_factor / solve_eq_kkt
    # resolve 'auto' against the size of the system they actually factor
    # (the Schur/gamma-reduced size, not the dense KKT size).
    if q_diag is not None and q_diag.ndim == 1:
        q_diag = jnp.broadcast_to(q_diag[None], (B, n))

    def maybe_squeeze(sol):
        if single:
            sol = jax.tree.map(lambda x: x[0], sol)
        return sol

    def q_dense():
        return (Q[..., None] * jnp.eye(n, dtype=dt)) if diag_form else Q

    if m == 0:
        z, nu = solve_eq_kkt(q_dense(), p, A, b, reg, backend)
        zero_m = jnp.zeros((B, 0), dt)
        zero_b = jnp.zeros((B,), dt)
        return maybe_squeeze(PdipmSolution(
            z, zero_m, zero_m, nu, zero_b, zero_b,
            jnp.zeros((B,), jnp.int32)))

    if row_mask is not None and row_mask.ndim == 1:
        row_mask = jnp.broadcast_to(row_mask[None], (B, m))
    maskb = None if row_mask is None else row_mask.astype(bool)
    maskf = None if row_mask is None else row_mask.astype(dt)

    def comp_mu(s, lam):
        """Complementarity measure over REAL rows only."""
        if maskf is None:
            return jnp.sum(s * lam, axis=-1) / m
        return (jnp.sum(s * lam * maskf, axis=-1)
                / jnp.maximum(jnp.sum(maskf, axis=-1), 1.0))

    def masked_min(v):
        if maskb is None:
            return jnp.min(v, axis=-1, initial=jnp.inf)
        return jnp.min(jnp.where(maskb, v, jnp.inf), axis=-1,
                       initial=jnp.inf)

    def pin(s, lam):
        """Hold padded rows at their exact solution (s = h, lam ~ 0)."""
        if maskb is None:
            return s, lam
        return (jnp.where(maskb, s, h),
                jnp.where(maskb, lam, consts["tiny"]))

    kkt_factor = make_kkt_factor(Q, q_diag, G, A, F, reg, backend,
                                 gamma_rows if q_diag is not None else 0,
                                 refine=refine, fwd_fast=True,
                                 fwd_precision=factor_precision,
                                 fric_pair=fric_pair)
    # Round-4 loop fast paths exposed by the gamma/rot factories:
    # compact residual matvecs over Ghat (G's eliminated rows never
    # re-read) and deferred single z-recovery per iteration.
    res_ops = getattr(kkt_factor, "residual_ops", None)
    has_reduced = getattr(kkt_factor, "has_reduced", False)

    # ---- Fused whole-IPM kernel dispatch (ops/ipm.py): engine layout
    # (diag Q + ConeF + gamma elimination) with a small Schur system.
    # backend='fused' forces it (interpret mode off-TPU, for tests);
    # 'auto'/'pallas' use it automatically on TPU.
    fuse = False
    fuse_rot = False
    # gondzio correctors are a packed-loop feature; the fused kernel
    # targets small systems where iterations are solve-bound anyway.
    # verbose likewise forces the unfused loop: the kernel has no
    # per-iteration print channel (the reference's verbose dump is a
    # debugging surface, not a hot path).
    if (cone and q_diag is not None and gamma_rows == F.C
            and refine == 0 and max_iter > 0 and gondzio == 0
            and not verbose):
        from lcp_physics_tpu.ops.ipm import fused_supported

        # Prefer the friction-pair ROTATED kernel (K = 2C + q) when the
        # caller guarantees the ± pair structure; fall back to the plain
        # kernel when only the unrotated system fits MAX_FUSED_K.
        fuse_rot = bool(fric_pair) and fused_supported(
            m - F.C, q, F.C, F.fd, fric_pair=True)
        if fuse_rot or fused_supported(m - F.C, q, F.C, F.fd):
            if backend == "fused":
                fuse = True
            elif backend in ("auto", "pallas"):
                fuse = jax.default_backend() in ("tpu", "axon")

    # ---- Initialization: one Newton step from the origin with d_inv = 1,
    # then shift (s, lam) into the strict interior (qpth-style start).
    # (An IPM warm start from the previous rollout step was tried in round
    # 2 and measured WORSE at small iteration budgets — the previous
    # solution sits on the boundary and the first centering steps stall —
    # so cold start + best-iterate remains the only path.)
    ones_m = jnp.ones((B, m), dt)
    rhs0 = jnp.concatenate([-p, h, b], axis=-1)
    sol0 = kkt_factor(ones_m)(rhs0)
    z, lam, nu = _split(sol0, n, m)
    s = -lam  # with d_inv = 1 and zero complementarity residual, ds = -dlam
    shift = jax.nn.relu(1.0 - masked_min(s))
    s = s + shift[..., None]
    shift_l = jax.nn.relu(1.0 - masked_min(lam))
    lam = lam + shift_l[..., None]
    s, lam = pin(s, lam)

    if fuse:
        from lcp_physics_tpu.ops.ipm import fused_ipm

        rm = (row_mask if row_mask is not None
              else jnp.ones((B, m), dt))
        z, s, lam, nu, mu_c, resid, iters = fused_ipm(
            q_diag, p, G, h, A, b, F.mu, F.valid, rm, z, s, lam, nu,
            C=F.C, fd=F.fd, max_iter=max_iter, tol=tol, consts=consts,
            not_improved_lim=not_improved_lim, fric_pair=fuse_rot,
            stall_rtol=stall_rtol)
        return maybe_squeeze(PdipmSolution(
            z, s, lam, nu, mu_c, resid, iters))

    big = jnp.asarray(jnp.finfo(dt).max / 8, dt)
    GT = jnp.swapaxes(G, -1, -2)
    AT = jnp.swapaxes(A, -1, -2)

    def bmv(M, x):
        return jnp.einsum("bij,bj->bi", M, x)

    def Qmv(z):
        # q_diag covers both the diagonal-form input and callers that pass
        # dense Q alongside its diagonal; the elementwise product replaces
        # an O(n^2) matvec per iteration.
        return q_diag * z if q_diag is not None else bmv(Q, z)

    def Fmv(lam):
        return F.matvec(lam) if cone else bmv(F, lam)

    # ---- Packed-state loop (round 3). -----------------------------------
    # The while_loop body used to carry (z, s, lam, nu) as four arrays,
    # each with its own best-iterate select, freeze select, clamp, pin and
    # finite check — ~1.7 ms/iteration of XLA fusion-scheduling overhead
    # at B=256/K=384, on ~2.3 ms of real math (PERF.md round-2 profiler).
    # The iterate now lives in ONE (B, L) array X = [z | s | lam | nu]
    # (s and lam adjacent so the ratio test is a single masked reduction),
    # so every piece of bookkeeping is one fused op instead of four.
    L = n + 2 * m + q
    zs, ss, ls, nus = (slice(0, n), slice(n, n + m),
                       slice(n + m, n + 2 * m), slice(n + 2 * m, L))
    sls = slice(n, n + 2 * m)                    # s|lam block (contiguous)

    def pack(z, s, lam, nu):
        return jnp.concatenate([z, s, lam, nu], axis=-1)

    def unpack(X):
        return X[..., zs], X[..., ss], X[..., ls], X[..., nus]

    # Clamp floor: tiny on s/lam entries, -inf elsewhere (one fused max).
    neg_inf = -jnp.asarray(jnp.finfo(dt).max, dt)
    floor_row = jnp.concatenate([
        jnp.full((n,), neg_inf, dt), jnp.full((2 * m,), consts["tiny"], dt),
        jnp.full((q,), neg_inf, dt)])
    # Pin mask/value rows: padded inequality rows held at (s = h,
    # lam = tiny); z/nu entries always free.
    if maskb is not None:
        pinm = jnp.concatenate([
            jnp.ones((B, n), bool), maskb, maskb,
            jnp.ones((B, q), bool)], axis=-1)
        pinv = jnp.concatenate([
            jnp.zeros((B, n), dt), h,
            jnp.full((B, m), consts["tiny"], dt),
            jnp.zeros((B, q), dt)], axis=-1)
    # Residual-norm mask over packed [rx | rz | ry] (rz rows only).
    if maskb is not None:
        rmask = jnp.concatenate([
            jnp.ones((B, n), bool), maskb, jnp.ones((B, q), bool)], axis=-1)
    mask2 = None if maskb is None else jnp.concatenate([maskb, maskb], -1)

    def kkt_residuals_packed(X):
        # Accurate residuals are what lets bf16-precision directions
        # converge to f32-true solutions (see module precision note).
        z, s, lam, nu = unpack(X)
        with _precision_ctx():
            if res_ops is not None:
                down, up = res_ops
                ga = down(z)                             # [G z | A z]
                rx = Qmv(z) + p + up(lam, nu)
                rz = ga[..., :m] + Fmv(lam) + s - h
                ry = ga[..., m:] - b
            else:
                rx = Qmv(z) + p + bmv(GT, lam) + bmv(AT, nu)
                rz = bmv(G, z) + Fmv(lam) + s - h
                ry = bmv(A, z) - b
        return jnp.concatenate([rx, rz, ry], axis=-1)    # (B, n+m+q)

    def resid_norm_packed(r):
        r_ = r if maskb is None else jnp.where(rmask, r, 0.0)
        return jnp.max(jnp.abs(r_), axis=-1, initial=0.0)

    def merit_of(X):
        r = kkt_residuals_packed(X)
        return comp_mu(X[..., ss], X[..., ls]) + resid_norm_packed(r), r

    # ---- Fused per-ITERATION kernel dispatch (ops/ipm_iter.py): large
    # rotated systems (flagship K2 = 256) the whole-IPM kernel cannot
    # take.  The factor stays on the XLA/MXU blocked explicit-inverse
    # path; ONE Pallas kernel per iteration does residuals, both solves
    # (matvecs against the VMEM-resident inverse), ratio tests, updates
    # and stall/best-iterate bookkeeping.  backend='pallas'/'fused'
    # force it (interpret off-TPU, for tests); 'auto' requires TPU.
    iter_inv_raw = getattr(kkt_factor, "iter_inv_raw", None)
    fuse_iter = False
    if (FUSE_ITER and iter_inv_raw is not None and cone and refine == 0
            and gondzio == 0 and not verbose and not fuse
            and max_iter > 0):
        from lcp_physics_tpu.ops.ipm_iter import fused_iter_supported

        if fused_iter_supported(F.C, q, B, n=n):
            if backend in ("pallas", "fused"):
                fuse_iter = True
            elif backend == "auto":
                fuse_iter = jax.default_backend() in ("tpu", "axon")

    if fuse_iter:
        from lcp_physics_tpu.ops.ipm_iter import fused_iter_ipm

        rm = (row_mask if row_mask is not None else jnp.ones((B, m), dt))
        X0f = pack(z, s, lam, nu)
        Xf, bestXf, best_merit_f, iters = fused_iter_ipm(
            1.0 / q_diag, p, G, h, A, b, F.mu, F.valid, rm, X0f,
            C=F.C, q=q, max_iter=max_iter, tol=tol, consts=consts,
            not_improved_lim=not_improved_lim, inv_raw=iter_inv_raw,
            stall_rtol=stall_rtol)
        final_merit, _ = merit_of(Xf)
        Xf = jnp.where((best_merit_f < final_merit)[..., None],
                       bestXf, Xf)
        z, s, lam, nu = unpack(Xf)
        r = kkt_residuals_packed(Xf)
        return maybe_squeeze(PdipmSolution(
            z, s, lam, nu, comp_mu(s, lam), resid_norm_packed(r), iters))

    def body(i, carry):
        X, bestX, best_merit, done, iters, stall = carry

        r = kkt_residuals_packed(X)
        s, lam = X[..., ss], X[..., ls]
        mu = comp_mu(s, lam)
        merit = mu + resid_norm_packed(r)

        improved = merit < best_merit
        bestX = jnp.where(improved[..., None], X, bestX)

        # Reference notImprovedLim: stall counter per instance.  A stalled
        # instance freezes (its best iterate is returned below); iteration
        # i=0 always counts as improved (best_merit starts at +big).
        # The i >= lim + 2 floor keeps a SINGLE early step-length collapse
        # (alpha ~ 0 at iteration 1-2, merit bit-equal, next centering
        # step recovers) from freezing an instance at small stall limits;
        # measured no effect on the plateau scenes the exit is for.
        # stall_rtol > 0: only a SIGNIFICANT relative improvement resets
        # the counter.  Strict improvement keeps the stall counter alive
        # through precision-floor plateau CREEP (merit shaving ~0.1%/iter
        # at ~5e-5 — the measured joint-scene pattern, PERF.md round 4:
        # impact worlds converge by ~iter 5, then creep to max_iter), so
        # iteration-bound scenes burn 2x the iterations for <1% merit.
        # The best-iterate update above stays STRICT (no accuracy loss on
        # whatever iterate the creep does reach).
        sig = (merit < best_merit * (1.0 - stall_rtol)) if stall_rtol > 0 \
            else improved
        best_merit = jnp.minimum(merit, best_merit)
        stall = jnp.where(sig, 0, stall + 1)
        stalled = ((stall >= not_improved_lim)
                   & (i >= not_improved_lim + 2)) if not_improved_lim > 0 \
            else jnp.zeros_like(done)

        new_done = done | (merit < tol) | stalled
        iters = jnp.where(new_done & ~done, i, iters)

        if verbose:  # reference 'verbose' residual dump (SURVEY.md §5.1)
            jax.debug.print(
                "pdipm iter {i}: mu={mu:.3e} resid={r:.3e} done={d}/{B}",
                i=i, mu=jnp.max(mu), r=jnp.max(resid_norm_packed(r)),
                d=jnp.sum(new_done), B=new_done.shape[0])

        lam_safe = jnp.maximum(lam, consts["tiny"])
        d_inv = jnp.clip(s / lam_safe, consts["dinv_min"], consts["dinv_max"])
        kkt_solve = kkt_factor(d_inv)

        # Predictor (affine scaling) direction.  rhs = -r with the
        # complementarity correction added into the rz block.
        r4 = s * lam
        rhs_aff = (-r).at[..., n:n + m].add(r4 / lam_safe)
        if has_reduced:
            wa_full, wk_a = kkt_solve.reduced(rhs_aff)
            dlam_a = wa_full[..., :m]
        else:
            sol_a = kkt_solve(rhs_aff)
            dlam_a = sol_a[..., n:n + m]
        ds_a = -r4 / lam_safe - d_inv * dlam_a

        dsl_a = jnp.concatenate([ds_a, dlam_a], axis=-1)
        sl = X[..., sls]
        alpha_a = _max_step(sl, dsl_a, mask2)
        sl_aff = sl + alpha_a[..., None] * dsl_a
        mu_aff = comp_mu(sl_aff[..., :m], sl_aff[..., m:])
        sigma = jnp.clip(mu_aff / jnp.maximum(mu, consts["tiny"]),
                         0.0, 1.0) ** 3

        # Corrector (combined Mehrotra) direction, same factorization —
        # solved as predictor + DELTA: the KKT solve is linear in the rhs
        # and the corrector rhs differs from the affine one only in the
        # complementarity correction on the rz block, so the delta system
        # carries a structurally-zero r1 and skips the Ghat rhs transform
        # (one full read of the (B, K, n) tensor per iteration).
        r4c = r4 + ds_a * dlam_a - (sigma * mu)[..., None]
        rhs_d = jnp.zeros_like(r).at[..., n:n + m].set(
            (r4c - r4) / lam_safe)
        if has_reduced:
            wd_full, wk_d = kkt_solve.reduced(rhs_d, r1_zero=True)
            w_full = wa_full + wd_full
            dlam = w_full[..., :m]
            ds = -r4c / lam_safe - d_inv * dlam
            wk_tot = wk_a + wk_d
            if gondzio == 0:
                dz = kkt_solve.z_from(rhs_aff[..., :n], wk_tot)
            dX_tail = w_full[..., m:]
        else:
            sol_c = sol_a + kkt_solve(rhs_d, r1_zero=True)
            dlam = sol_c[..., n:n + m]
            ds = -r4c / lam_safe - d_inv * dlam
            dz = sol_c[..., :n]
            dX_tail = sol_c[..., n + m:]

        if has_reduced and gondzio > 0:
            # z-recovery must wait for the gondzio wk accumulation below
            # (acceptance masks keep it linear in wk).
            dz = jnp.zeros((B, n), dt)
        dX = jnp.concatenate([dz, ds, dlam, dX_tail], axis=-1)
        alpha_raw = _max_step(sl, dX[..., sls], mask2)

        # Gondzio multiple centrality correctors (static unroll; knob
        # default 0 = reference Mehrotra semantics).  Each round reuses
        # the iteration's factorization for ONE extra solve that pushes
        # the trial complementarity products toward the central-path box
        # [beta_min*mu_t, beta_max*mu_t], and is accepted per instance
        # only if it buys step length.  On the factor-dominated dense
        # path (factor ~1.2 ms vs ~0.4 ms/solve at B=256/K=384) a
        # corrector that saves even one iteration in three pays for
        # itself.  Reference: Gondzio, "Multiple centrality corrections
        # in a primal-dual method for linear programming" (1996).
        if gondzio > 0:
            mu_t = (sigma * mu)[..., None]
            for _ in range(gondzio):
                a_hat = jnp.minimum(alpha_raw + 0.08, 1.0)[..., None]
                sl_t = sl + a_hat * dX[..., sls]
                v_t = sl_t[..., :m] * sl_t[..., m:]
                tgt = jnp.clip(v_t, 0.1 * mu_t, 10.0 * mu_t)
                r4g = v_t - tgt
                if maskb is not None:
                    r4g = jnp.where(maskb, r4g, 0.0)
                rhs_g = jnp.zeros_like(r).at[..., n:n + m].set(
                    r4g / lam_safe)
                if has_reduced:
                    # z deferred: the ratio test only reads the s|lam
                    # block, and acceptance-masked wk accumulation keeps
                    # the final z-recovery linear.
                    wg_full, wk_g = kkt_solve.reduced(rhs_g, r1_zero=True)
                    dlam_g = wg_full[..., :m]
                    ds_g = -r4g / lam_safe - d_inv * dlam_g
                    dX_c = dX + jnp.concatenate(
                        [jnp.zeros((B, n), dt), ds_g, dlam_g,
                         wg_full[..., m:]], axis=-1)
                else:
                    sol_g = kkt_solve(rhs_g, r1_zero=True)
                    dlam_g = sol_g[..., n:n + m]
                    ds_g = -r4g / lam_safe - d_inv * dlam_g
                    dX_c = dX + jnp.concatenate(
                        [sol_g[..., :n], ds_g, dlam_g, sol_g[..., n + m:]],
                        axis=-1)
                alpha_c = _max_step(sl, dX_c[..., sls], mask2)
                ok = alpha_c >= jnp.minimum(alpha_raw + 0.008, 1.0)
                dX = jnp.where(ok[..., None], dX_c, dX)
                if has_reduced:
                    wk_tot = wk_tot + jnp.where(ok[..., None], wk_g, 0.0)
                alpha_raw = jnp.where(ok, alpha_c, alpha_raw)
            if has_reduced:
                dz = kkt_solve.z_from(rhs_aff[..., :n], wk_tot)
                dX = dX.at[..., :n].set(dz)

        alpha = (0.99 * alpha_raw)[..., None]

        X_n = jnp.maximum(X + alpha * dX, floor_row)
        if maskb is not None:
            X_n = jnp.where(pinm, X_n, pinv)

        # Divergence guard: freeze any instance that went non-finite.
        bad = ~jnp.all(jnp.isfinite(X_n), axis=-1)
        halt = new_done | bad

        X = jnp.where(halt[..., None], X, X_n)
        return X, bestX, best_merit, halt | done, iters, stall

    X0 = pack(z, s, lam, nu)
    init = (jnp.asarray(0, jnp.int32),
            (X0, X0, jnp.full((B,), big, dt),
             jnp.zeros((B,), bool), jnp.full((B,), max_iter, jnp.int32),
             jnp.zeros((B,), jnp.int32)))

    # Early exit once EVERY instance has converged/frozen: the custom_vjp
    # wrapper differentiates via the implicit KKT system, never through
    # this loop, so a while_loop costs nothing in reverse mode and saves
    # the tail iterations (typical scenes converge in ~6-8 of max 15-20).
    def cond(carry):
        i, (_, _, _, done, _, _) = carry
        return (i < max_iter) & ~jnp.all(done)

    def wl_body(carry):
        i, inner = carry
        return i + 1, body(i, inner)

    _, (X, bestX, best_merit, done, iters, _) = \
        jax.lax.while_loop(cond, wl_body, init)

    # Return the best iterate seen (covers non-monotone tails, mirroring
    # the reference's notImprovedLim best-iterate fallback).
    final_merit, _ = merit_of(X)
    use_best = (best_merit < final_merit)[..., None]
    X = jnp.where(use_best, bestX, X)
    z, s, lam, nu = unpack(X)
    mu = comp_mu(s, lam)
    r = kkt_residuals_packed(X)
    return maybe_squeeze(PdipmSolution(
        z, s, lam, nu, mu, resid_norm_packed(r), iters))
