"""Fused whole-IPM Pallas kernel for small contact systems.

This is SURVEY.md §7 step 7 / the BASELINE north star's "batched PDIPM
... becomes a fused Pallas kernel": for the ENGINE problem layout
(diagonal Q, ConeF friction coupling, gamma-eliminated Schur system of
K = mg + q rows small enough for the lane layout), every Mehrotra
iteration — residuals, Schur assembly, pivotless explicit-inverse
factorization (Gauss-Jordan; each KKT solve is then one masked matvec
plus a refinement step), predictor + corrector solves, step-length
ratio tests and masked updates — runs inside ONE Pallas kernel over
(feature, lane) tiles, with the world batch on the vector lanes.

Nothing in the iteration is cross-lane (worlds are independent; all
reductions run over feature dims), so the kernel is a direct
transcription of lcp/pdipm.py's loop body into the lane layout.  A
tile-level early exit (`lax.cond` on "every lane in this tile done")
preserves the while-loop savings per lane tile.

The XLA-side wrapper (`fused_ipm`) precomputes P = Ghat Q^-1 Ghat^T
(one MXU matmul) and the qpth-style initialization (one lane-kernel
factor+solve through the regular path), then hands the whole loop to
the kernel.  pdipm_solve dispatches here when the problem matches;
equivalence against the unfused path is tested in
tests/test_fused_ipm.py.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lcp_physics_tpu.ops.linalg import _interpret, _ru, _safe_inv

# The kernel holds several (K, K, L) values live at once; keep K modest
# so a useful lane count still fits VMEM (64-body scenes with K = 384
# stay on the blocked-LU path).
MAX_FUSED_K = 48


def fused_supported(mg, q, C, fd, fric_pair=False):
    """Whether the fused kernel can take this engine-layout system.

    ``fric_pair=True`` (the engine's guarantee that the two friction
    rows per contact are exact negatives, see lcp/pdipm.py
    ``_rot_factor_factory``) enables the ROTATED kernel, whose Schur
    system is 2C + q rows instead of (1 + fd)C + q — larger scenes fit
    under MAX_FUSED_K and the K^2 tile work shrinks ~2.25x.
    """
    if not (0 < C and mg == C * (1 + fd)):
        return False
    K = (2 * C + q) if (fric_pair and fd == 2) else (mg + q)
    return K <= MAX_FUSED_K


# The 16 MiB scoped-vmem default is a compiler limit, not physical
# VMEM — _IPM_VMEM_LIMIT legalizes bigger tiles (same trick as linalg's
# GJ kernels).  Measured: actual scoped usage runs ~1.6x the per_lane
# model below (staging + live assembly temporaries), so the budget
# keeps ~2x headroom under the limit.
_IPM_VMEM_LIMIT = 64 * 1024 * 1024


def _tile_lanes(n, m, q, K, itemsize=4, B=None):
    """Lanes per grid cell: P + S + Ghat tiles, ~2 live K^2 temporaries
    during assembly, the best-iterate scratch and vectors.

    Tile-size regime (v5e, K=16 headline sweep): with the explicit-
    inverse factor the kernel is no longer purely latency-bound — the
    (K, K, L) rank-1 GJ updates scale with L while grid cells pipeline
    their DMA, so SMALL tiles win (cap 128: 3.20M, 256: 3.14M, 1024:
    3.04M, 2048: 2.79M solves/s).  Cap 256; the VMEM budget term only
    binds for large K, where it shrinks L below the cap anyway.

    With ``B`` given the tile never exceeds the 128-padded batch (the
    round-4 version padded the BATCH up to the tile: a B = 64 call ran
    256 lanes, 4x wasted width — same defect class as linalg._lane_tile,
    VERDICT r4 item 6)."""
    per_lane = itemsize * (8 * K * K + K * n + 8 * (n + m + q) + 16)
    budget = _IPM_VMEM_LIMIT // 2
    L = max(1, budget // (per_lane * 128)) * 128
    L = int(min(L, 256))
    if B is None:
        return L
    units = -(-max(B, 1) // 128)
    cells = -(-units // (L // 128))
    return (-(-units // cells)) * 128


def _structure_masks(C, fd, q):
    """Static (K, K) structural masks of the cone Schur correction."""
    mg = C * (1 + fd)
    K = mg + q
    Mn = np.zeros((K, K), np.float32)   # [f(d,i), n_i]
    Mf = np.zeros((K, K), np.float32)   # [f(d,i), f(d2,i)]
    for d in range(fd):
        for i in range(C):
            r = C * (1 + d) + i
            Mn[r, i] = 1.0
            for d2 in range(fd):
                Mf[r, C * (1 + d2) + i] = 1.0
    return Mn, Mf


def _fused_ipm_kernel(dims, consts, max_iter, tol, fd, not_improved_lim,
                      rot, stall_rtol, *refs):
    n, m, q, C = dims
    mg = m - C
    # rot: friction-pair ROTATED Schur system (lcp/pdipm.py
    # _rot_factor_factory math transcribed to the lane layout).  The two
    # friction rows per contact are exact negatives, so the rotated
    # (u, v) = ((f1±f2)/√2) basis gives a factored system of K = 2C + q
    # rows (vs (1+fd)C + q): one third fewer sequential pivot steps and
    # a 2.25x smaller (K, K, L) tile per elimination op at fd = 2.
    # Ghat_ref then holds Ghat2 = [G_c; √2·G_f1; A] and Mn/Mf are absent
    # (the rotated corrections are a diagonal + one (v,c) band, built
    # from iota masks inline).
    if rot:
        (P_ref, Ghat_ref, qinv_ref, p_ref,
         h_ref, b_ref, mu_ref, valid_ref, rmask_ref,
         z0_ref, s0_ref, lam0_ref, nu0_ref,
         z_ref, s_ref, lam_ref, nu_ref, stats_ref,
         S_ref, best_ref, state_ref, flag_ref) = refs
        Mn_ref = Mf_ref = None
    else:
        (P_ref, Ghat_ref, Mn_ref, Mf_ref, qinv_ref, p_ref,
         h_ref, b_ref, mu_ref, valid_ref, rmask_ref,
         z0_ref, s0_ref, lam0_ref, nu0_ref,
         z_ref, s_ref, lam_ref, nu_ref, stats_ref,
         S_ref, best_ref, state_ref, flag_ref) = refs
    K = (2 * C + q) if rot else (mg + q)
    sq2 = float(np.sqrt(2.0))
    dt = P_ref.dtype
    tiny, reg = consts["tiny"], consts["reg"]
    dinv_min, dinv_max = consts["dinv_min"], consts["dinv_max"]
    L = P_ref.shape[-1]

    i_K = jax.lax.broadcasted_iota(jnp.int32, (K, 1, 1), 0)
    j_K = jax.lax.broadcasted_iota(jnp.int32, (1, K, 1), 1)
    qd = 1.0 / qinv_ref[...]
    zero_q = jnp.zeros((max(q, 1), L), dt)

    def matvec_T(M, v):                  # (a, b, L), (a, L) -> (b, L)
        return jnp.sum(M * v[:, None, :], axis=0)

    def matvec(M, v):                    # (a, b, L), (b, L) -> (a, L)
        return jnp.sum(M * v[None, :, :], axis=1)

    def max_abs(x, mask=None):
        xa = jnp.abs(x)
        if mask is not None:
            xa = jnp.where(mask, xa, 0.0)
        return jnp.max(xa, axis=0)

    def max_step(v, dv, mask):
        neg = (dv < 0) & mask
        ratio = jnp.where(neg, -v / jnp.where(neg, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, axis=0, initial=jnp.inf))

    def tile_fd(x):                      # (C, L) -> (fd*C, L)
        return jnp.concatenate([x] * fd, axis=0)

    def cone_matvec(lam):
        """F @ lam (m, L)."""
        lam_n, beta, gamma = lam[:C], lam[C:mg], lam[mg:]
        v = valid_ref[...]
        bsum = sum(beta[d * C:(d + 1) * C] for d in range(fd))
        return jnp.concatenate(
            [jnp.zeros((C, L), dt), tile_fd(-(v * gamma)),
             -mu_ref[...] * lam_n + v * bsum], axis=0)

    def residuals(z, s, lam, nu):
        if rot:
            # Residuals stay in the ORIGINAL row layout; only the matvecs
            # ride Ghat2.  G^T lam = Ghat2^T [lam_c; (lam_f1-lam_f2)/√2;
            # nu] and G_f2 z = -G_f1 z (the ± pair guarantee).
            lam_v = (lam[C:2 * C] - lam[2 * C:3 * C]) / sq2
            lam_k = jnp.concatenate(
                [lam[:C], lam_v] + ([nu[:q]] if q else []), axis=0)
            rx = qd * z + p_ref[...] + matvec_T(Ghat_ref[...], lam_k)
            y = matvec(Ghat_ref[...], z)  # [G_c z; √2·G_f1 z; A z]
            Gf1 = y[C:2 * C] / sq2
            Gz_kept = jnp.concatenate([y[:C], Gf1, -Gf1], axis=0)
            Flam = cone_matvec(lam)
            rz = jnp.concatenate([Gz_kept + Flam[:mg], Flam[mg:]],
                                 axis=0) + s - h_ref[...]
            ry = y[2 * C:] - b_ref[:q] if q else None
            return rx, rz, ry
        lam_k = (jnp.concatenate([lam[:mg], nu[:q]], axis=0) if q
                 else lam[:mg])
        rx = qd * z + p_ref[...] + matvec_T(Ghat_ref[...], lam_k)
        Gz = matvec(Ghat_ref[...], z)    # (K, L) = [Gk z ; A z]
        Flam = cone_matvec(lam)
        rz = jnp.concatenate([Gz[:mg] + Flam[:mg], Flam[mg:]], axis=0) \
            + s - h_ref[...]
        ry = Gz[mg:] - b_ref[:q] if q else None
        return rx, rz, ry

    rmask = rmask_ref[...] > 0
    rcount = jnp.maximum(jnp.sum(rmask_ref[...], axis=0), 1.0)

    def measures(z, s, lam, nu):
        rx, rz, ry = residuals(z, s, lam, nu)
        mu_c = jnp.sum(jnp.where(rmask, s * lam, 0.0), axis=0) / rcount
        resid = jnp.maximum(max_abs(rx), max_abs(rz, rmask))
        if q:
            resid = jnp.maximum(resid, max_abs(ry))
        return rx, rz, ry, mu_c, resid

    def lu_solve_lane(rhs):
        """Apply the in-place INVERSE stored in S_ref: x = S^-1 rhs.

        The kernel is latency-bound, so the factor loop below builds the
        explicit Gauss-Jordan inverse instead of an LU factor — each of
        the two KKT solves per IPM iteration is then ONE (K, K, L)
        masked matvec instead of a 2K-step sequential substitution
        chain (per iteration: ~K sequential ops total, down from ~5K).
        Pivotless is stable here for the same reason as the LU it
        replaces: the Schur system is regularized quasi-definite.
        """
        return jnp.sum(S_ref[...] * rhs[None, :, :], axis=1)

    def body(it, _):
        # state lives in refs; pl.when skips everything once every lane in
        # this tile is done (Mosaic-friendly: no value-carried control flow)
        @pl.when(flag_ref[0] == 0)
        def _():
            z, s, lam = z_ref[...], s_ref[...], lam_ref[...]
            nu = nu_ref[...]
            rx, rz, ry, mu_c, resid = measures(z, s, lam, nu)
            merit = mu_c + resid

            best_merit = state_ref[pl.ds(0, 1), :][0]
            done = state_ref[pl.ds(1, 1), :][0] > 0.5
            improved = (merit < best_merit)[None]
            best_ref[:n, :] = jnp.where(improved, z, best_ref[:n, :])
            best_ref[n:n + m, :] = jnp.where(improved, s,
                                             best_ref[n:n + m, :])
            best_ref[n + m:n + 2 * m, :] = jnp.where(
                improved, lam, best_ref[n + m:n + 2 * m, :])
            best_ref[n + 2 * m:, :] = jnp.where(improved, nu,
                                                best_ref[n + 2 * m:, :])
            state_ref[0, :] = jnp.minimum(merit, best_merit)

            # reference notImprovedLim stall exit (state row 3);
            # stall_rtol > 0: only a >= rtol relative improvement resets
            # the counter (plateau-creep exit — see lcp/pdipm.py)
            sig = ((merit < best_merit * (1.0 - stall_rtol))
                   if stall_rtol > 0 else improved[0])
            stall = state_ref[pl.ds(3, 1), :][0]
            stall = jnp.where(sig, 0.0, stall + 1.0)
            state_ref[3, :] = stall
            # i >= lim + 2 floor: mirror pdipm.py's early-collapse guard
            stalled = ((stall >= not_improved_lim)
                       & (it >= not_improved_lim + 2)
                       if not_improved_lim > 0 else jnp.zeros_like(done))
            new_done = done | (merit < tol) | stalled
            iters = state_ref[pl.ds(2, 1), :][0]
            state_ref[2, :] = jnp.where(new_done & ~done,
                                        jnp.float32(it), iters)

            # ---- Schur assembly + in-place LU --------------------------
            lam_safe = jnp.maximum(lam, tiny)
            d_inv = jnp.clip(s / lam_safe, dinv_min, dinv_max)
            Dginv = 1.0 / (d_inv[mg:] + reg)
            cn = valid_ref[...] * mu_ref[...] * Dginv         # (C, L)
            cf = -valid_ref[...] * Dginv
            pad = [jnp.zeros((q, L), dt)] if q else []
            if rot:
                # rotated scalars (_rot_factor_factory rot_scalars): the
                # u rows are eliminated in closed form, leaving only a
                # diagonal correction and one (v-row, c-col) band.
                a1 = -(d_inv[C:2 * C] + reg) + cf
                a2 = -(d_inv[2 * C:3 * C] + reg) + cf
                alpha_r = 0.5 * (a1 + a2)
                delta = 0.5 * (a1 - a2)
                g_u = alpha_r + cf                   # < 0, nonsingular
                dmain = jnp.concatenate(
                    [d_inv[:C] + reg,
                     -(alpha_r - cf - delta * delta / g_u)]
                    + ([jnp.full((q, L), reg, dt)] if q else []), axis=0)
                bn_wide = jnp.concatenate(
                    [-sq2 * cn * delta / g_u,
                     jnp.zeros((K - C, L), dt)], axis=0)      # by COLUMN
                band_vc = (i_K - C == j_K) & (j_K < C)
                S_ref[...] = (-P_ref[...]
                              - jnp.where(i_K == j_K,
                                          dmain[:, None, :], 0.0)
                              + jnp.where(band_vc,
                                          bn_wide[None, :, :], 0.0))

                def apply_S(x):
                    # S @ x from the structured form (S_ref holds the
                    # INVERSE after the GJ loop; the refinement residual
                    # needs the original operator)
                    extra = jnp.concatenate(
                        [jnp.zeros((C, L), dt), bn_wide[:C] * x[:C]]
                        + ([jnp.zeros((q, L), dt)] if q else []), axis=0)
                    return -matvec(P_ref[...], x) - dmain * x + extra
            else:
                delta = g_u = None
                diag_k = (jnp.concatenate(
                    [d_inv[:mg] + reg, jnp.full((q, L), reg, dt)], axis=0)
                    if q else d_inv[:mg] + reg)
                cn_row = jnp.concatenate(
                    [jnp.zeros((C, L), dt), tile_fd(cn)] + pad,
                    axis=0)                                   # (K, L)
                cf_row = jnp.concatenate(
                    [jnp.zeros((C, L), dt), tile_fd(cf)] + pad, axis=0)
                S_ref[...] = (
                    -P_ref[...]
                    - jnp.where(i_K == j_K, diag_k[:, None, :], 0.0)
                    + Mn_ref[...][:, :, None] * cn_row[:, None, :]
                    + Mf_ref[...][:, :, None] * cf_row[:, None, :])

                def apply_S(x):
                    # S @ x: the Mn/Mf corrections are per-contact bands
                    # (row (1+d)C+i picks x[i] / the friction sum of
                    # contact i), so no (K, K) product is needed.
                    xfsum = sum(x[C * (1 + d):C * (2 + d)]
                                for d in range(fd))
                    extra = jnp.concatenate(
                        [jnp.zeros((C, L), dt),
                         tile_fd(cn * x[:C] + cf * xfsum)] + pad, axis=0)
                    return -matvec(P_ref[...], x) - diag_k * x + extra

            def gj_step(k, _c):
                # classic in-place Gauss-Jordan inverse, no pivoting:
                # after K steps S_ref holds S^-1 (see lu_solve_lane).
                diag = S_ref[pl.ds(k, 1), pl.ds(k, 1), :]     # (1, 1, L)
                dinv = _safe_inv(diag)
                row = S_ref[pl.ds(k, 1), :, :]                # (1, K, L)
                col = S_ref[:, pl.ds(k, 1), :]                # (K, 1, L)
                newrow = row * dinv
                is_kr = i_K == k
                is_kc = j_K == k
                Snew = S_ref[...] - col * newrow              # rank-1
                Snew = jnp.where(is_kc, -col * dinv, Snew)
                Snew = jnp.where(is_kr, newrow, Snew)
                S_ref[...] = jnp.where(is_kr & is_kc, dinv, Snew)
                return 0

            jax.lax.fori_loop(0, K, gj_step, 0)

            def solve_S(rhs):
                # explicit-inverse apply + ONE refinement step: recovers
                # substitution-class accuracy (the raw inverse's forward
                # error ~kappa*eps loses the last digits as
                # complementarity tightens) at O(1) sequential cost.
                x = lu_solve_lane(rhs)
                return x + lu_solve_lane(rhs - apply_S(x))

            def kkt_solve(r1, r2m, ry_):
                tg = r2m[mg:m]
                tD = Dginv * tg
                if rot:
                    # rotated forward solve (_rot_factor_factory solve,
                    # trans=0): rotate friction rhs to (u, v), eliminate
                    # u in closed form, solve the K = 2C + q system,
                    # reconstruct (f1, f2) and the gamma rows.
                    ru = (r2m[C:2 * C] + r2m[2 * C:3 * C]) / sq2
                    rv = (r2m[C:2 * C] - r2m[2 * C:3 * C]) / sq2
                    y = matvec(Ghat_ref[...], qinv_ref[...] * r1)
                    t_c = r2m[:C] - y[:C]
                    t_v = rv - y[C:2 * C]
                    t_u = ru - sq2 * valid_ref[...] * tD
                    rhs2 = jnp.concatenate(
                        [t_c, t_v - (delta / g_u) * t_u]
                        + ([ry_ - y[2 * C:]] if q else []), axis=0)
                    wk = solve_S(rhs2)
                    w_c, w_v = wk[:C], wk[C:2 * C]
                    w_u = (t_u - sq2 * cn * w_c - delta * w_v) / g_u
                    wg = -Dginv * (tg - (-mu_ref[...] * w_c
                                         + sq2 * valid_ref[...] * w_u))
                    dz = qinv_ref[...] * (
                        r1 - matvec_T(Ghat_ref[...], wk))
                    dlam = jnp.concatenate(
                        [w_c, (w_u + w_v) / sq2, (w_u - w_v) / sq2, wg],
                        axis=0)
                    dnu = wk[2 * C:] if q else zero_q
                    return dz, dlam, dnu
                rk = (jnp.concatenate([r2m[:mg], ry_], axis=0) if q
                      else r2m[:mg])
                tk = rk - matvec(Ghat_ref[...], qinv_ref[...] * r1)
                skg = jnp.concatenate(
                    [jnp.zeros((C, L), dt),
                     tile_fd(-valid_ref[...] * tD)] + pad, axis=0)
                wk = solve_S(tk + skg)
                wf = sum(wk[C * (1 + d):C * (2 + d)] for d in range(fd))
                wg = -Dginv * (tg - (-mu_ref[...] * wk[:C]
                                     + valid_ref[...] * wf))
                dz = qinv_ref[...] * (r1 - matvec_T(Ghat_ref[...], wk))
                dlam = jnp.concatenate([wk[:mg], wg], axis=0)
                dnu = wk[mg:] if q else zero_q
                return dz, dlam, dnu

            # ---- predictor ----------------------------------------------
            r4 = s * lam
            neg_ry = -ry if q else None
            dz_a, dlam_a, _d = kkt_solve(-rx, -rz + r4 / lam_safe, neg_ry)
            ds_a = -r4 / lam_safe - d_inv * dlam_a

            alpha_a = jnp.minimum(max_step(s, ds_a, rmask),
                                  max_step(lam, dlam_a, rmask))
            mu_aff = jnp.sum(jnp.where(
                rmask, (s + alpha_a[None] * ds_a)
                * (lam + alpha_a[None] * dlam_a), 0.0), axis=0) / rcount
            sigma = jnp.clip(mu_aff / jnp.maximum(mu_c, tiny),
                             0.0, 1.0) ** 3

            # ---- corrector ----------------------------------------------
            r4c = s * lam + ds_a * dlam_a - (sigma * mu_c)[None]
            dz, dlam, dnu = kkt_solve(-rx, -rz + r4c / lam_safe, neg_ry)
            ds = -r4c / lam_safe - d_inv * dlam

            alpha = (0.99 * jnp.minimum(max_step(s, ds, rmask),
                                        max_step(lam, dlam, rmask)))[None]
            z_n = z + alpha * dz
            s_n = jnp.maximum(s + alpha * ds, tiny)
            lam_n = jnp.maximum(lam + alpha * dlam, tiny)
            s_n = jnp.where(rmask, s_n, h_ref[...])   # pin padded rows
            lam_n = jnp.where(rmask, lam_n, tiny)
            nu_n = nu + alpha * dnu if q else nu

            bad = ~(jnp.all(jnp.isfinite(z_n), axis=0)
                    & jnp.all(jnp.isfinite(s_n), axis=0)
                    & jnp.all(jnp.isfinite(lam_n), axis=0))
            halt = (new_done | bad)[None]
            z_ref[...] = jnp.where(halt, z, z_n)
            s_ref[...] = jnp.where(halt, s, s_n)
            lam_ref[...] = jnp.where(halt, lam, lam_n)
            nu_ref[...] = jnp.where(halt, nu, nu_n)
            all_halt = halt[0] | done
            state_ref[1, :] = all_halt.astype(dt)
            flag_ref[0] = jnp.all(all_halt).astype(jnp.int32)
        return 0

    big = jnp.asarray(jnp.finfo(dt).max / 8, dt)
    z_ref[...] = z0_ref[...]
    s_ref[...] = s0_ref[...]
    lam_ref[...] = lam0_ref[...]
    nu_ref[...] = nu0_ref[...]
    best_ref[:n, :] = z0_ref[...]
    best_ref[n:n + m, :] = s0_ref[...]
    best_ref[n + m:n + 2 * m, :] = lam0_ref[...]
    best_ref[n + 2 * m:, :] = nu0_ref[...]
    state_ref[0, :] = jnp.full((L,), big, dt)      # best_merit
    state_ref[1, :] = jnp.zeros((L,), dt)          # done flags
    state_ref[2, :] = jnp.full((L,), jnp.float32(max_iter), dt)  # iters
    state_ref[3, :] = jnp.zeros((L,), dt)          # stall counters
    flag_ref[0] = 0

    jax.lax.fori_loop(0, max_iter, body, 0)

    # return the best iterate seen (non-monotone tails)
    z, s, lam, nu = (z_ref[...], s_ref[...], lam_ref[...], nu_ref[...])
    _, _, _, mu_f, resid_f = measures(z, s, lam, nu)
    best_merit = state_ref[pl.ds(0, 1), :][0]
    use_best = (best_merit < mu_f + resid_f)[None]
    z = jnp.where(use_best, best_ref[:n, :], z)
    s = jnp.where(use_best, best_ref[n:n + m, :], s)
    lam = jnp.where(use_best, best_ref[n + m:n + 2 * m, :], lam)
    nu = jnp.where(use_best, best_ref[n + 2 * m:, :], nu)
    z_ref[...] = z
    s_ref[...] = s
    lam_ref[...] = lam
    nu_ref[...] = nu
    _, _, _, mu_c, resid = measures(z, s, lam, nu)
    stats_ref[0, :] = mu_c
    stats_ref[1, :] = resid
    stats_ref[2, :] = state_ref[pl.ds(2, 1), :][0]


def fused_ipm(q_diag, p, G, h, A, b, mu_v, valid, row_mask,
              z0, s0, lam0, nu0, *, C, fd, max_iter, tol, consts,
              not_improved_lim=0, fric_pair=False, stall_rtol=0.0):
    """Run the fused IPM loop.  Inputs in the solver's (B, ...) layout;
    the gamma rows of G must be zero (engine layout).  ``fric_pair``
    additionally asserts the two friction rows per contact are exact
    negatives (engine assembly guarantee) and runs the ROTATED kernel
    (K = 2C + q Schur rows — see _fused_ipm_kernel).  Returns
    (z, s, lam, nu, mu, resid, iters)."""
    B, n = p.shape
    m = h.shape[-1]
    q = A.shape[-2]
    mg = m - C
    rot = bool(fric_pair) and fd == 2
    K = (2 * C + q) if rot else (mg + q)
    dt = p.dtype

    qinv = 1.0 / q_diag
    if rot:
        sq2 = jnp.sqrt(jnp.asarray(2.0, dt))
        Ghat = jnp.concatenate(
            [G[:, :C, :], sq2 * G[:, C:2 * C, :], A], axis=-2)
    else:
        Ghat = jnp.concatenate([G[:, :mg, :], A], axis=-2)  # (B, K, n)
    from lcp_physics_tpu.lcp.pdipm import _precision_ctx
    with _precision_ctx():
        P = jnp.einsum("bkn,bn,bjn->bkj", Ghat, qinv, Ghat)
    Mn, Mf = (None, None) if rot else _structure_masks(C, fd, q)

    L = _tile_lanes(n, m, q, K, jnp.dtype(dt).itemsize, B=B)
    B_pad = _ru(max(B, 1), L)

    def lanes(x, feat):
        """(B, feat) -> (feat, B_pad) transposed + padded."""
        xp = jnp.zeros((B_pad, feat), dt).at[:B].set(
            x.reshape(B, feat))
        return xp.T

    def lanes3(x, a, c):
        xp = jnp.zeros((B_pad, a, c), dt).at[:B].set(x)
        return jnp.transpose(xp, (1, 2, 0))

    qp1 = max(q, 1)
    mask_args = [] if rot else [jnp.asarray(Mn, dt), jnp.asarray(Mf, dt)]
    args = [
        lanes3(P, K, K), lanes3(Ghat, K, n), *mask_args,
        lanes(qinv, n), lanes(p, n), lanes(h, m),
        lanes(b if q else jnp.ones((B, 1), dt), qp1),
        lanes(mu_v, C), lanes(valid, C), lanes(row_mask, m),
        lanes(z0, n), lanes(s0, m), lanes(lam0, m),
        lanes(nu0 if q else jnp.ones((B, 1), dt), qp1),
    ]

    vec = lambda feat: pl.BlockSpec((feat, L), lambda i: (0, i),
                                    memory_space=pltpu.VMEM)
    mat = lambda a, c: pl.BlockSpec((a, c, L), lambda i: (0, 0, i),
                                    memory_space=pltpu.VMEM)
    full = lambda a, c: pl.BlockSpec((a, c), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM)

    dims = (n, m, q, C)
    mask_specs = [] if rot else [full(K, K), full(K, K)]
    out = pl.pallas_call(
        partial(_fused_ipm_kernel, dims, consts, max_iter, tol, fd,
                not_improved_lim, rot, float(stall_rtol)),
        grid=(B_pad // L,),
        in_specs=[mat(K, K), mat(K, n), *mask_specs,
                  vec(n), vec(n), vec(m), vec(qp1),
                  vec(C), vec(C), vec(m),
                  vec(n), vec(m), vec(m), vec(qp1)],
        out_specs=(vec(n), vec(m), vec(m), vec(qp1), vec(3)),
        out_shape=(
            jax.ShapeDtypeStruct((n, B_pad), dt),
            jax.ShapeDtypeStruct((m, B_pad), dt),
            jax.ShapeDtypeStruct((m, B_pad), dt),
            jax.ShapeDtypeStruct((qp1, B_pad), dt),
            jax.ShapeDtypeStruct((3, B_pad), dt),
        ),
        scratch_shapes=[pltpu.VMEM((K, K, L), dt),
                        pltpu.VMEM((n + 2 * m + max(q, 1), L), dt),
                        pltpu.VMEM((4, L), dt),
                        pltpu.SMEM((1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_IPM_VMEM_LIMIT),
        interpret=_interpret(),
    )(*args)
    z_t, s_t, lam_t, nu_t, stats_t = out
    z = z_t.T[:B]
    s = s_t.T[:B]
    lam = lam_t.T[:B]
    nu = nu_t.T[:B, :q]
    mu_c = stats_t.T[:B, 0]
    resid = stats_t.T[:B, 1]
    iters = stats_t.T[:B, 2].astype(jnp.int32)
    return z, s, lam, nu, mu_c, resid, iters
