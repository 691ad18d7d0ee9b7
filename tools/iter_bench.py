"""Per-iteration component microbench for the flagship dense scene.

Breaks the dense 64-body batched step's IPM cost into its per-iteration
components on the REAL device (run on the TPU; uses bench.time_chained
device-side timing — CLAUDE.md timing rules):

  * max_iter sweep -> marginal cost per IPM iteration, unfused loop
    (FUSE_ITER=False, blocked-LU factor) vs the fused per-iteration
    kernel (ops/ipm_iter.py, explicit-inverse factor);
  * factor-build vs per-solve marginals via the repeated-solve trick
    (factor+k solves for k = 1, 2: the difference is one solve);
  * the explicit-inverse build (iter_inv_raw) and its (B,K,K) lane
    transpose — the two per-iteration costs the fused kernel pays that
    the unfused loop does not.

Usage: python tools/iter_bench.py [--reps N]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world_scene, log, time_chained


def main():
    reps = 40
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])

    import lcp_physics_tpu.lcp.pdipm as pdipm
    from lcp_physics_tpu.core import make_assemble
    from lcp_physics_tpu.lcp import lcp_solve
    from lcp_physics_tpu.utils import SimConfig

    B, C = 256, 128
    log(f"[iter_bench] devices: {jax.devices()}")
    static, params, states = build_world_scene(B, dense=True)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    assemble, _ = make_assemble(static, config)
    # jit the assembly: eager vmapped dispatch over the axon tunnel is
    # ~1000x slower (CLAUDE.md) — thousands of 30 ms-RTT ops.
    blocks, _ = jax.jit(lambda pa, st: jax.vmap(
        assemble, in_axes=(None, 0, None))(pa, st, 0.01))(params, states)
    Q, p, G, h = blocks["Q"], blocks["p"], blocks["G"], blocks["h"]
    A, b, F, rmask = blocks["A"], blocks["b"], blocks["F"], blocks["row_mask"]
    n, m, q = p.shape[-1], h.shape[-1], b.shape[-1]
    log(f"[iter_bench] dense scene: B={B} n={n} m={m} q={q} K2={2*C+q}")

    # ---- 1. factor vs solve marginals (unfused blocked-LU path) --------
    from lcp_physics_tpu.lcp.pdipm import _dtype_consts, make_kkt_factor

    dt = p.dtype
    reg = _dtype_consts(dt)["reg"]
    # Q is in diagonal (B, n) form; the solver passes it as both the Q
    # and q_diag arguments (see _pdipm_solve's diag_form handling).
    kkt = make_kkt_factor(Q, Q, G, A, F, reg, "pallas", C,
                          refine=0, fwd_fast=True, fric_pair=True)
    rng = np.random.default_rng(0)
    d_inv = jnp.asarray(rng.uniform(0.5, 2.0, (B, m)), dt)
    rhs1 = jnp.asarray(rng.standard_normal((B, n + m + q)), dt)
    rhs2 = jnp.asarray(rng.standard_normal((B, n + m + q)), dt)

    def fac_k_solves(k):
        def f(d_inv, rhs1, rhs2):
            solve = kkt(d_inv)
            out = solve(rhs1)
            if k > 1:
                out = out + solve(rhs2)
            return out
        return f

    t1 = time_chained(fac_k_solves(1), d_inv, rhs1, rhs2, reps=reps)
    t2 = time_chained(fac_k_solves(2), d_inv, rhs1, rhs2, reps=reps)
    log(f"[iter_bench] LU factor+1solve {t1*1e3:.3f} ms, +2 {t2*1e3:.3f} "
        f"-> solve {(t2-t1)*1e3:.3f} ms, factor {(2*t1-t2)*1e3:.3f} ms")

    # reduced (no z-recovery) + z_from split
    def red_k(k):
        def f(d_inv, rhs1, rhs2):
            solve = kkt(d_inv)
            w, wk = solve.reduced(rhs1)
            if k > 1:
                w2, wk2 = solve.reduced(rhs2, r1_zero=True)
                w, wk = w + w2, wk + wk2
            z = solve.z_from(rhs1[..., :n], wk)
            return w, z
        return f

    r1 = time_chained(red_k(1), d_inv, rhs1, rhs2, reps=reps)
    r2 = time_chained(red_k(2), d_inv, rhs1, rhs2, reps=reps)
    log(f"[iter_bench] LU reduced+z: 1 {r1*1e3:.3f} ms, 2 {r2*1e3:.3f} "
        f"-> marginal reduced(r1_zero) {(r2-r1)*1e3:.3f} ms")

    # residual ops (compact Ghat2 matvecs)
    down, up = kkt.residual_ops
    zv = jnp.asarray(rng.standard_normal((B, n)), dt)
    lamv = jnp.asarray(rng.uniform(0.1, 1.0, (B, m)), dt)
    nuv = jnp.asarray(rng.standard_normal((B, q)), dt)

    def resid(zv, lamv, nuv):
        with jax.default_matmul_precision("highest"):
            return down(zv), up(lamv, nuv)

    tr = time_chained(resid, zv, lamv, nuv, reps=reps * 4)
    log(f"[iter_bench] residual down+up (2x Ghat2 'highest'): "
        f"{tr*1e3:.3f} ms")

    # ---- 3. explicit-inverse build + lane transpose ---------------------
    if getattr(kkt, "iter_inv_raw", None) is not None:
        inv_raw = kkt.iter_inv_raw

        ti = time_chained(lambda d: inv_raw(d), d_inv, reps=reps)
        log(f"[iter_bench] inverse build (iter_inv_raw): {ti*1e3:.3f} ms "
            f"(vs LU factor above)")

        def inv_t(d):
            return jnp.transpose(inv_raw(d), (1, 2, 0))

        tt = time_chained(inv_t, d_inv, reps=reps)
        log(f"[iter_bench] inverse build + (1,2,0) transpose: "
            f"{tt*1e3:.3f} ms -> transpose {(tt-ti)*1e3:.3f} ms")
    else:
        log("[iter_bench] iter_inv_raw not attached (xla backend?)")

    # ---- 3. (--sweep) max_iter sweep: marginal cost per IPM iteration,
    # unfused loop vs fused per-iteration kernel.  Compiles SIX full
    # solver programs — expensive through the tunnel, so opt-in.
    if "--sweep" not in sys.argv:
        return

    def solver(max_iter):
        def f(Q, p, G, h, A, b, F, rmask):
            # tol=0 / stall off: every lane runs exactly max_iter
            return lcp_solve(Q, p, G, h, A, b, F, max_iter=max_iter,
                             tol=0.0, gamma_rows=C, row_mask=rmask,
                             not_improved_lim=0, fric_pair=True)
        return f

    for fuse in (False, True):
        pdipm.FUSE_ITER = fuse
        ts = {}
        for mi in (1, 3, 7):
            sec = time_chained(solver(mi), Q, p, G, h, A, b, F, rmask,
                               reps=max(reps // 4, 20))
            ts[mi] = sec
            log(f"[iter_bench] FUSE_ITER={fuse} max_iter={mi}: "
                f"{sec*1e3:.2f} ms/solve-batch")
        marg = (ts[7] - ts[1]) / 6
        log(f"[iter_bench] FUSE_ITER={fuse}: marginal "
            f"{marg*1e3:.3f} ms/iteration, intercept "
            f"{(ts[1]-marg)*1e3:.2f} ms")
    pdipm.FUSE_ITER = False


if __name__ == "__main__":
    main()
