"""Backward-pass decomposition of the dense training step (VERDICT r4
item 3 / SURVEY §3.2): where do the milliseconds of the fwd+bwd dense
rollout's BACKWARD go?

The dense 64-body 8-step B=256 training step measured 289.7 ms round 4
(forward ~125 ms), i.e. backward ~1.3x the forward, and only the matmul
precision of the backward had ever been swept (tools/bwd_sweep.py: not
precision-bound).  This tool times the backward's components in isolation
on the real TPU (device-side chained reps, bench.time_chained):

  fwd            jit loss (8-step scan rollout)
  fwd+bwd        value_and_grad of the same
  step-vjp       ONE step's full VJP pullback (forward linearization
                 excluded via vjp-once / pullback-many)
  lcp-bwd        the custom_vjp backward alone at flagship shapes
                 (= 'highest' P-plane + factor + ONE transposed KKT
                 solve + cotangent outer products)
  bwd-factor     make_kkt_factor under the backward's 'highest' ambient
  bwd-solve      the transposed solve against it (marginal, 2-solve - 1)
  outers         the bger cotangent outer products + dF/dQ given w
  asm-vjp        the assembly VJP pullback (contact Jacobian build
                 transposed: one-hot scatters become gathers)

Prints a table plus the residual "unexplained" time (scan/transpose
overhead, residual-op VJPs, integration VJP).

Usage:  python tools/bwd_roofline.py          (on the TPU)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world_scene, log, time_chained


def main():
    log(f"[bwd_roofline] devices: {jax.devices()}")
    from lcp_physics_tpu.core.step import make_assemble
    from lcp_physics_tpu.lcp import lcp_solve_full
    from lcp_physics_tpu.lcp.lcp import _lcp_bwd
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    B, n_steps = 256, 8
    N, C = 64, 128
    n, m = 3 * N, 4 * C
    static, params, states = build_world_scene(B, dense=True)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    bstep = make_batched_step(static, config)
    assemble, _ = make_assemble(static, config)
    assemble_b = jax.vmap(assemble, in_axes=(None, 0, None))

    # ---- whole-rollout forward vs fwd+bwd --------------------------------
    def loss(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return jnp.mean(out.p ** 2)

    def fb(params, states):
        v, g = jax.value_and_grad(loss)(params, states)
        return v, g.mass

    t_fwd = time_chained(loss, params, states, reps=40)
    t_fb = time_chained(fb, params, states, reps=20)
    t_bwd = t_fb - t_fwd
    log(f"[bwd_roofline] rollout fwd {t_fwd * 1e3:.1f} ms, fwd+bwd "
        f"{t_fb * 1e3:.1f} ms -> bwd {t_bwd * 1e3:.1f} ms "
        f"({t_bwd / t_fwd:.2f}x fwd; {t_bwd / n_steps * 1e3:.2f} ms/step)")

    # ---- one step's VJP pullback (linearize once, pull many) -------------
    def step1(params, states):
        s2, _ = bstep(params, states, 0.01)
        return s2.p, s2.v

    t_step = time_chained(step1, params, states, reps=40)
    _, pull = jax.vjp(step1, params, states)
    ct = (jnp.ones_like(states.p), jnp.ones_like(states.v))
    t_pull = time_chained(lambda c: pull(c), ct, reps=20)
    log(f"[bwd_roofline] one step: fwd {t_step * 1e3:.2f} ms, vjp "
        f"pullback {t_pull * 1e3:.2f} ms "
        f"(x{n_steps} steps = {t_pull * n_steps * 1e3:.1f} ms)")

    # ---- flagship-shape solver state for the lcp backward ---------------
    blocks, contacts = jax.jit(assemble_b)(params, states, 0.01)
    sol = jax.jit(lambda bl: lcp_solve_full(
        bl["Q"], bl["p"], bl["G"], bl["h"], bl["A"], bl["b"], bl["F"],
        q_is_diag=True, gamma_rows=C, row_mask=bl["row_mask"],
        max_iter=12, tol=1e-5, fric_pair=True))(blocks)
    g_ct = jnp.ones_like(sol.z)

    def lcp_bwd(z, s, lam, nu, g):
        residuals = (z, s, lam, nu, blocks["Q"], blocks["G"], blocks["A"],
                     blocks["F"], blocks["row_mask"])
        return _lcp_bwd(12, 1e-5, "auto", True, C, 0, 1, None, True, 0,
                        None, False, 0.0, residuals, g)

    t_lcp_bwd = time_chained(lcp_bwd, sol.z, sol.s, sol.lam, sol.nu, g_ct,
                             reps=40)

    # ---- inside the lcp backward: factor / solve / outers ----------------
    from lcp_physics_tpu.lcp.pdipm import _dtype_consts, make_kkt_factor
    from lcp_physics_tpu.lcp.util import bger

    consts = _dtype_consts(jnp.float32)
    d_inv = jnp.clip(sol.s / jnp.maximum(sol.lam, consts["tiny"]),
                     consts["dinv_min"], consts["dinv_max"])
    rhs = jnp.concatenate(
        [g_ct, jnp.zeros_like(sol.s), jnp.zeros_like(sol.nu)], -1)

    def bwd_factor_solve1(d_inv, rhs):
        with jax.default_matmul_precision("highest"):
            kkt = make_kkt_factor(blocks["Q"], blocks["Q"], blocks["G"],
                                  blocks["A"], blocks["F"], consts["reg"],
                                  "auto", gamma_rows=C, fric_pair=True)
            return kkt(d_inv)(rhs, 1)

    def bwd_factor_solve2(d_inv, rhs):
        with jax.default_matmul_precision("highest"):
            kkt = make_kkt_factor(blocks["Q"], blocks["Q"], blocks["G"],
                                  blocks["A"], blocks["F"], consts["reg"],
                                  "auto", gamma_rows=C, fric_pair=True)
            sl = kkt(d_inv)
            w1 = sl(rhs, 1)
            return sl(rhs + 0.1 * w1, 1)

    t_fs1 = time_chained(bwd_factor_solve1, d_inv, rhs, reps=40)
    t_fs2 = time_chained(bwd_factor_solve2, d_inv, rhs, reps=40)
    t_solve = max(t_fs2 - t_fs1, 1e-9)
    t_fac = max(t_fs1 - t_solve, 1e-9)

    def outers(w, z, lam, nu):
        wz, wl, wn = w[..., :n], w[..., n:n + m], w[..., n + m:]
        from lcp_physics_tpu.lcp.cone import ConeF
        F = blocks["F"]
        mg = F.m - F.C
        dF = ConeF(wl[..., mg:] * lam[..., :F.C],
                   jnp.zeros_like(F.valid), F.fd)
        return (-(wz * z), -wz, -(bger(wl, z) + bger(lam, wz)), wl,
                -(bger(wn, z) + bger(nu, wz)), wn, dF)

    w_full = jax.jit(bwd_factor_solve1)(d_inv, rhs)
    t_out = time_chained(outers, w_full, sol.z, sol.lam, sol.nu, reps=40)

    # ---- assembly VJP -----------------------------------------------------
    def asm(params, states):
        bl, _ = assemble_b(params, states, 0.01)
        return bl["Q"], bl["p"], bl["G"], bl["h"], bl["F"].mu

    t_asm = time_chained(asm, params, states, reps=40)
    outs, pull_a = jax.vjp(asm, params, states)
    ct_a = jax.tree.map(jnp.ones_like, outs)
    t_asm_vjp = time_chained(lambda c: pull_a(c), ct_a, reps=20)

    per_step_known = t_lcp_bwd + t_asm_vjp
    log("[bwd_roofline] component              ms/call")
    for name, t in [
            ("lcp custom_vjp bwd (total)", t_lcp_bwd),
            ("  bwd factor ('highest', incl P-plane)", t_fac),
            ("  bwd transposed solve (x1)", t_solve),
            ("  cotangent outers (dQ/dp/dG/dh/dA/dF)", t_out),
            ("assembly fwd (reference)", t_asm),
            ("assembly VJP pullback", t_asm_vjp),
            ("known per-step bwd (lcp_bwd + asm_vjp)", per_step_known),
            ("measured per-step bwd (rollout)", t_bwd / n_steps),
            ("measured per-step bwd (1-step vjp)", t_pull),
    ]:
        log(f"[bwd_roofline] {name:42s} {t * 1e3:8.3f}")
    unexplained = t_bwd / n_steps - per_step_known
    log(f"[bwd_roofline] unexplained per step: {unexplained * 1e3:.3f} ms "
        f"(scan overhead, residual/integration VJPs, cond both-sides)")


if __name__ == "__main__":
    main()
