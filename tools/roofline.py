"""Roofline / MFU accounting for the dense 64-body scene (PERF.md).

Times each component of the hot path on the real TPU with device-side
chained reps (bench.time_chained), pairs the measurements with analytic
FLOP and HBM-byte counts, and prints a markdown table of achieved vs
peak (TPU v5e: 197 TFLOP/s bf16 / ~49 TFLOP/s 3-pass f32, 819 GB/s HBM)
plus a latency-vs-bandwidth-vs-compute verdict per component.

Usage: python tools/roofline.py          (on the TPU)

Components (B = 256 worlds, n = 192 dofs, C = 128 contact slots,
m = 512 LCP rows, K = 2C = 256 rotated Schur rows, PANEL = 128):
  narrowphase+assembly   per step   vmapped find_contacts + G/h/F build
  P-plane (Ghat Qi GhatT) per solve  (B, K, n) x (B, K, n) batched matmul
  KKT factor             per iter   blocked LU w/ GJ panel inversion
  KKT solve              per iter   x2 (predictor + corrector)
  residuals              per iter   rx/rz matvecs at 'highest'
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import log, time_chained

# TPU v5e single-chip peaks.
PEAK_BF16 = 197e12          # FLOP/s, MXU, bf16 operands (default f32 dot)
PEAK_F32 = PEAK_BF16 / 4    # ~3-pass 'highest' f32 effective
PEAK_HBM = 819e9            # bytes/s


def build_dense_scene(B=256, hulls=False):
    """The bench's dense 64-body scene (bench.build_world_scene — ONE
    copy, so the roofline always describes the recorded workload) plus
    the solver config and assembly closure the components are timed
    under."""
    from lcp_physics_tpu.core.step import make_assemble
    from lcp_physics_tpu.utils import SimConfig

    from bench import build_world_scene

    static, params, states = build_world_scene(B, dense=True, hulls=hulls)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    assemble, _ = make_assemble(static, config)
    return static, params, states, config, assemble


def fmt(t_s, flops, bytes_):
    """ms, GFLOP, achieved TFLOP/s, % f32 peak, bytes-time, verdict."""
    tf = flops / t_s / 1e12
    mfu = flops / t_s / PEAK_F32 * 100
    t_bw = bytes_ / PEAK_HBM * 1e3           # ms if purely HBM-bound
    t_fl = flops / PEAK_F32 * 1e3            # ms if purely compute-bound
    t_ms = t_s * 1e3
    lat = t_ms - max(t_bw, t_fl)
    if t_ms < 1.6 * max(t_bw, t_fl):
        verdict = "compute" if t_fl > t_bw else "bandwidth"
    else:
        verdict = f"latency/overhead ({lat / t_ms * 100:.0f}% unexplained)"
    return (f"{t_ms:7.3f} | {flops / 1e9:8.2f} | {tf:6.2f} | {mfu:5.1f}% | "
            f"{bytes_ / 1e6:7.1f} | {t_bw:6.3f} | {t_fl:6.3f} | {verdict}")


def main():
    log(f"[roofline] devices: {jax.devices()}")
    B = 256
    static, params, states, config, assemble = build_dense_scene(B)
    n, C = 3 * 64, 128
    m, K, P = 4 * C, 2 * C, 128

    assemble_b = jax.vmap(assemble, in_axes=(None, 0, None))
    blocks, contacts = jax.jit(assemble_b)(params, states, 0.01)
    n_act = float(jnp.mean(jnp.sum(contacts.valid, axis=-1)))
    log(f"[roofline] dense circle scene: B={B} n={n} m={m} K_rot={K}, "
        f"avg {n_act:.1f} active contacts")

    # ---- realistic solver state (d_inv at a converged-ish iterate) ----
    from lcp_physics_tpu.lcp import lcp_solve_full
    sol = jax.jit(lambda bl: lcp_solve_full(
        bl["Q"], bl["p"], bl["G"], bl["h"], bl["A"], bl["b"], bl["F"],
        q_is_diag=True, gamma_rows=C, row_mask=bl["row_mask"],
        max_iter=8, tol=1e-5, fric_pair=True))(blocks)
    d_inv = jnp.clip(sol.s / jnp.maximum(sol.lam, 1e-30), 1e-6, 1e6)
    rhs = jnp.concatenate(
        [blocks["p"], blocks["h"], jnp.zeros((B, 0), jnp.float32)], -1)

    from lcp_physics_tpu.lcp.pdipm import _dtype_consts, make_kkt_factor
    reg = _dtype_consts(jnp.float32)["reg"]

    def make_fac():
        return make_kkt_factor(
            blocks["Q"], blocks["Q"], blocks["G"], blocks["A"],
            blocks["F"], reg, "auto", gamma_rows=C, fwd_fast=True,
            fric_pair=True)

    def f_factor_solve1(d_inv, rhs):
        return make_fac()(d_inv)(rhs, 0)

    def f_factor_solve2(d_inv, rhs):
        s = make_fac()(d_inv)
        y1 = s(rhs, 0)
        return s(rhs + 0.1 * y1, 0)        # sequential dep like Mehrotra

    def f_residuals(z_lam):
        z, lam = z_lam[..., :n], z_lam[..., n:]
        with jax.default_matmul_precision("highest"):
            rx = blocks["Q"] * z + blocks["p"] + jnp.einsum(
                "bmn,bm->bn", blocks["G"], lam)
            rz = jnp.einsum("bmn,bn->bm", blocks["G"], z) \
                + blocks["F"].matvec(lam) - blocks["h"]
        return rx, rz

    def f_narrow(p):
        from lcp_physics_tpu.core.geometry import find_contacts
        return find_contacts(p, params.verts, params.radius,
                             static.counts_np(), static.pair_lists(), C)

    z_lam = jnp.concatenate([sol.z, sol.lam], -1)
    narrow_b = jax.vmap(f_narrow)

    reps = 400
    t_asm = time_chained(lambda pr, st: assemble_b(pr, st, 0.01)[0],
                         params, states, reps=reps)
    t_nar = time_chained(lambda st: narrow_b(st.p), states, reps=reps)
    t_fs1 = time_chained(f_factor_solve1, d_inv, rhs, reps=reps)
    t_fs2 = time_chained(f_factor_solve2, d_inv, rhs, reps=reps)
    t_res = time_chained(f_residuals, z_lam, reps=reps)
    t_solve = max(t_fs2 - t_fs1, 1e-9)
    t_fac = max(t_fs1 - t_solve, 1e-9)

    # ---- analytic FLOPs / bytes (per batch of B, logical mul+add=2) ----
    fl = {}
    by = {}
    # P-plane: Ghat (B,K,n) x diag x Ghat^T -> (B,K,K), 3-pass f32.
    fl["pplane"] = B * 2 * K * K * n * 3
    by["pplane"] = B * 4 * (2 * K * n + K * K)
    # Factor: blocked LU, T=K/P panels: GJ inverse ~2P^3 per diag panel,
    # LU elimination ~(2/3)K^3, MXU trailing updates bf16 (1-pass).
    fl["factor"] = B * ((2 / 3) * K ** 3 + (K // P) * 2 * P ** 3)
    by["factor"] = B * 4 * 2 * K * K      # read S blocks + write factor
    # One KKT solve: 2 triangular substitutions (4K^2) + rhs/solution
    # transforms vs Ghat at 'highest' (2*2*K*n*3).
    fl["solve"] = B * (4 * K * K + 12 * K * n)
    by["solve"] = B * 4 * (2 * K * K + 2 * K * n)
    # Residual pass: rx (G^T lam) + rz (G z) at 'highest' + cone matvec.
    fl["resid"] = B * (2 * 2 * m * n * 3 + 6 * m)
    by["resid"] = B * 4 * (m * n + 2 * (m + n))
    # Narrowphase (2016 circle pairs, ~40 flops/pair SoA) — tiny.
    fl["narrow"] = B * 2016 * 40
    by["narrow"] = B * 4 * (2016 * 8)

    # P-plane is traced inside make_kkt_factor's closure creation; on the
    # timed path it folds into t_fac (factor includes it once per factor
    # call here, vs once per SOLVE in the real loop).  Report it within
    # the factor line and say so.
    hdr = ("component        |  ms/call | GFLOP/call | TFLOP/s |  MFU  | "
           "MB/call | bw-ms | fl-ms | bound")
    log("[roofline] " + hdr)
    rows = [
        ("narrowphase", t_nar, fl["narrow"], by["narrow"]),
        ("assembly(all)", t_asm, fl["narrow"] + B * 2 * m * n // 8,
         by["narrow"] + B * 4 * m * n // 4),
        ("factor(+Pplane)", t_fac, fl["factor"] + fl["pplane"],
         by["factor"] + by["pplane"]),
        ("kkt_solve(x1)", t_solve, fl["solve"], by["solve"]),
        ("residuals", t_res, fl["resid"], by["resid"]),
    ]
    for name, t, f, b in rows:
        log(f"[roofline] {name:16s}| " + fmt(t, f, b))

    # Whole-step accounting: measured bench step vs component sum.
    from lcp_physics_tpu.parallel import make_batched_step
    bstep = make_batched_step(static, config)

    def run_step(params, states):
        s2, _ = bstep(params, states, 0.01)
        return s2
    t_step = time_chained(run_step, params, states, reps=100)
    iters = float(jnp.mean(sol.iters))
    log(f"[roofline] full batched step: {t_step * 1e3:.2f} ms "
        f"({B / t_step:,.0f} steps/s x B); IPM iters ~{iters:.1f}; "
        f"per-iter (factor+2 solves+resid) = "
        f"{(t_fac + 2 * t_solve + t_res) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()
