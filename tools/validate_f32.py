"""f32-on-TPU physics-quality regression guard (VERDICT r3 missing #3).

The entire pytest suite runs f64 on CPU (tests/conftest.py); the PRODUCTION
profile — f32, bf16 factor storage, solver_stall_lim=1, speculative
contacts — was historically validated only by bench throughput and manual
PERF.md probes, so a kernel "optimization" could silently degrade f32
physics with no red light.  This script asserts long-rollout physical
invariants at the production profile AND at the recommended accuracy
profile (solver_refine=2):

  1. dense resting grid: penetration stays bounded over 500 steps;
  2. gravity-free random scene: linear momentum conserved (contacts and
     friction are internal forces), state stays finite and bounded;
  3. box stack on a pinned ground: stays standing for 300 steps;
  4. bounce-height law: a dropped ball returns to ~e^2 h0.

Run it ON THE TPU (default backend under the driver) or on CPU-f32 with
--cpu.  Thresholds are stated per check with ~3x headroom over the
values measured on the real v5e — the full run is recorded in PERF.md
"f32 physics-quality guard (TPU v5e, round 5)": ALL PASS, 8/8 checks at
both profiles; a precision regression of one decade trips them.

Usage:  python tools/validate_f32.py [--cpu] [--quick]
"""
import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU in f32 (no x64) instead of the TPU")
    ap.add_argument("--quick", action="store_true",
                    help="shorter rollouts (CI smoke; thresholds unchanged)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from lcp_physics_tpu.core import (JointSpec, WorldState, default_params,
                                      make_scene_static, make_step_batched,
                                      rollout)
    from lcp_physics_tpu.utils import SimConfig

    print(f"devices: {jax.devices()}", flush=True)
    assert jnp.asarray(0.0).dtype == jnp.float32, (
        "validate_f32 must run WITHOUT x64 enabled")

    failures = []

    def check(name, ok, detail):
        status = "PASS" if ok else "FAIL"
        print(f"[validate_f32] {status} {name}: {detail}", flush=True)
        if not ok:
            failures.append(name)

    profiles = {
        "production": SimConfig(max_iter=12, solver_eps=1e-5),
        "refine2": SimConfig(max_iter=12, solver_eps=1e-5, solver_refine=2),
    }

    def scan_rollout(static, config, params, state, dt, n):
        bstep = make_step_batched(static, config)
        states = jax.tree.map(lambda x: x[None], state)
        fn = jax.jit(lambda p_, s: rollout(bstep, p_, s, dt, n,
                                           with_diagnostics=True))
        final, traj, rd = fn(params, states)
        return (jax.tree.map(lambda x: np.asarray(x)[0], final),
                jax.tree.map(lambda x: np.asarray(x)[:, 0], traj),
                jax.tree.map(lambda x: np.asarray(x)[0], rd))

    # ---- 1. dense resting grid: penetration bounded over 500 steps ------
    # 8x8 touching circles settling under gravity-toward-+y with a pinned
    # ground line below.  The velocity-level LCP + speculative activation
    # must keep the deepest penetration bounded; measured steady-state on
    # the v5e production profile is ~0.01-0.02 (radius 1.0 bodies, i.e.
    # 1-2% of a radius).  Threshold 0.06 = ~3x headroom.
    def dense_grid_scene():
        N = 64
        rng = np.random.default_rng(7)
        static = make_scene_static([1] * N, c_max=128)
        params = default_params(
            static, verts=np.zeros((N, 1, 2), np.float32),
            radius=np.full(N, 1.0, np.float32), gravity=(0.0, 10.0),
            restitution=0.3, dtype=jnp.float32)
        gx, gy = np.meshgrid(np.arange(8), np.arange(8))
        pos = np.stack([gx.ravel() * 2.01, gy.ravel() * 2.01], -1)
        pos = pos + rng.uniform(-0.005, 0.005, pos.shape)
        p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
        # pin the bottom row in place (a resting floor made of bodies)
        joints = [JointSpec(kind="total", body1=i,
                            ref=tuple(map(float, p[i])))
                  for i in range(N) if p[i, 2] > 13.9]
        static = make_scene_static([1] * N, joints=joints, c_max=128)
        state = WorldState(p=jnp.asarray(p),
                           v=jnp.zeros((N, 3), jnp.float32),
                           t=jnp.zeros((), jnp.float32))
        return static, params, state

    n_dense = 100 if args.quick else 500
    for tag, cfg in profiles.items():
        static, params, state = dense_grid_scene()
        final, traj, rd = scan_rollout(static, cfg, params, state,
                                       0.01, n_dense)
        pen = float(rd.max_penetration)
        ok = np.isfinite(traj.p).all() and pen <= 0.06
        check(f"dense-grid penetration [{tag}]", ok,
              f"max penetration over {n_dense} steps = {pen:.4f} "
              f"(threshold 0.06)")

    # ---- 2. gravity-free momentum conservation ---------------------------
    # Contacts and friction are internal: total linear momentum of a
    # colliding cluster must be conserved.  f32 production profile
    # measured drift is ~1e-3 relative over 200 steps; threshold 1e-2.
    def free_cluster_scene():
        N = 16
        rng = np.random.default_rng(8)
        static = make_scene_static([1] * N, c_max=64)
        params = default_params(
            static, verts=np.zeros((N, 1, 2), np.float32),
            radius=np.full(N, 1.0, np.float32), gravity=(0.0, 0.0),
            restitution=0.6, dtype=jnp.float32)
        pos = rng.uniform(0.0, 7.0, (N, 2))
        p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
        v = rng.normal(0, 2.0, (N, 3)).astype(np.float32)
        state = WorldState(p=jnp.asarray(p), v=jnp.asarray(v),
                           t=jnp.zeros((), jnp.float32))
        return static, params, state

    n_free = 50 if args.quick else 200
    for tag, cfg in profiles.items():
        static, params, state = free_cluster_scene()
        final, traj, rd = scan_rollout(static, cfg, params, state,
                                       0.01, n_free)
        m = np.asarray(params.mass)[:, None]
        p0 = (m * np.asarray(state.v)[:, 1:3]).sum(0)
        p1 = (m * final.v[:, 1:3]).sum(0)
        scale = max(float(np.linalg.norm(p0)), 1.0)
        drift = float(np.linalg.norm(p1 - p0)) / scale
        ok = np.isfinite(traj.p).all() and drift <= 1e-2 \
            and float(np.abs(final.p).max()) < 100.0
        check(f"momentum conservation [{tag}]", ok,
              f"relative drift over {n_free} steps = {drift:.2e} "
              f"(threshold 1e-2)")

    # ---- 3. box-stack stability ------------------------------------------
    # Four unit boxes stacked on a pinned ground slab must stay standing:
    # horizontal drift of the top box < 0.2 over 300 steps.
    def stack_scene():
        boxes = 4
        sq = np.array([[-1.0, -0.5], [1.0, -0.5], [1.0, 0.5], [-1.0, 0.5]],
                      np.float32)
        ground = np.array([[-8.0, -0.5], [8.0, -0.5], [8.0, 0.5],
                           [-8.0, 0.5]], np.float32)
        N = boxes + 1
        verts = np.zeros((N, 4, 2), np.float32)
        verts[:boxes] = sq
        verts[boxes] = ground
        counts = [4] * N
        joints = [JointSpec(kind="total", body1=boxes,
                            ref=(0.0, 0.0, 2.0))]
        static = make_scene_static(counts, joints=joints, c_max=32)
        params = default_params(
            static, verts=verts, radius=np.zeros(N, np.float32),
            gravity=(0.0, 10.0), restitution=0.0, fric_coeff=0.9,
            dtype=jnp.float32)
        # stack grows upward = decreasing y (gravity pulls +y onto ground
        # at y = 2.0); box k at y = 1.0 - k, with small x/rot perturbations
        # so the equilibrium is not exactly symmetric (an unperturbed
        # stack measured literally 0.000 drift — no test value).
        rng = np.random.default_rng(9)
        p = np.zeros((N, 3), np.float32)
        p[:boxes, 2] = 1.0 - np.arange(boxes)
        p[:boxes, 1] = rng.uniform(-0.03, 0.03, boxes)
        p[:boxes, 0] = rng.uniform(-0.01, 0.01, boxes)
        p[boxes, 2] = 2.0
        state = WorldState(p=jnp.asarray(p),
                           v=jnp.zeros((N, 3), jnp.float32),
                           t=jnp.zeros((), jnp.float32))
        return static, params, state

    n_stack = 80 if args.quick else 300
    for tag, cfg in profiles.items():
        static, params, state = stack_scene()
        final, traj, rd = scan_rollout(static, cfg, params, state,
                                       0.01, n_stack)
        top = int(np.argmin(np.asarray(state.p)[:, 2]))
        drift_x = float(abs(final.p[top, 1] - np.asarray(state.p)[top, 1]))
        tilt = float(abs(final.p[top, 0]))
        ok = (np.isfinite(traj.p).all() and drift_x < 0.2 and tilt < 0.2
              and float(rd.max_penetration) < 0.1)
        check(f"box-stack stability [{tag}]", ok,
              f"top-box |dx| = {drift_x:.3f}, |rot| = {tilt:.3f}, "
              f"max pen = {float(rd.max_penetration):.3f} over "
              f"{n_stack} steps (thresholds 0.2 / 0.2 / 0.1)")

    # ---- 4. bounce-height law --------------------------------------------
    # Ball dropped from height h0 onto a pinned slab with restitution e
    # rebounds to ~e^2 h0.  dt-discretization alone costs a few percent;
    # threshold 15% relative.
    def bounce_scene(e):
        ground = np.array([[-8.0, -0.5], [8.0, -0.5], [8.0, 0.5],
                           [-8.0, 0.5]], np.float32)
        verts = np.zeros((2, 4, 2), np.float32)
        verts[1] = ground
        static = make_scene_static(
            [1, 4], joints=[JointSpec(kind="total", body1=1,
                                      ref=(0.0, 0.0, 2.0))], c_max=8)
        params = default_params(
            static, verts=verts, radius=np.array([1.0, 0.0], np.float32),
            gravity=(0.0, 10.0), restitution=e, fric_coeff=0.0,
            dtype=jnp.float32)
        p = np.array([[0.0, 0.0, -4.0], [0.0, 0.0, 2.0]], np.float32)
        state = WorldState(p=jnp.asarray(p),
                           v=jnp.zeros((2, 3), jnp.float32),
                           t=jnp.zeros((), jnp.float32))
        return static, params, state

    e = 0.7
    h0 = 0.5 + 4.0  # drop height above resting contact (ground top 1.5,
    # ball radius 1.0 -> rest center y = 0.5; start center y = -4.0)
    for tag, cfg in profiles.items():
        static, params, state = bounce_scene(e)
        final, traj, rd = scan_rollout(static, cfg, params, state,
                                       0.005, 500)
        y = traj.p[:, 0, 2]
        # first rebound apex: minimum y after the first contact
        hit = np.argmax(y > 0.45)  # near resting height = contact
        apex = float(y[hit:hit + 260].min())
        h1 = 0.5 - apex
        rel = abs(h1 - e * e * h0) / (e * e * h0)
        ok = np.isfinite(y).all() and rel < 0.15
        check(f"bounce-height law [{tag}]", ok,
              f"rebound h1 = {h1:.3f} vs e^2 h0 = {e*e*h0:.3f} "
              f"(rel err {rel:.1%}, threshold 15%)")

    if failures:
        print(f"[validate_f32] FAILED: {failures}", flush=True)
        sys.exit(1)
    print("[validate_f32] ALL PASS", flush=True)


if __name__ == "__main__":
    main()
