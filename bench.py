"""Benchmark driver entry point.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} for the
primary north-star metric (batched contact-LCP solves/sec/chip; target
10,000 — BASELINE.md).  Secondary metrics (world steps/sec on the 64-body
scene, fwd+bwd rollout latency) go to stderr.

Runs on whatever backend JAX selects (the real TPU chip under the driver),
float32.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

NORTH_STAR = 10_000.0  # LCP solves/sec/chip target (BASELINE.json)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_fn(fn, *args, iters=5):
    """Wall-time fn averaged over iters, forcing full device->host sync
    (block_until_ready alone does not sync through the axon tunnel)."""
    _materialize(fn(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _materialize(out)
    return (time.perf_counter() - t0) / iters


def _materialize(tree):
    return [float(jnp.ravel(x)[0]) for x in jax.tree.leaves(tree)
            if hasattr(x, "ravel") and x.size]


def time_chained(fn, *args, reps=10):
    """Device-side timing: run fn `reps` times inside one jit with a data
    dependency chain, so per-call tunnel latency amortizes away."""
    @jax.jit
    def g(*a):
        def body(i, acc):
            out = fn(*jax.tree.map(
                lambda x: x + acc * 1e-30 if jnp.issubdtype(
                    jnp.asarray(x).dtype, jnp.floating) else x, a))
            leaves = [jnp.sum(l) for l in jax.tree.leaves(out)
                      if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
            return acc + sum(leaves)
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(g(*args))  # compile + warm
    t0 = time.perf_counter()
    float(g(*args))
    return (time.perf_counter() - t0) / reps


def bench_lcp_solves(B=4096):
    """Batched contact-LCP solves, assembled EXACTLY as the engine does:
    B random 8-body worlds -> (diagonal-Q, G, h, F with the friction-cone
    structure, padded slots) -> one fused solver call (Schur + gamma
    elimination + lane-batched Pallas LU)."""
    from lcp_physics_tpu.core import (WorldState, default_params,
                                      make_assemble, make_scene_static)
    from lcp_physics_tpu.lcp import lcp_solve
    from lcp_physics_tpu.utils import SimConfig

    N, C = 8, 8
    rng = np.random.default_rng(0)
    static = make_scene_static([1] * N, c_max=C)
    params = default_params(
        static, verts=np.zeros((N, 1, 2), np.float32),
        radius=np.full(N, 1.0, np.float32), gravity=(0.0, 10.0),
        restitution=0.4, dtype=jnp.float32)
    config = SimConfig(max_iter=15, solver_eps=1e-6)
    assemble, _ = make_assemble(static, config)

    # random near-contact cluster states: plenty of active contacts
    pos = rng.uniform(0, 5.0, (B, N, 2)).astype(np.float32)
    p = np.concatenate([np.zeros((B, N, 1), np.float32), pos], -1)
    v = rng.standard_normal((B, N, 3)).astype(np.float32)
    states = WorldState(p=jnp.asarray(p), v=jnp.asarray(v),
                        t=jnp.zeros((B,), jnp.float32))
    blocks, contacts = jax.vmap(assemble, in_axes=(None, 0, None))(
        params, states, 0.01)
    n_active = float(jnp.mean(jnp.sum(contacts.valid, axis=-1)))
    m = blocks["G"].shape[-2]
    q = blocks["A"].shape[-2]

    def solve(Q, p, G, h, A, b, F, row_mask):
        # not_improved_lim mirrors SimConfig.solver_stall_lim (the engine
        # default this bench represents), not lcp_solve's API default (3,
        # reference parity).
        from lcp_physics_tpu.utils import SimConfig
        return lcp_solve(Q, p, G, h, A, b, F, max_iter=15, tol=1e-6,
                         gamma_rows=C, row_mask=row_mask,
                         not_improved_lim=SimConfig.solver_stall_lim,
                         fric_pair=True)

    # reps=800: the single end-of-chain materialization costs ~30 ms of
    # tunnel RTT; on a ~1.3 ms batch that is +0.15 ms/rep at reps=200
    # (11% bias) but +0.04 ms/rep here (~3%) — CLAUDE.md timing note.
    sec = time_chained(solve, blocks["Q"], blocks["p"], blocks["G"],
                       blocks["h"], blocks["A"], blocks["b"], blocks["F"],
                       blocks["row_mask"], reps=800)
    rate = B / sec
    log(f"[bench] batched contact LCP (engine-assembled): B={B} n={3*N} "
        f"m={m} q={q}, avg {n_active:.1f} active contacts: "
        f"{sec * 1e3:.1f} ms/batch -> {rate:,.0f} solves/sec")
    return rate


def build_world_scene(B=256, dense=False, hulls=False, c_max=128):
    """The canonical 64-body bench scene, shared with tools/roofline.py
    (the roofline accounting must describe the SAME workload the bench
    records).  Returns (static, params, states).

    dense=False: loose grid (free flight, ~0 active contacts).
    dense=True: touching grid with ~90 persistent contacts per world.
    hulls=True: 64 unit squares instead of circles (2016 static hull
    pairs through the SAT/clipping narrowphase)."""
    from lcp_physics_tpu.core import (WorldState, default_params,
                                      make_scene_static)
    from lcp_physics_tpu.parallel import tile_state

    N = 64
    rng = np.random.default_rng(1)
    if hulls:
        counts = [4] * N
        sq = np.array([[-1.0, -1.0], [1.0, -1.0], [1.0, 1.0], [-1.0, 1.0]],
                      np.float32)
        verts = np.broadcast_to(sq, (N, 4, 2)).copy()
        radius = np.zeros(N, np.float32)
    else:
        counts = [1] * N
        verts = np.zeros((N, 1, 2), np.float32)
        radius = np.full(N, 1.0, np.float32)
    static = make_scene_static(counts, c_max=c_max)
    params = default_params(
        static, verts=verts, radius=radius, gravity=(0.0, 10.0),
        restitution=0.4, dtype=jnp.float32)
    gx, gy = np.meshgrid(np.arange(8), np.arange(8))
    if dense:
        # touching grid + small velocities: ~90 persistent contacts/world
        pos = np.stack([gx.ravel() * 2.01, gy.ravel() * 2.01], -1)
        pos = pos + rng.uniform(-0.01, 0.01, pos.shape)
        v0 = rng.normal(0, 0.5, (N, 3)).astype(np.float32)
    else:
        # loose grid with small jitter: some touching, most free
        pos = np.stack([gx.ravel() * 2.6, gy.ravel() * 2.6], -1)
        pos = pos + rng.uniform(-0.25, 0.25, pos.shape)
        v0 = np.zeros((N, 3), np.float32)
    p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
    state = WorldState(p=jnp.asarray(p), v=jnp.asarray(v0),
                       t=jnp.zeros((), jnp.float32))
    return static, params, tile_state(state, B)


def bench_world_steps(B=256, n_steps=16, dense=False, hulls=False,
                      hull_budget=0):
    """Batched 64-body world stepping (the BASELINE '64 bodies' metric).

    See build_world_scene for the scene variants.  hull_budget > 0
    turns on the AABB top-K pair budget (SimConfig.hull_pair_budget)."""
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    static, params, states = build_world_scene(B, dense=dense, hulls=hulls)
    config = SimConfig(max_iter=12, solver_eps=1e-5,
                       hull_pair_budget=hull_budget)
    bstep = make_batched_step(static, config)

    def run(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return out.p, out.v

    # Device-side chained timing (round 4; previously time_fn wall).
    # The wall numbers carried ~3 ms/step-batch of per-call tunnel
    # dispatch bias at this scale (dense measured 18.8 wall vs 15.7
    # chained) — CLAUDE.md timing rules.  reps trade the one in-loop
    # materialization RTT (~30 ms) against run length.
    reps = 4 if dense else 40
    sec = time_chained(run, params, states, reps=reps) / n_steps
    rate = B / sec
    tag = "dense" if dense else "loose"
    geo = "hull" if hulls else "circle"
    bud = f", pair_budget={hull_budget}" if hull_budget else ""
    log(f"[bench] world steps (64 {geo} bodies, C=128, {tag}{bud}): "
        f"B={B}, {sec * 1e3:.2f} ms/step-batch device-side -> "
        f"{rate:,.0f} world-steps/sec")
    return rate


def build_joint_scene(B=256):
    """Joint-heavy (q > 0) scene — BASELINE configs[1]'s workload class
    (chain of jointed links + friction contacts), the second-most
    reference-representative scene: a 16-link chain hanging from a world
    anchor (q = 33 equality rows: one world 'joint' (2) + 'rot' pin (1) +
    15 inter-link joints (30)) with 48 circles raining onto it.  The
    rotated Schur system is K2 = 2C + q = 289 rows -> three 128-panels,
    and the continuous fresh impacts keep the IPM iteration count high
    (~12 vs ~4 on the dense persistent-contact grid) — this bench records
    the Je/A-block path the other scenes never exercise."""
    from lcp_physics_tpu.core import (JointSpec, WorldState, default_params,
                                      make_scene_static)
    from lcp_physics_tpu.parallel import tile_state

    N, links = 64, 16
    rng = np.random.default_rng(3)
    counts = [1] * N
    joints = [JointSpec(kind="joint", body1=0, local1=(-0.5, 0.0),
                        ref=(0.0, 0.0, 0.0)),
              JointSpec(kind="rot", body1=0)]
    joints += [JointSpec(kind="joint", body1=k, body2=k + 1,
                         local1=(0.5, 0.0), local2=(-0.5, 0.0))
               for k in range(links - 1)]
    static = make_scene_static(counts, joints=joints, c_max=128)
    radius = np.full(N, 1.0, np.float32)
    radius[:links] = 0.5
    params = default_params(
        static, verts=np.zeros((N, 1, 2), np.float32), radius=radius,
        gravity=(0.0, 10.0), restitution=0.4, dtype=jnp.float32)
    # links along +x from the anchor; rain grid above (negative y falls
    # toward +y under gravity (0, 10))
    pos = np.zeros((N, 2), np.float32)
    pos[:links, 0] = 0.5 + np.arange(links)
    gx, gy = np.meshgrid(np.arange(8), np.arange(6))
    pos[links:, 0] = gx.ravel() * 2.2
    # first rain rank arrives within the first benched step (continuous
    # fresh impacts are the point of this scene — they defeat the
    # per-instance stall exit and keep the IPM iteration count high)
    pos[links:, 1] = -1.7 - gy.ravel() * 2.2
    pos[links:] += rng.uniform(-0.2, 0.2, (N - links, 2))
    v0 = np.zeros((N, 3), np.float32)
    v0[links:] = rng.normal(0, 0.5, (N - links, 3))
    v0[links:, 2] += 4.0  # falling onto the chain
    p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
    state = WorldState(p=jnp.asarray(p), v=jnp.asarray(v0),
                       t=jnp.zeros((), jnp.float32))
    return static, params, tile_state(state, B)


def bench_world_steps_joints(B=256, n_steps=16):
    """Batched stepping on the joint-heavy chain scene (see
    build_joint_scene) — the equality-constrained workload the other
    world-step benches are blind to (VERDICT r3 missing #2)."""
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    static, params, states = build_joint_scene(B)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    bstep = make_batched_step(static, config)

    def run(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return out.p, out.v

    # device-side chained timing (round 4; see bench_world_steps note)
    sec = time_chained(run, params, states, reps=4) / n_steps
    rate = B / sec
    log(f"[bench] world steps (16-link chain + 48 raining circles, "
        f"q=33, C=128): B={B}, {sec * 1e3:.2f} ms/step-batch "
        f"device-side -> {rate:,.0f} world-steps/sec")
    return rate


def bench_fwd_bwd(B=64, n_steps=20):
    """Forward+backward latency through a rollout (grad wrt
    restitution/mass), the inference-demo hot path.  DEVICE-SIDE timing
    (time_chained): the wall clock of one short fwd+bwd call through the
    axon tunnel is ~80% dispatch/RTT overhead (round-3 measurement:
    28.4 ms wall vs 5.3 ms device), which tracked the tunnel, not the
    engine.  Earlier rounds' numbers (95.5 / 41.6 / 31.2 ms) carried
    that same additive overhead.  Two scenes: the billiards-like sparse
    line (contact-free fast path most steps) and a touching line
    (persistent contacts, full implicit-gradient path every step)."""
    from lcp_physics_tpu.core import (WorldState, default_params,
                                      make_scene_static)
    from lcp_physics_tpu.parallel import make_batched_step, tile_state
    from lcp_physics_tpu.utils import SimConfig

    N = 8
    static = make_scene_static([1] * N, c_max=16)
    params = default_params(
        static, verts=np.zeros((N, 1, 2), np.float32),
        radius=np.full(N, 1.0, np.float32), gravity=(0.0, 10.0),
        dtype=jnp.float32)
    bstep = make_batched_step(static, SimConfig(max_iter=12,
                                                solver_eps=1e-5))

    out = None
    for tag, spacing in (("sparse", 2.2), ("touching", 2.0)):
        pos = np.stack([np.arange(N) * spacing, np.zeros(N)], -1)
        p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
        state = WorldState(p=jnp.asarray(p),
                           v=jnp.zeros((N, 3), jnp.float32),
                           t=jnp.zeros((), jnp.float32))
        states = tile_state(state, B)

        def loss(params, states):
            def body(s, _):
                s2, _ = bstep(params, s, 0.01)
                return s2, ()
            out, _ = jax.lax.scan(body, states, None, length=n_steps)
            return jnp.mean(out.p ** 2)

        def fb(params, states):
            v, g = jax.value_and_grad(loss)(params, states)
            return v, g.mass

        # reps=200: at reps=20 the ~30 ms end-of-chain RTT is +1.5 ms/rep
        # on a ~5 ms measurement (28% bias) — CLAUDE.md timing note.
        sec = time_chained(fb, params, states, reps=200)
        log(f"[bench] fwd+bwd rollout (B={B}, 8 bodies, {n_steps} steps, "
            f"{tag}): {sec * 1e3:.1f} ms device-side")
        if tag == "sparse":
            out = sec
    return out


def bench_fwd_bwd_dense(B=256, n_steps=8):
    """Contact-rich TRAINING step: value_and_grad through a dense
    64-body rollout (the flagship differentiable workload — every step
    runs the full IPM forward and the implicit-KKT transposed solve
    backward).  Device-side timing."""
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    static, params, states = build_world_scene(B, dense=True)
    bstep = make_batched_step(static, SimConfig(max_iter=12,
                                                solver_eps=1e-5))

    def loss(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return jnp.mean(out.p ** 2)

    def fb(params, states):
        v, g = jax.value_and_grad(loss)(params, states)
        return v, g.mass

    sec = time_chained(fb, params, states, reps=20)
    log(f"[bench] fwd+bwd DENSE (B={B}, 64 bodies, {n_steps} steps): "
        f"{sec * 1e3:.1f} ms device-side -> "
        f"{B * n_steps / sec:,.0f} grad-world-steps/sec")
    return sec


def bench_sharded_realchip(B=256, n_steps=4):
    """Exercise the NamedSharding path on the REAL device (VERDICT r3
    missing #4): ``make_sharded_step`` — explicit in/out shardings over a
    1-device mesh plus input donation — must compile and run under the
    actual TPU backend and match the unsharded step.  Everything else
    about the multi-chip story runs on virtual CPU meshes (tests,
    dryrun_multichip); this is the only place the sharded program meets
    the real lowering."""
    from lcp_physics_tpu.parallel import (make_batched_step, make_mesh,
                                          make_sharded_step)
    from lcp_physics_tpu.utils import SimConfig

    static, params, states = build_world_scene(B, dense=False)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    mesh = make_mesh(jax.devices()[:1])
    sstep, _, _ = make_sharded_step(static, mesh, config)
    bstep = jax.jit(make_batched_step(static, config))

    out_ref, _ = bstep(params, states, 0.01)
    out_sh, _ = sstep(params, states, 0.01)  # donates `states`: call last
    err = float(jnp.max(jnp.abs(jnp.asarray(out_sh.p)
                                - jnp.asarray(out_ref.p))))
    assert err < 1e-5, f"sharded != unsharded on real chip: {err}"
    # per-step cost through the sharded program (fresh states each call —
    # donation invalidates the argument buffer).  Warm the loop signature
    # first: feeding sstep its own (sharded) output is a different input
    # sharding than the first committed-array call, i.e. a second compile.
    s, _ = sstep(params, out_sh, 0.01)
    _materialize(s.p)
    t0 = time.perf_counter()
    for _ in range(n_steps):
        s, _ = sstep(params, s, 0.01)
    _materialize(s.p)
    sec = (time.perf_counter() - t0) / n_steps
    # This is a CORRECTNESS gate, not a throughput number: the per-call
    # wall clock of a 0.15 ms device-side step is ~98% tunnel dispatch
    # RTT, so it is labeled as such to keep this stderr record internally
    # comparable with the device-side lines above (VERDICT r4 weak #6).
    log(f"[bench] sharded step on REAL chip (1-device NamedSharding mesh, "
        f"donation on): matches unsharded (max |dp| = {err:.2e}); "
        f"{sec * 1e3:.1f} ms/step wall, ~all tunnel-dispatch RTT "
        f"(device-side step is the loose line above)")
    return err


def bench_scale_up(B=4096, n_steps=8, batch_tile=1024):
    """BASELINE stretch config (configs[4]): 4096 x 64-body worlds on one
    chip.  batch_tile segments the solve over world tiles so peak HBM
    scales with the tile, not the batch (SimConfig.batch_tile)."""
    from lcp_physics_tpu.core import (WorldState, default_params,
                                      make_scene_static)
    from lcp_physics_tpu.parallel import make_batched_step, tile_state
    from lcp_physics_tpu.utils import SimConfig

    N = 64
    rng = np.random.default_rng(2)
    static = make_scene_static([1] * N, c_max=128)
    params = default_params(
        static, verts=np.zeros((N, 1, 2), np.float32),
        radius=np.full(N, 1.0, np.float32), gravity=(0.0, 10.0),
        restitution=0.4, dtype=jnp.float32)
    gx, gy = np.meshgrid(np.arange(8), np.arange(8))
    pos = np.stack([gx.ravel() * 2.6, gy.ravel() * 2.6], -1)
    pos = pos + rng.uniform(-0.25, 0.25, pos.shape)
    p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
    state = WorldState(p=jnp.asarray(p), v=jnp.zeros((N, 3), jnp.float32),
                       t=jnp.zeros((), jnp.float32))
    states = tile_state(state, B)
    bstep = make_batched_step(static, SimConfig(max_iter=12,
                                                solver_eps=1e-5,
                                                batch_tile=batch_tile))

    @jax.jit
    def run(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return out

    sec = time_fn(run, params, states, iters=2)
    rate = B * n_steps / sec
    log(f"[bench] SCALE-UP: {B} worlds x 64 bodies x {n_steps} steps "
        f"(batch_tile={batch_tile}): {sec:.2f} s -> "
        f"{rate:,.0f} world-steps/sec")
    return rate


def main():
    import sys as _sys

    log(f"[bench] devices: {jax.devices()}")
    rate = bench_lcp_solves()
    try:
        bench_world_steps()
        bench_world_steps(dense=True)
        bench_world_steps(dense=True, hulls=True)
        bench_world_steps(dense=True, hulls=True, hull_budget=256)
        bench_world_steps_joints()
        bench_sharded_realchip()
        bench_fwd_bwd()
        bench_fwd_bwd_dense()
        if "--scale" in _sys.argv:
            bench_scale_up()
    except Exception as e:  # secondary metrics must not kill the primary
        log(f"[bench] secondary benches failed: {e!r}")
    # "profile" pins the solver configuration the headline was measured
    # under (VERDICT r2 weak #8): round-over-round numbers stay
    # comparable even if engine defaults change again.
    from lcp_physics_tpu.utils import SimConfig
    print(json.dumps({
        "metric": "batched contact-LCP solves/sec/chip",
        "value": round(rate, 1),
        "unit": "solves/sec",
        "vs_baseline": round(rate / NORTH_STAR, 3),
        "profile": (f"stall_lim={SimConfig.solver_stall_lim},max_iter=15,"
                    f"tol=1e-6,backend=auto,fric_pair=True"),
    }))


if __name__ == "__main__":
    main()
