"""Big-single-world scaling probe (>64 bodies) — VERDICT r3 item 6.

The engine's scaling story is "more worlds" (batch DP + sharding); this
probe measures where BIG SINGLE worlds break instead, on the real TPU:

  * N = 64 / 144 / 256 dense circle grids (NxN touching, the flagship
    scene scaled up): trace+compile wall time (the static O(N^2) pair
    list is built at trace time — core/state.py all-pairs), per-step
    device time, and steps/sec at a batch that keeps total bodies
    comparable;
  * which factor path each lands on: rotated K2 = 2*c_max + q vs the
    pallas blocked-LU ceiling MAX_BLOCKED_N (ops/linalg.py) — past it
    the solver silently falls back to the XLA LU;
  * the hull variant at N = 144 with and without hull_pair_budget
    (PERF.md predicted the AABB top-K budget starts paying at
    "hundreds of hulls").

Usage: python tools/bigworld.py [--quick] [--cpu]
Numbers land in PERF.md "Big-world scaling (round 4)".
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if "--cpu" in sys.argv:  # smoke-test mode; timings meaningless
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from bench import log, time_chained


def build_grid_scene(N, B, dense=True, hulls=False, c_max=None):
    """NxN-sqrt grid of unit circles (or unit squares), the bench scene
    generalized to N bodies.  c_max defaults to 2N (the dense-grid
    contact count is ~2N: right + up neighbors)."""
    from lcp_physics_tpu.core import (WorldState, default_params,
                                      make_scene_static)
    from lcp_physics_tpu.parallel import tile_state

    side = int(np.sqrt(N))
    assert side * side == N
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
    c_max = c_max or 2 * N
    static = make_scene_static(counts, c_max=c_max)
    params = default_params(
        static, verts=verts, radius=radius, gravity=(0.0, 10.0),
        restitution=0.4, dtype=jnp.float32)
    gx, gy = np.meshgrid(np.arange(side), np.arange(side))
    spacing = 2.01 if dense else 2.6
    pos = np.stack([gx.ravel() * spacing, gy.ravel() * spacing], -1)
    pos = pos + rng.uniform(-0.01, 0.01, pos.shape)
    v0 = rng.normal(0, 0.5, (N, 3)).astype(np.float32)
    p = np.concatenate([np.zeros((N, 1)), pos], -1).astype(np.float32)
    state = WorldState(p=jnp.asarray(p), v=jnp.asarray(v0),
                       t=jnp.zeros((), jnp.float32))
    return static, params, tile_state(state, B)


def probe(N, B, n_steps, hulls=False, hull_budget=0, c_max=None):
    from lcp_physics_tpu.ops.linalg import MAX_BLOCKED_N, MAX_LANE_N
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    static, params, states = build_grid_scene(N, B, hulls=hulls,
                                              c_max=c_max)
    C = static.c_max
    K2 = 2 * C  # q = 0 (no joints)
    path = ("rotated blocked-LU (pallas)" if K2 <= MAX_BLOCKED_N
            else "XLA LU fallback (K2 > MAX_BLOCKED_N)")
    n_pairs = sum(1 for i in range(N) for j in range(i + 1, N)
                  if static.allowed[i][j])
    geo = "hull" if hulls else "circle"
    bud = f", pair_budget={hull_budget}" if hull_budget else ""
    log(f"[bigworld] N={N} {geo}{bud}: c_max={C}, K2={K2} "
        f"(MAX_BLOCKED_N={MAX_BLOCKED_N}) -> {path}; "
        f"static pairs={n_pairs}")

    config = SimConfig(max_iter=12, solver_eps=1e-5,
                       hull_pair_budget=hull_budget)
    bstep = make_batched_step(static, config)

    def run(params, states):
        def body(s, _):
            s2, _ = bstep(params, s, 0.01)
            return s2, ()
        out, _ = jax.lax.scan(body, states, None, length=n_steps)
        return out.p, out.v

    t0 = time.perf_counter()
    compiled = jax.jit(run).lower(params, states).compile()
    t_compile = time.perf_counter() - t0
    sec = time_chained(lambda p_, s_: run(p_, s_), params, states,
                       reps=max(2, 64 // n_steps))
    rate = B * n_steps / sec
    log(f"[bigworld] N={N} {geo}{bud}: B={B} trace+compile "
        f"{t_compile:.1f} s; {sec * 1e3 / n_steps:.2f} ms/step-batch "
        f"-> {rate:,.0f} world-steps/s = {rate * N:,.0f} body-steps/s")
    return rate


def main():
    quick = "--quick" in sys.argv
    log(f"[bigworld] devices: {jax.devices()}")
    n_steps = 4 if quick else 8

    if "--cpu" in sys.argv:
        # API smoke only: tiny shapes (a dense 256-body IPM is minutes
        # per step on CPU); timings meaningless.
        probe(16, 8, 2)
        probe(16, 8, 2, hulls=True, hull_budget=16)
        log("[bigworld] cpu smoke OK")
        return

    if "--cap" in sys.argv:
        # MAX_BLOCKED_N = 1536 frontier probe (VERDICT r4 item 7): a
        # 19x19 dense grid with c_max = 768 -> K2 = 1536 = the cap
        # exactly (T = 12 panels).  Measures compile time + steps/s at
        # the top of the newly-allowed range; correctness at T = 12 is
        # covered by tests/test_pallas_linalg.py::test_blocked_lu_at_cap.
        probe(361, 32, n_steps, c_max=768)
        return

    # Dense circle grids: N=64 flagship anchor, then 144 and 256.
    # B scaled down to keep total bodies ~16k (64*256).
    probe(64, 256, n_steps)
    probe(144, 112, n_steps)
    probe(256, 64, n_steps)
    if not quick:
        # c_max=448 -> K2=896 (the round-3 blocked ceiling; T=7) vs the
        # default c_max=512 -> K2=1024 (T=8).  Under the OLD cap the
        # second config fell back to XLA LU and measured a 20x cliff
        # (78 vs 1,604 steps/s — PERF.md big-world table), which is why
        # MAX_BLOCKED_N was raised to 1536; now this pair isolates the
        # marginal cost of one more panel instead.
        probe(256, 64, n_steps, c_max=448)

    # Hull variant at N=144 (20,592 static pairs through SAT/clipping):
    # does the AABB top-K budget pay yet?
    if not quick:
        probe(144, 112, n_steps, hulls=True)
        probe(144, 112, n_steps, hulls=True, hull_budget=1024)


if __name__ == "__main__":
    main()
