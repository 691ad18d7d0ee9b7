"""Batching/sharding tests (SURVEY.md §4 item 5): batched-vs-loop
consistency and multi-device pjit == single-device, on the 8-way virtual
CPU mesh from conftest."""
import jax
import jax.numpy as jnp
import numpy as np

from lcp_physics_tpu.core import WorldState, make_step, rollout
from lcp_physics_tpu.parallel import (batched_rollout, make_batched_step,
                                      make_mesh, make_sharded_step,
                                      replicate, shard_worlds, tile_state)
from lcp_physics_tpu.utils import SimConfig

from tests.test_step import DT, G, box_ground_world


def batch_of_drops(B):
    static, params = box_ground_world(gravity=(0.0, G), restitution=0.5)
    heights = jnp.linspace(-4.0, -2.5, B)
    states = WorldState(
        p=jnp.stack([jnp.array([[0., 0., float(h)], [0., 0., 0.]])
                     for h in heights]),
        v=jnp.zeros((B, 2, 3)), t=jnp.zeros((B,)))
    return static, params, states


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_step_matches_single_device():
    B = 16
    static, params, states = batch_of_drops(B)
    mesh = make_mesh()
    sstep, batch_sh, params_sh = make_sharded_step(static, mesh)
    p_sh = replicate(params, mesh)
    s_sh = shard_worlds(states, mesh)

    bstep = jax.jit(make_batched_step(static))
    ref = states
    for _ in range(10):
        ref, _ = bstep(params, ref, DT)
        s_sh, _ = sstep(p_sh, s_sh, DT)
    np.testing.assert_allclose(np.asarray(s_sh.p), np.asarray(ref.p),
                               atol=1e-9)


def test_batched_rollout_sharded_equals_scan():
    B = 8
    static, params, states = batch_of_drops(B)
    mesh = make_mesh()
    final_sh, _ = batched_rollout(static, SimConfig(), params, states, DT,
                                  30, mesh=mesh)
    final, _ = batched_rollout(static, SimConfig(), params, states, DT, 30)
    np.testing.assert_allclose(np.asarray(final_sh.p), np.asarray(final.p),
                               atol=1e-9)


def test_gradient_of_sharded_batch_loss():
    """Shared-parameter gradient over a sharded world batch: XLA inserts the
    cross-shard reduction; result must equal the unsharded gradient."""
    B = 8
    static, params, states = batch_of_drops(B)
    mesh = make_mesh()

    def loss(params, states):
        final, _ = batched_rollout(static, SimConfig(), params, states, DT,
                                   20)
        return jnp.mean(final.p[:, 0, 2] ** 2)

    g_plain = jax.grad(loss)(params, states)

    loss_sharded = jax.jit(jax.grad(loss))
    g_shard = loss_sharded(replicate(params, mesh),
                           shard_worlds(states, mesh))
    np.testing.assert_allclose(np.asarray(g_shard.restitution),
                               np.asarray(g_plain.restitution), atol=1e-9)
    np.testing.assert_allclose(np.asarray(g_shard.mass),
                               np.asarray(g_plain.mass), atol=1e-8)


def test_tile_state_and_per_world_params():
    B = 8
    static, params, _ = batch_of_drops(B)
    s0 = WorldState(p=jnp.array([[0., 0., -3.], [0., 0., 0.]]),
                    v=jnp.zeros((2, 3)), t=jnp.zeros(()))
    states = tile_state(s0, B)
    # per-world restitution sweep
    pb = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (B,) + x.shape),
                      params)
    pb = pb.__class__(**{**pb.__dict__,
                         "restitution": jnp.stack(
                             [jnp.full((2,), 0.1 + 0.1 * k)
                              for k in range(B)])})
    bstep = jax.jit(make_batched_step(static, params_batched=True))
    out = states
    for _ in range(60):
        out, _ = bstep(pb, out, DT)
    # higher restitution -> higher rebound (more negative y... all dropped
    # from -3 onto ground at -2): after the bounce worlds differ monotonically
    ys = np.asarray(out.p[:, 0, 2])
    assert np.all(np.diff(ys) < 1e-9)  # more bounce = smaller y (higher up)
