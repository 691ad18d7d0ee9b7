"""World-batch parallelism: vmap on chip, jax.sharding across chips.

The reference has no distributed machinery at all (SURVEY.md §2.3): its only
batch axis is the solver-internal nBatch, used with nBatch=1.  The TPU build
widens that seam into the primary scaling axis: thousands of independent
worlds stepped as one fused program, sharded over the ICI mesh.

Because worlds are independent, this is pure data parallelism: the batch
axis is sharded, parameters are replicated, and the only collectives XLA
ever inserts are reductions over shared-parameter gradients/losses in
training (``psum`` riding ICI).  No NCCL/MPI analog is needed — the mesh +
``NamedSharding`` annotations ARE the communication layer.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lcp_physics_tpu.core.state import WorldState
from lcp_physics_tpu.core.step import make_step_batched
from lcp_physics_tpu.utils import SimConfig

WORLD_AXIS = "worlds"


def make_mesh(devices=None, axis=WORLD_AXIS) -> Mesh:
    """1-D device mesh over the world-batch axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_worlds(tree, mesh: Mesh, axis=WORLD_AXIS):
    """Place a world-batched PyTree (leading batch axis on every leaf) with
    the batch dimension sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(tree, mesh: Mesh):
    """Replicate (e.g. shared scene parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def stack_states(states) -> WorldState:
    """Stack single-world states into a batched WorldState."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *states)


def tile_state(state: WorldState, batch: int) -> WorldState:
    """Broadcast one world state into a batch of identical worlds."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (batch,) + x.shape), state)


def make_batched_step(static, config: SimConfig = SimConfig(),
                      params_batched=False):
    """vmapped step: (params, states, dt) -> (states', diags).

    params_batched=False: one parameter set shared by all worlds (the
    gradient-inference setting).  True: per-world parameters (e.g. a batch
    of scenes with different masses).

    Assembly and integration are vmapped; the KKT solves run through the
    solver's NATIVE batch path (one fused factorization over all worlds —
    Pallas lane-batched on TPU), not a vmap wrapper.
    """
    return make_step_batched(static, config, params_batched)


def make_sharded_step(static, mesh: Mesh, config: SimConfig = SimConfig(),
                      params_batched=False, axis=WORLD_AXIS):
    """Jitted batched step with explicit shardings: batch axis over the
    mesh, parameters replicated; donates the incoming state buffer."""
    bstep = make_batched_step(static, config, params_batched)
    batch_sh = NamedSharding(mesh, P(axis))
    rep_sh = NamedSharding(mesh, P())
    params_sh = batch_sh if params_batched else rep_sh
    step = jax.jit(bstep,
                   in_shardings=(params_sh, batch_sh, None),
                   out_shardings=(batch_sh, batch_sh),
                   donate_argnums=(1,))
    return step, batch_sh, params_sh


def batched_rollout(static, config, params, states, dt, n_steps,
                    params_batched=False, remat=False, mesh: Mesh = None,
                    with_diagnostics=False):
    """Scan a batch of worlds ``n_steps`` forward; returns (final, traj),
    or (final, traj, :class:`core.step.RolloutDiagnostics`) with
    ``with_diagnostics=True`` — the per-step diagnostics reduced over
    time (per world: max penetration, max backtrack halvings with its
    budget-exhaustion sentinel, contact totals).

    With ``mesh`` given, inputs are placed (batch sharded / params
    replicated) before the jitted scan so XLA partitions the whole rollout.
    """
    from lcp_physics_tpu.core.step import (_rollout_diag_fold,
                                           _rollout_diag_init)

    bstep = make_batched_step(static, config, params_batched)

    if mesh is not None:
        states = shard_worlds(states, mesh)
        params = (shard_worlds(params, mesh) if params_batched
                  else replicate(params, mesh))

    if with_diagnostics:
        def body(carry, _):
            s, rd = carry
            s2, d = bstep(params, s, dt)
            return (s2, _rollout_diag_fold(rd, d)), s2
        if remat:
            body = jax.checkpoint(body)

        @jax.jit
        def scan_d(states):
            (final, rdiag), traj = jax.lax.scan(
                body, (states, _rollout_diag_init(states)), None,
                length=n_steps)
            return final, traj, rdiag

        return scan_d(states)

    def body(s, _):
        s2, _ = bstep(params, s, dt)
        return s2, s2

    if remat:
        body = jax.checkpoint(body)

    @jax.jit
    def scan(states):
        return jax.lax.scan(body, states, None, length=n_steps)

    return scan(states)
