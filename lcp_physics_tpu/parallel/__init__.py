"""World-batch vmap + multi-chip sharding (SURVEY.md §2.3 TPU equivalents)."""

from lcp_physics_tpu.parallel.batch import (WORLD_AXIS, batched_rollout,
                                            make_batched_step, make_mesh,
                                            make_sharded_step, replicate,
                                            shard_worlds, stack_states,
                                            tile_state)

__all__ = [
    "WORLD_AXIS", "batched_rollout", "make_batched_step", "make_mesh",
    "make_sharded_step", "replicate", "shard_worlds", "stack_states",
    "tile_state",
]
