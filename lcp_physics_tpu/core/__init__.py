"""TPU-first functional core: fixed-shape world stepping, collision, and
Jacobian assembly (the XLA-native redesign of the reference's object-graph
stepper — SURVEY.md §7)."""

from lcp_physics_tpu.core.geometry import (Contacts, find_contacts,
                                           max_penetration,
                                           split_pairs_by_kind,
                                           world_vertices)
from lcp_physics_tpu.core.jacobians import (assemble_contact_jacobians,
                                            assemble_Je,
                                            constraint_position_error)
from lcp_physics_tpu.core.state import (JointSpec, SceneParams, SceneStatic,
                                        WorldState, default_params,
                                        make_scene_static)
from lcp_physics_tpu.core.step import (RolloutDiagnostics,
                                       StepDiagnostics, generalized_mass,
                                       make_assemble, make_step,
                                       make_step_batched, rollout,
                                       total_force)

__all__ = [
    "Contacts", "find_contacts", "max_penetration", "split_pairs_by_kind",
    "world_vertices", "assemble_contact_jacobians", "assemble_Je",
    "constraint_position_error", "JointSpec", "SceneParams", "SceneStatic",
    "WorldState", "default_params", "make_scene_static",
    "StepDiagnostics", "RolloutDiagnostics",
    "generalized_mass", "make_assemble", "make_step", "make_step_batched",
    "rollout", "total_force",
]
