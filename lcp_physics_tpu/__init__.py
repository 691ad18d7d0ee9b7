"""lcp_physics_tpu — a TPU-native differentiable 2D rigid-body physics engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``locuslab/lcp-physics`` (de Avila Belbute-Peres et al., "End-to-End
Differentiable Physics for Learning and Control", NeurIPS 2018):

- ``lcp_physics_tpu.lcp``      — batched differentiable LCP/QP solver
  (Mehrotra predictor–corrector PDIPM forward, implicit-KKT backward via
  ``jax.custom_vjp``).  Parity target: reference ``lcp_physics/lcp/``.
- ``lcp_physics_tpu.core``     — the TPU-first functional core: pure
  fixed-shape ``step`` over struct-of-arrays world state, vectorized
  broadphase/narrowphase with padded contact buffers, Jacobian assembly,
  ``lax.scan`` rollouts.  (No direct reference analog — this is the
  XLA-friendly re-design of the reference's object-graph stepping.)
- ``lcp_physics_tpu.physics``  — the user-facing scene API mirroring the
  reference: ``World``, ``run_world``, ``Body/Circle/Rect/Hull``, joint
  constraints, ``ExternalForce``/``gravity``, ``Defaults``.
  Parity target: reference ``lcp_physics/physics/``.
- ``lcp_physics_tpu.parallel`` — world-batching (``vmap``) and multi-chip
  scale-out (``jax.sharding`` mesh over the world axis).
- ``lcp_physics_tpu.ops``      — Pallas TPU kernels for the hot paths.

Unlike the reference (which mutates torch tensors in Python program order),
everything on the compute path here is a pure function over fixed-shape
PyTrees, jit/vmap/scan/shard-compatible by construction.
"""

__version__ = "0.1.0"

from lcp_physics_tpu import utils, lcp, core, physics, parallel  # noqa: F401
