r"""The functional world stepper: contact LCP assembly + semi-implicit Euler.

Parity target: reference ``physics/engines.py`` (``PdipmEngine.solve_dynamics``
— M/u/Je assembly, Jc/Jf/E/mu blocks, G/F/h construction, LCP call,
``post_stabilization``) and ``physics/world.py`` (``World.step`` —
integration, collision refresh; SURVEY.md §3.1).

TPU-first design
----------------
One fused, fixed-shape traced path per scene: contacts live in a padded
buffer, the contact-free case is just "all slots masked" (the reference
branches to a separate dense solve; here padding keeps a single XLA
program).  ``make_step`` builds the single-world pure step; ``make_step_batched``
builds the BATCH-NATIVE step: per-world assembly/integration are vmapped
(cheap elementwise work), but the LCP solve happens ONCE on the stacked
(B, ...) systems — so the heavy batched KKT factorizations run through the
solver's native batch path (and its Pallas lane-batched kernels on TPU)
instead of being vmap-wrapped.

Velocity-level contact model (Stewart–Trinkle / Anitescu–Potra, the same
formulation the reference assembles):

    M v' = M v + dt f + Jc^T lam + Jf^T beta - Je^T nu
    0 <= lam  ⊥  Jc v' + e (Jc v)         >= 0     (restitution)
    0 <= beta ⊥  Jf v' + E gamma          >= 0     (max dissipation)
    0 <= gamma⊥  mu lam - E^T beta        >= 0     (friction cone)
    Je v' = 0

mapped onto the solver's (Q, p, G, h, A, b, F) blocks with
G = [-Jc; -Jf; 0], F = [[0,0,0],[0,0,-E],[-diag(mu),E^T,0]],
h = [e (Jc v); 0; 0]; padded slots get zero rows and h = 1.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from lcp_physics_tpu.core.geometry import find_contacts
from lcp_physics_tpu.core.jacobians import (assemble_contact_jacobians,
                                            assemble_Je,
                                            constraint_position_error)
from lcp_physics_tpu.core.state import SceneParams, SceneStatic, WorldState
from lcp_physics_tpu.lcp import lcp_solve
from lcp_physics_tpu.utils import SimConfig


class StepDiagnostics(NamedTuple):
    n_contacts: jax.Array      # active contact count
    max_penetration: jax.Array


def generalized_mass(params: SceneParams):
    """Diagonal mass matrix entries (3N,): [I_k, m_k, m_k] per body."""
    return jnp.stack([params.inertia, params.mass, params.mass],
                     axis=-1).reshape(-1)


def total_force(static: SceneStatic, params: SceneParams, state: WorldState):
    """Generalized forces (N, 3): world gravity + optional user force hook
    (reference ``World.apply_forces`` -> ``Body.apply_forces(t)``)."""
    N = params.mass.shape[0]
    f = jnp.zeros((N, 3), params.mass.dtype)
    f = f.at[:, 1:3].add(params.mass[:, None] * params.gravity[None, :])
    if static.force_fn is not None:
        f = f + static.force_fn(params.force_params, state, state.t)
    return f


def make_assemble(static: SceneStatic, config: SimConfig):
    """Per-world LCP block assembly: (params, state, dt) ->
    (blocks dict, contacts).  Pure, vmappable."""
    pairs = static.pair_lists()
    counts = static.counts_np()
    N = static.n_bodies
    C = static.c_max
    fd = config.fric_dirs

    def assemble(params, state, dt):
        dtype = state.p.dtype
        Mdiag = generalized_mass(params)
        v = state.v.reshape(-1)
        f = total_force(static, params, state).reshape(-1)
        u = Mdiag * v + dt * f

        Je = assemble_Je(static, state.p)
        b_eq = jnp.zeros((Je.shape[0],), dtype)

        contacts = find_contacts(state.p, params.verts, params.radius,
                                 counts, pairs, C)
        if config.stop_contact_grad:
            contacts = jax.tree.map(jax.lax.stop_gradient, contacts)
        if C == 0:
            blocks = dict(Q=Mdiag, p=-u, G=jnp.zeros((0, 3 * N), dtype),
                          h=jnp.zeros((0,), dtype), A=Je, b=b_eq,
                          F=jnp.zeros((0, 0), dtype))
            return blocks, contacts

        Jc, Jf, E = assemble_contact_jacobians(contacts, N, fd)
        mask = contacts.valid.astype(dtype)
        E = E * jnp.tile(mask, fd)[:, None] * mask[None, :]

        e_rest = 0.5 * (params.restitution[contacts.ia]
                        + params.restitution[contacts.ib])
        mu = jnp.sqrt(jnp.clip(params.fric_coeff[contacts.ia]
                               * params.fric_coeff[contacts.ib], 0.0)) * mask

        m = C * (2 + fd)
        G = jnp.concatenate(
            [-Jc, -Jf, jnp.zeros((C, 3 * N), dtype)], axis=0)
        F = jnp.zeros((m, m), dtype)
        F = F.at[C:C + fd * C, C + fd * C:].set(-E)
        F = F.at[C + fd * C:, :C].set(-jnp.diag(mu))
        F = F.at[C + fd * C:, C:C + fd * C].set(E.T)

        jcv = Jc @ v
        h_n = jnp.where(contacts.valid, e_rest * jcv, 1.0)
        h_f = jnp.where(jnp.tile(contacts.valid, fd),
                        jnp.zeros((fd * C,), dtype), 1.0)
        h_g = jnp.where(contacts.valid, jnp.zeros((C,), dtype), 1.0)
        h = jnp.concatenate([h_n, h_f, h_g])
        blocks = dict(Q=Mdiag, p=-u, G=G, h=h, A=Je, b=b_eq, F=F)
        return blocks, contacts

    def assemble_post_stab(params, p):
        """Blocks for the position-projection solve (reference
        ``PdipmEngine.post_stabilization``)."""
        dtype = p.dtype
        Mdiag = generalized_mass(params)
        Je = assemble_Je(static, p)
        err = constraint_position_error(static, p)
        zero_p = jnp.zeros((3 * N,), dtype)
        if C == 0:
            return dict(Q=Mdiag, p=zero_p, G=jnp.zeros((0, 3 * N), dtype),
                        h=jnp.zeros((0,), dtype), A=Je, b=-err,
                        F=jnp.zeros((0, 0), dtype))
        contacts = find_contacts(p, params.verts, params.radius,
                                 counts, pairs, C)
        Jc, _, _ = assemble_contact_jacobians(contacts, N, fd)
        # push out: Jc dp >= depth  ->  -Jc dp <= -depth
        h_ps = jnp.where(contacts.valid, -contacts.depth, 1.0)
        return dict(Q=Mdiag, p=zero_p, G=-Jc, h=h_ps, A=Je, b=-err,
                    F=jnp.zeros((C, C), dtype))

    return assemble, assemble_post_stab


def _diagnostics(contacts, C, dtype):
    if C == 0:
        return StepDiagnostics(jnp.zeros(contacts.valid.shape[:-1],
                                         jnp.int32),
                               jnp.zeros(contacts.valid.shape[:-1], dtype))
    return StepDiagnostics(
        jnp.sum(contacts.valid, axis=-1).astype(jnp.int32),
        jnp.max(jnp.where(contacts.valid, contacts.depth, 0.0), axis=-1,
                initial=0.0))


def make_step(static: SceneStatic, config: SimConfig = SimConfig()):
    """Single-world jittable fixed-dt step:
    ``step(params, state, dt) -> (state', StepDiagnostics)``."""
    assemble, assemble_ps = make_assemble(static, config)
    N = static.n_bodies
    C = static.c_max
    solver_kw = dict(max_iter=config.max_iter, tol=config.solver_eps,
                     backend=config.lcp_backend)
    # trailing C inequality rows are the friction-cone slack block
    # (zero G rows, diagonal Schur block) -> analytic elimination
    dyn_kw = dict(solver_kw, gamma_rows=C)

    def step(params: SceneParams, state: WorldState, dt):
        dt = jnp.asarray(dt, state.p.dtype)
        blocks, contacts = assemble(params, state, dt)
        v_new = lcp_solve(**blocks, **dyn_kw).reshape(N, 3)
        p_new = state.p + dt * v_new  # semi-implicit Euler
        if config.post_stabilization:
            ps = assemble_ps(params, p_new)
            p_new = p_new + lcp_solve(**ps, **solver_kw).reshape(N, 3)
        new_state = WorldState(p=p_new, v=v_new, t=state.t + dt)
        return new_state, _diagnostics(contacts, C, state.p.dtype)

    return step


def make_step_batched(static: SceneStatic, config: SimConfig = SimConfig(),
                      params_batched=False):
    """Batch-native step over worlds: assembly/integration vmapped, ONE
    batched LCP solve (Pallas lane-batched factorization on TPU):
    ``step_b(params, states, dt) -> (states', StepDiagnostics)``."""
    assemble, assemble_ps = make_assemble(static, config)
    N = static.n_bodies
    C = static.c_max
    p_ax = 0 if params_batched else None
    solver_kw = dict(max_iter=config.max_iter, tol=config.solver_eps,
                     backend=config.lcp_backend)
    assemble_b = jax.vmap(assemble, in_axes=(p_ax, 0, None))
    assemble_ps_b = jax.vmap(assemble_ps, in_axes=(p_ax, 0))
    dyn_kw = dict(solver_kw, gamma_rows=C)

    def step_b(params, states, dt):
        B = states.p.shape[0]
        dt = jnp.asarray(dt, states.p.dtype)
        blocks, contacts = assemble_b(params, states, dt)
        v_new = lcp_solve(**blocks, **dyn_kw).reshape(B, N, 3)
        p_new = states.p + dt * v_new
        if config.post_stabilization:
            ps = assemble_ps_b(params, p_new)
            p_new = p_new + lcp_solve(**ps, **solver_kw).reshape(B, N, 3)
        new_states = WorldState(p=p_new, v=v_new, t=states.t + dt)
        return new_states, _diagnostics(contacts, C, states.p.dtype)

    return step_b


def rollout(step, params, state, dt, n_steps, remat=False):
    """Roll the world forward ``n_steps`` with ``lax.scan``.

    Returns (final_state, trajectory) where trajectory stacks every
    intermediate :class:`WorldState` along a leading time axis.

    ``remat=True`` wraps the per-step body in ``jax.checkpoint`` so
    long-horizon BPTT (the inference/control demos) trades recompute for
    activation memory — the honest TPU counterpart of the reference's
    unbatched autograd tape (SURVEY.md §5.7).
    """
    body = lambda s, _: (step(params, s, dt)[0],) * 2
    if remat:
        body = jax.checkpoint(body)
    final, traj = jax.lax.scan(body, state, None, length=n_steps)
    return final, traj
