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
import numpy as np

from lcp_physics_tpu.core.geometry import (any_aabb_overlap, find_contacts,
                                            max_penetration)
from lcp_physics_tpu.core.jacobians import (assemble_contact_jacobians,
                                            assemble_Je,
                                            constraint_position_error)
from lcp_physics_tpu.core.state import SceneParams, SceneStatic, WorldState
from lcp_physics_tpu.lcp import lcp_solve
from lcp_physics_tpu.lcp.cone import ConeF
from lcp_physics_tpu.ops.take import make_take_rows
from lcp_physics_tpu.utils import SimConfig


class StepDiagnostics(NamedTuple):
    n_contacts: jax.Array       # active contact count (at the input state)
    # Deepest penetration at the POST-step positions (one extra
    # find_contacts on p_new, stop-gradient).  This is what the reference's
    # ``World.step`` measures after moving and gates its dt-halving
    # backtrack on (SURVEY.md §3.1) — round 1 gated on the pre-step value,
    # which is invariant under halving and could never trigger correctly
    # (VERDICT r1 weak #1).
    max_penetration: jax.Array
    # Deepest penetration at the INPUT state (the assembly contacts).  The
    # backtrack compares post vs pre so sustained resting contact (pre ==
    # post > tol) does not burn futile re-solves.
    pre_penetration: jax.Array
    # dt-halvings taken by the in-jit backtrack (0 when the flag is off or
    # the full step was accepted first try).  ``halvings >
    # max_dt_halvings`` (the value max_dt_halvings + 1) means the budget
    # was exhausted and the shallowest-penetration sub-step was taken
    # (the host path warns; the jitted path reports here).
    # NOTE: the default is a NumPy scalar, NOT jnp.zeros — a jnp default
    # would initialize the JAX backend at import time as a side effect of
    # ``import lcp_physics_tpu``, silently pinning the platform before
    # the user's jax.config.update('jax_platforms', ...) can run.
    halvings: jax.Array = np.int32(0)


def generalized_mass(params: SceneParams):
    """Diagonal mass matrix entries (3N,): [I_k, m_k, m_k] per body."""
    return jnp.stack([params.inertia, params.mass, params.mass],
                     axis=-1).reshape(-1)


def motion_margins(params: SceneParams, state: WorldState, dt, counts,
                   tol=1e-6):
    """Per-body speculative-contact activation band (N,): how far a body
    can travel this step (linear + rotational reach + one step of gravity),
    plus a small slop so resting contacts stay active.  Feeds only boolean
    activation masks downstream — gradients never flow through it."""
    vn = jnp.linalg.norm(params.verts, axis=-1)  # (N, V)
    vmask = jnp.arange(vn.shape[1])[None, :] < jnp.asarray(counts)[:, None]
    reach = params.radius + jnp.max(jnp.where(vmask, vn, 0.0), axis=1)
    speed = (jnp.linalg.norm(state.v[:, 1:3], axis=-1)
             + jnp.abs(state.v[:, 0]) * reach)
    gmag = jnp.linalg.norm(params.gravity)
    return jax.lax.stop_gradient(dt * (speed + dt * gmag) + 10.0 * tol)


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
    (blocks dict, contacts).  Pure, vmappable.

    The returned ``assemble`` also carries the STAGED split the
    contact-free fast path uses: ``assemble.eq`` (mass/forces/equality
    blocks — no narrowphase), ``assemble.any_overlap`` (conservative
    AABB contact predicate at AABB cost), ``assemble.contacts``
    (narrowphase + row mask), ``assemble.contact_blocks`` (the G/h/F
    tensors) and ``assemble.base`` (eq + contacts composed).  A tile
    whose AABBs never overlap runs ONLY the eq stage and the predicate:
    no narrowphase kernels, no compaction, no (m, 3N) Jacobian blocks,
    no IPM."""
    pairs = static.pair_lists()
    counts = static.counts_np()
    N = static.n_bodies
    C = static.c_max
    fd = config.fric_dirs
    take_body = make_take_rows(N)

    def assemble_eq(params, state, dt):
        """Equality-only blocks (mass, forces, joints) — no narrowphase."""
        dtype = state.p.dtype
        Mdiag = generalized_mass(params)
        v = state.v.reshape(-1)
        f = total_force(static, params, state).reshape(-1)
        u = Mdiag * v + dt * f
        Je = assemble_Je(static, state.p)
        b_eq = jnp.zeros((Je.shape[0],), dtype)
        return dict(Q=Mdiag, p=-u, A=Je, b=b_eq)

    def _margin(params, state, dt):
        return (motion_margins(params, state, dt, counts, config.tol)
                if config.speculative else None)

    def assemble_contacts(params, state, dt):
        """Narrowphase stage: (contacts, row_mask); row_mask is None when
        the scene has no contact capacity."""
        dtype = state.p.dtype
        contacts = find_contacts(state.p, params.verts, params.radius,
                                 counts, pairs, C,
                                 margin=_margin(params, state, dt),
                                 hull_budget=config.hull_pair_budget)
        if config.stop_contact_grad:
            contacts = jax.tree.map(jax.lax.stop_gradient, contacts)
        if C == 0:
            return contacts, None
        mask = contacts.valid.astype(dtype)
        # 1.0 on real contact rows, 0.0 on padding: the solver pins padded
        # rows at their exact solution and converges on active rows only.
        rmask = jnp.concatenate([mask, jnp.tile(mask, fd), mask])
        return contacts, rmask

    def any_overlap(params, state, dt):
        """Conservative per-world contact predicate: False PROVES the
        world is contact-free (narrowphase validity requires AABB
        overlap, with the same speculative margin inflation), at AABB
        cost — no narrowphase kernels, no compaction."""
        return any_aabb_overlap(state.p, params.verts, params.radius,
                                counts, pairs,
                                margin=_margin(params, state, dt))

    def assemble_base(params, state, dt):
        """Stage 1: equality blocks + narrowphase.  Returns
        (eq blocks dict, contacts, row_mask)."""
        eq = assemble_eq(params, state, dt)
        contacts, rmask = assemble_contacts(params, state, dt)
        return eq, contacts, rmask

    def assemble_contact_blocks(params, state, contacts, eq, rmask, dt):
        """Stage 2: the G/h/F contact tensors (the expensive part)."""
        dtype = state.p.dtype
        v = state.v.reshape(-1)
        Jc, Jf, _ = assemble_contact_jacobians(contacts, N, fd)
        mask = contacts.valid.astype(dtype)

        # Matmul-transpose takes (ops/take.py): the VJP of a dynamic-index
        # param gather is otherwise a TPU scatter-add (PERF.md round-5
        # backward roofline).
        rest_a = take_body(params.restitution, contacts.ia)
        rest_b = take_body(params.restitution, contacts.ib)
        e_rest = 0.5 * (rest_a + rest_b)
        mu = jnp.sqrt(jnp.clip(take_body(params.fric_coeff, contacts.ia)
                               * take_body(params.fric_coeff, contacts.ib),
                               0.0)) * mask

        G = jnp.concatenate(
            [-Jc, -Jf, jnp.zeros((C, 3 * N), dtype)], axis=0)
        # Structured friction-cone coupling: F = [[0,0,0],[0,0,-E],
        # [-diag(mu),E^T,0]] carried as (mu, valid) — never materialized
        # as the O(m^2) dense tensor (lcp/cone.py).
        F = ConeF(mu=mu, valid=mask, fd=fd)

        # Normal-row targets.  Touching/overlapping contacts (gap == 0) get
        # the reference restitution law  Jc v' >= -e (Jc v).  Speculative
        # rows (activated within the motion margin, gap > 0) either resolve
        # the impact AT the surface this step (approach would cross the
        # gap: full restitution law now — no penetration ever forms) or
        # merely cap the approach speed at gap/dt (gap closes exactly,
        # never overshoots).  With config.speculative=False every valid row
        # has gap == 0 and this reduces to the round-1 assembly bit-exactly.
        jcv = Jc @ v
        gap = jnp.maximum(-contacts.depth, 0.0)
        will_hit = ((-jcv) * dt >= gap) | (gap <= 0)
        h_n = jnp.where(contacts.valid,
                        jnp.where(will_hit, e_rest * jcv, gap / dt),
                        1.0)
        h_f = jnp.where(jnp.tile(contacts.valid, fd),
                        jnp.zeros((fd * C,), dtype), 1.0)
        h_g = jnp.where(contacts.valid, jnp.zeros((C,), dtype), 1.0)
        h = jnp.concatenate([h_n, h_f, h_g])
        return dict(**eq, G=G, h=h, F=F, row_mask=rmask)

    def empty_blocks(eq, dtype):
        """Contact blocks for a scene with NO contact capacity (C == 0)."""
        return dict(**eq, G=jnp.zeros((0, 3 * N), dtype),
                    h=jnp.zeros((0,), dtype), F=jnp.zeros((0, 0), dtype))

    def assemble(params, state, dt):
        eq, contacts, rmask = assemble_base(params, state, dt)
        if rmask is None:
            return empty_blocks(eq, state.p.dtype), contacts
        return (assemble_contact_blocks(params, state, contacts, eq,
                                        rmask, dt), contacts)

    assemble.base = assemble_base
    assemble.eq = assemble_eq
    assemble.contacts = assemble_contacts
    assemble.any_overlap = any_overlap
    assemble.contact_blocks = assemble_contact_blocks
    assemble.empty_blocks = empty_blocks

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
                                 counts, pairs, C,
                                 hull_budget=config.hull_pair_budget)
        Jc, _, _ = assemble_contact_jacobians(contacts, N, fd)
        # push out: Jc dp >= depth  ->  -Jc dp <= -depth
        h_ps = jnp.where(contacts.valid, -contacts.depth, 1.0)
        return dict(Q=Mdiag, p=zero_p, G=-Jc, h=h_ps, A=Je, b=-err,
                    F=jnp.zeros((C, C), dtype),
                    row_mask=contacts.valid.astype(dtype))

    return assemble, assemble_post_stab


def _equality_solve(Qd, pvec, A, b):
    """Closed-form KKT solution for a tile with NO active inequality rows.

    ``min 1/2 v' diag(Qd) v + p' v  s.t.  A v = b`` — the exact fixed
    point the IPM converges to when every contact row is padding (zero G
    rows, lam pinned ~ 0), so a contact-free step can skip the whole
    interior-point machinery:

        v  = Qd^-1 (-p - A^T nu)
        (A Qd^-1 A^T + reg I) nu = A Qd^-1 (-p) - b

    with the solver's own equality-block regularization ``reg``
    (lcp/pdipm.py ``_dtype_consts``).  Broadcasts over leading batch dims.
    """
    from lcp_physics_tpu.lcp.pdipm import _dtype_consts

    vin = -pvec / Qd
    q = A.shape[-2]
    if q == 0:
        return vin
    hp = jax.lax.Precision.HIGHEST
    reg = _dtype_consts(Qd.dtype)["reg"]
    AQ = A / Qd[..., None, :]                      # A Qd^-1
    S = jnp.einsum("...qn,...kn->...qk", AQ, A, precision=hp)
    S = S + reg * jnp.eye(q, dtype=Qd.dtype)
    rhs = jnp.einsum("...qn,...n->...q", A, vin, precision=hp) - b
    nu = jnp.linalg.solve(S, rhs[..., None])[..., 0]
    return vin - jnp.einsum("...qn,...q->...n", A, nu,
                            precision=hp) / Qd


def _solve_or_free(blocks, dyn_kw, enabled):
    """Dispatch the dynamics solve: full LCP when any contact row is
    active anywhere in the tile, closed-form equality solve otherwise.

    The reference branches between a contact LCP and a plain solve in
    Python (``PdipmEngine.solve_dynamics``); under jit the branch is a
    ``lax.cond`` on a tile-level reduction (NOT vmapped, so XLA executes
    only the taken side).  Contact-sparse workloads — loose scenes,
    billiards-style rollouts where most steps touch nothing — skip the
    init factorization and the whole IPM loop in both the forward and
    the backward pass (the free branch is plain differentiable ops; an
    inactive constraint has zero local sensitivity, so gradients agree
    with the implicit-KKT path).
    """
    rm = blocks.get("row_mask")
    if not enabled or rm is None:
        return lcp_solve(**blocks, **dyn_kw)
    return jax.lax.cond(
        jnp.any(rm > 0),
        lambda: lcp_solve(**blocks, **dyn_kw),
        lambda: _equality_solve(blocks["Q"], blocks["p"],
                                blocks["A"], blocks["b"]))


def _max_depth(contacts, dtype):
    return jnp.max(jnp.where(contacts.valid, contacts.depth, 0.0),
                   axis=-1, initial=0.0).astype(dtype)


def make_step(static: SceneStatic, config: SimConfig = SimConfig()):
    """Single-world jittable fixed-dt step:
    ``step(params, state, dt) -> (state', StepDiagnostics)``."""
    assemble, assemble_ps = make_assemble(static, config)
    N = static.n_bodies
    C = static.c_max
    # Q is ALWAYS the generalized-mass diagonal here; say so explicitly
    # (shape inference would misread the stacked (B, 3N) diagonal as a
    # shared dense Q whenever B == 3N).
    solver_kw = dict(max_iter=config.max_iter, tol=config.solver_eps,
                     backend=config.lcp_backend, q_is_diag=True,
                     refine=config.solver_refine,
                     not_improved_lim=config.solver_stall_lim,
                     factor_precision=config.solver_factor_precision,
                     bwd_precision=config.solver_bwd_precision,
                     gondzio=config.solver_gondzio,
                     stall_rtol=config.solver_stall_rtol)
    # trailing C inequality rows are the friction-cone slack block
    # (zero G rows, diagonal Schur block) -> analytic elimination; the
    # assembly's +-t tangent pairs additionally enable the friction-pair
    # rotation elimination (lcp/pdipm.py _rot_factor_factory)
    dyn_kw = dict(solver_kw, gamma_rows=C,
                  fric_pair=(config.fric_dirs == 2))

    pairs = static.pair_lists()
    counts = static.counts_np()

    fast_free = config.contact_free_fast_path

    def solve_with_contacts(params, state, eq, dt):
        """Solver branch: narrowphase + contact blocks + LCP, plus the
        contact-derived diagnostics fields."""
        contacts, rmask = assemble.contacts(params, state, dt)
        blocks = assemble.contact_blocks(params, state, contacts, eq,
                                         rmask, dt)
        v = lcp_solve(**blocks, **dyn_kw)
        ncon = jnp.sum(contacts.valid
                       & (contacts.depth > 0)).astype(jnp.int32)
        return v, ncon, _max_depth(contacts, state.p.dtype)

    def step(params: SceneParams, state: WorldState, dt):
        dt = jnp.asarray(dt, state.p.dtype)
        dtype = state.p.dtype
        eq = assemble.eq(params, state, dt)
        if C and fast_free:
            # Conservative AABB predicate: False proves contact-free
            # (incl. speculative bands), so the free branch skips the
            # narrowphase, the Jacobian build AND the IPM.
            v_flat, ncon, prepen = jax.lax.cond(
                assemble.any_overlap(params, state, dt),
                lambda: solve_with_contacts(params, state, eq, dt),
                lambda: (_equality_solve(eq["Q"], eq["p"], eq["A"],
                                         eq["b"]),
                         jnp.zeros((), jnp.int32), jnp.zeros((), dtype)))
        elif C:
            v_flat, ncon, prepen = solve_with_contacts(params, state, eq,
                                                       dt)
        else:
            v_flat = lcp_solve(**assemble.empty_blocks(eq, dtype),
                               **dyn_kw)
            ncon, prepen = jnp.zeros((), jnp.int32), jnp.zeros((), dtype)
        v_new = v_flat.reshape(N, 3)
        p_new = state.p + dt * v_new  # semi-implicit Euler
        if config.post_stabilization:
            ps = assemble_ps(params, p_new)
            p_new = p_new + _solve_or_free(
                ps, solver_kw, fast_free).reshape(N, 3)
        new_state = WorldState(p=p_new, v=v_new, t=state.t + dt)
        sg_pnew = jax.lax.stop_gradient(p_new)
        if C == 0:
            post = jnp.zeros((), dtype)
        elif fast_free:
            # Same conservative gate at the post-step positions: no AABB
            # overlap (no margin — penetration is actual overlap) means
            # zero penetration without running the depth kernels.
            post = jax.lax.cond(
                any_aabb_overlap(sg_pnew, params.verts, params.radius,
                                 counts, pairs),
                lambda: max_penetration(sg_pnew, params.verts,
                                        params.radius, counts, pairs),
                lambda: jnp.zeros((), dtype))
        else:
            post = max_penetration(sg_pnew, params.verts, params.radius,
                                   counts, pairs)
        return new_state, StepDiagnostics(
            ncon, jax.lax.stop_gradient(post.astype(dtype)), prepen,
            jnp.zeros((), jnp.int32))

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
    # explicit q_is_diag: the vmapped assembly stacks the per-world mass
    # diagonal into (B, 3N), which shape inference cannot distinguish from
    # a shared dense Q when B == 3N (ADVICE r1, high).
    solver_kw = dict(max_iter=config.max_iter, tol=config.solver_eps,
                     backend=config.lcp_backend, q_is_diag=True,
                     refine=config.solver_refine,
                     not_improved_lim=config.solver_stall_lim,
                     factor_precision=config.solver_factor_precision,
                     bwd_precision=config.solver_bwd_precision,
                     gondzio=config.solver_gondzio,
                     stall_rtol=config.solver_stall_rtol)
    # dt rides a per-world axis: the in-jit penetration backtrack halves
    # dt independently per world, and a scalar dt broadcasts to (B,)
    # (bit-identical to the old scalar path).
    assemble_eq_b = jax.vmap(assemble.eq, in_axes=(p_ax, 0, 0))
    assemble_con_b = jax.vmap(assemble.contacts, in_axes=(p_ax, 0, 0))
    assemble_cb_b = jax.vmap(assemble.contact_blocks,
                             in_axes=(p_ax, 0, 0, 0, 0, 0))
    overlap_b = jax.vmap(assemble.any_overlap, in_axes=(p_ax, 0, 0))
    assemble_ps_b = jax.vmap(assemble_ps, in_axes=(p_ax, 0))
    dyn_kw = dict(solver_kw, gamma_rows=C, fric_pair=(config.fric_dirs == 2))

    pairs = static.pair_lists()
    counts = static.counts_np()
    pen_b = jax.vmap(
        lambda p, verts, radius: max_penetration(p, verts, radius, counts,
                                                 pairs),
        in_axes=(0, p_ax, p_ax))
    aabb_b = jax.vmap(
        lambda p, verts, radius: any_aabb_overlap(p, verts, radius, counts,
                                                  pairs),
        in_axes=(0, p_ax, p_ax))

    fast_free = config.contact_free_fast_path

    def solve_with_contacts(params, states, eq, dt_w, dtype):
        """Solver branch: narrowphase + contact blocks + ONE batched LCP,
        plus the contact-derived diagnostics fields."""
        contacts, rmask = assemble_con_b(params, states, dt_w)
        blocks = assemble_cb_b(params, states, contacts, eq, rmask, dt_w)
        v = lcp_solve(**blocks, **dyn_kw)
        ncon = jnp.sum(contacts.valid & (contacts.depth > 0),
                       axis=-1).astype(jnp.int32)
        return v, ncon, _max_depth(contacts, dtype)

    def step_tile_plain(params, states, dt):
        B = states.p.shape[0]
        dtype = states.p.dtype
        dt_w = jnp.broadcast_to(jnp.asarray(dt, dtype), (B,))
        eq = assemble_eq_b(params, states, dt_w)
        if C and fast_free:
            # Conservative AABB predicate (tile-level): False proves the
            # whole tile contact-free, so the free branch skips the
            # narrowphase, the Jacobian build AND the IPM.
            v_flat, ncon, prepen = jax.lax.cond(
                jnp.any(overlap_b(params, states, dt_w)),
                lambda: solve_with_contacts(params, states, eq, dt_w,
                                            dtype),
                lambda: (_equality_solve(eq["Q"], eq["p"], eq["A"],
                                         eq["b"]),
                         jnp.zeros((B,), jnp.int32),
                         jnp.zeros((B,), dtype)))
        elif C:
            v_flat, ncon, prepen = solve_with_contacts(params, states, eq,
                                                       dt_w, dtype)
        else:
            v_flat = lcp_solve(**assemble.empty_blocks(eq, dtype),
                               **dyn_kw)
            ncon = jnp.zeros((B,), jnp.int32)
            prepen = jnp.zeros((B,), dtype)
        v_new = v_flat.reshape(B, N, 3)
        p_new = states.p + dt_w[:, None, None] * v_new
        if config.post_stabilization:
            ps = assemble_ps_b(params, p_new)
            p_new = p_new + _solve_or_free(
                ps, solver_kw, fast_free).reshape(B, N, 3)
        new_states = WorldState(p=p_new, v=v_new, t=states.t + dt_w)
        sg_pnew = jax.lax.stop_gradient(p_new)
        if C == 0:
            post = jnp.zeros((B,), dtype)
        elif fast_free:
            post = jax.lax.cond(
                jnp.any(aabb_b(sg_pnew, params.verts, params.radius)),
                lambda: pen_b(sg_pnew, params.verts, params.radius),
                lambda: jnp.zeros((B,), dtype))
        else:
            post = pen_b(sg_pnew, params.verts, params.radius)
        return new_states, StepDiagnostics(
            ncon, jax.lax.stop_gradient(post.astype(dtype)), prepen,
            jnp.zeros((B,), jnp.int32))

    max_h = config.max_dt_halvings
    tol = config.tol

    def step_tile_backtrack(params, states, dt):
        """In-jit restore-and-retry (reference ``World.step`` semantics,
        SURVEY §3.1, on the batched path — VERDICT r2 item 6): a bounded
        ``lax.while_loop`` halves dt PER WORLD while the step creates
        fresh penetration > tol, then ONE differentiable re-solve runs at
        the accepted per-world dt.  The search loop runs entirely on
        stop-gradient values (gradients flow through the accepted step
        only; the retry decision — including d/d(dt) — is data).  Costs
        one extra forward solve vs the plain step when nothing
        penetrates; worlds that backtrack desynchronize in time (their
        ``t`` advances by the accepted smaller dt), exactly like the
        host loop."""
        B = states.p.shape[0]
        dtype = states.p.dtype
        dt_full = jax.lax.stop_gradient(
            jnp.broadcast_to(jnp.asarray(dt, dtype), (B,)))
        sgp = jax.lax.stop_gradient(params)
        sgs = jax.lax.stop_gradient(states)

        def cond(c):
            _, accepted, _, _, tries = c
            return jnp.logical_and(~jnp.all(accepted), tries <= max_h)

        def body(c):
            dt_cur, accepted, best_dt, best_post, tries = c
            _, diag = step_tile_plain(sgp, sgs, dt_cur)
            post = diag.max_penetration
            fresh = post - diag.pre_penetration
            ok = (post <= tol) | (fresh <= tol)
            better = (~accepted) & (post < best_post)
            best_dt = jnp.where(better, dt_cur, best_dt)
            best_post = jnp.where(better, post, best_post)
            accepted = accepted | ok
            dt_next = jnp.where(accepted, dt_cur, dt_cur * 0.5)
            return (dt_next, accepted, best_dt, best_post, tries + 1)

        init = (dt_full, jnp.zeros((B,), bool), dt_full,
                jnp.full((B,), jnp.inf, dtype), jnp.zeros((), jnp.int32))
        dt_cur, accepted, best_dt, _, _ = jax.lax.while_loop(
            cond, body, init)
        # Budget exhausted -> accept the shallowest-penetration sub-step;
        # halvings then reports max_dt_halvings + 1 — an out-of-range
        # value no legitimately accepted world can carry (a world CAN be
        # accepted at exactly max_dt_halvings halvings, so max_h alone
        # would be ambiguous).  ``halvings > max_dt_halvings`` IS the
        # exhaustion signal (the host loop warns; the jitted path
        # reports here).
        dt_acc = jnp.where(accepted, dt_cur, best_dt)
        ratio = jnp.where(dt_acc > 0, dt_full / jnp.where(dt_acc > 0,
                                                          dt_acc, 1.0), 1.0)
        halvings = jnp.where(
            accepted, jnp.round(jnp.log2(ratio)).astype(jnp.int32),
            max_h + 1)
        # Worlds that accepted the FULL step get the caller's
        # differentiable dt back (d/d(dt) flows exactly as in the plain
        # step); a halved dt is a data-dependent choice and stays
        # stop-gradient, like the host loop's.
        dt_final = jnp.where(halvings == 0,
                             jnp.broadcast_to(jnp.asarray(dt, dtype), (B,)),
                             dt_acc)
        new_states, diag = step_tile_plain(params, states, dt_final)
        return new_states, diag._replace(halvings=halvings)

    tile = config.batch_tile
    step_tile = (step_tile_backtrack
                 if (config.penetration_backtrack and C) else
                 step_tile_plain)

    def step_b(params, states, dt):
        B = states.p.shape[0]
        if tile <= 0 or B <= tile:
            return step_tile(params, states, dt)
        if B % tile:
            raise ValueError(
                f"world batch {B} is not divisible by batch_tile {tile}")
        T = B // tile
        split = lambda tree: jax.tree.map(
            lambda x: x.reshape((T, tile) + x.shape[1:]), tree)
        if params_batched:
            out = jax.lax.map(lambda a: step_tile(a[0], a[1], dt),
                              (split(params), split(states)))
        else:
            out = jax.lax.map(lambda s: step_tile(params, s, dt),
                              split(states))
        return jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), out)

    return step_b


class RolloutDiagnostics(NamedTuple):
    """Reduced-over-time :class:`StepDiagnostics` for scan rollouts
    (VERDICT r3 missing #5 / SURVEY §5.5): the per-step diagnostics are
    folded inside the scan so the high-throughput mode stays observable
    without stacking T copies of them.

    ``max_halvings > config.max_dt_halvings`` (the sentinel value
    ``max_dt_halvings + 1``) means the in-jit penetration backtrack
    exhausted its budget on at least one step — the same exhaustion
    signal :class:`StepDiagnostics` carries per step, surviving the
    reduction because it is the maximum possible value."""

    max_penetration: jax.Array   # max over steps of post-step penetration
    max_pre_penetration: jax.Array
    max_halvings: jax.Array      # int32; see exhaustion note above
    total_contacts: jax.Array    # int32 sum over steps of n_contacts


def _rollout_diag_init(state):
    shape = jnp.shape(state.t)
    dt_ = state.p.dtype
    return RolloutDiagnostics(jnp.zeros(shape, dt_), jnp.zeros(shape, dt_),
                              jnp.zeros(shape, jnp.int32),
                              jnp.zeros(shape, jnp.int32))


def _rollout_diag_fold(rd, d: StepDiagnostics):
    return RolloutDiagnostics(
        jnp.maximum(rd.max_penetration, d.max_penetration),
        jnp.maximum(rd.max_pre_penetration, d.pre_penetration),
        jnp.maximum(rd.max_halvings, d.halvings),
        rd.total_contacts + d.n_contacts)


def rollout(step, params, state, dt, n_steps, remat=False,
            with_diagnostics=False):
    """Roll the world forward ``n_steps`` with ``lax.scan``.

    Returns (final_state, trajectory) where trajectory stacks every
    intermediate :class:`WorldState` along a leading time axis; with
    ``with_diagnostics=True`` returns (final_state, trajectory,
    :class:`RolloutDiagnostics`) — the per-step diagnostics reduced over
    time (max penetration, max backtrack halvings, contact totals), so
    the backtrack's exhaustion signal stays observable in scan mode.

    ``remat=True`` wraps the per-step body in ``jax.checkpoint`` so
    long-horizon BPTT (the inference/control demos) trades recompute for
    activation memory — the honest TPU counterpart of the reference's
    unbatched autograd tape (SURVEY.md §5.7).
    """
    if with_diagnostics:
        def body(carry, _):
            s, rd = carry
            s2, d = step(params, s, dt)
            return (s2, _rollout_diag_fold(rd, d)), s2
        if remat:
            body = jax.checkpoint(body)
        (final, rdiag), traj = jax.lax.scan(
            body, (state, _rollout_diag_init(state)), None, length=n_steps)
        return final, traj, rdiag
    body = lambda s, _: (step(params, s, dt)[0],) * 2
    if remat:
        body = jax.checkpoint(body)
    final, traj = jax.lax.scan(body, state, None, length=n_steps)
    return final, traj
