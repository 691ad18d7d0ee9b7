"""Stage-level decomposition of the ASSEMBLY VJP (round-5 follow-up to
tools/bwd_roofline.py, which measured the assembly pullback at ~20 ms of
the dense flagship's ~21 ms/step backward — 94%, vs 3 ms for the whole
implicit-LCP custom_vjp).

Splits the assembly pullback into its three stages and micro-probes the
gather transposes suspected of dominating (a gather's VJP is a
scatter-add, and TPU scatters with long index vectors serialize):

  eq         assemble.eq (mass/forces/Je) pullback
  contacts   assemble.contacts (narrowphase + compaction) pullback
  blocks     assemble.contact_blocks (Jc/Jf/G/h/F) pullback with the
             contact buffer held fixed
  pairs      vmapped circle_circle over the P=2016 static pair gathers
             (pos[ia], radius[ia]) — VJP = scatter-add (B, P, 2) -> (B, N, 2)
  compact    the packed compaction gather packed[keep] — VJP = ONE
             scatter-add (B, C, 7) -> (B, P, 7)
  dyn-take   restitution[contacts.ia] style dynamic param gather —
             VJP = scatter-add (B, C) -> (B, N)

Usage: python tools/asm_vjp_probe.py     (on the TPU)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world_scene, log, time_chained


def main():
    log(f"[asm_vjp] devices: {jax.devices()}")
    from lcp_physics_tpu.core.geometry import Contacts, circle_circle
    from lcp_physics_tpu.core.step import make_assemble
    from lcp_physics_tpu.utils import SimConfig

    B = 256
    static, params, states = build_world_scene(B, dense=True)
    config = SimConfig(max_iter=12, solver_eps=1e-5)
    assemble, _ = make_assemble(static, config)
    dt_w = jnp.full((B,), 0.01, jnp.float32)

    eq_b = jax.vmap(assemble.eq, in_axes=(None, 0, 0))
    con_b = jax.vmap(assemble.contacts, in_axes=(None, 0, 0))
    cb_b = jax.vmap(assemble.contact_blocks,
                    in_axes=(None, 0, 0, 0, 0, 0))

    def timed_pullback(name, f, *args, ct=None, reps=40):
        out, pull = jax.vjp(f, *args)
        c = jax.tree.map(jnp.ones_like, out) if ct is None else ct
        t = time_chained(lambda cc: pull(cc), c, reps=reps)
        tf = time_chained(f, *args, reps=reps)
        log(f"[asm_vjp] {name:34s} fwd {tf * 1e3:7.3f}  "
            f"pull {t * 1e3:7.3f} ms")
        return t

    # ---- full assembly (anchor, should match bwd_roofline) -------------
    def asm(params, states):
        eq = eq_b(params, states, dt_w)
        contacts, rmask = con_b(params, states, dt_w)
        bl = cb_b(params, states, contacts, eq, rmask, dt_w)
        return bl["Q"], bl["p"], bl["G"], bl["h"], bl["F"].mu

    timed_pullback("full assembly", asm, params, states, reps=20)

    # ---- stage 1: eq ----------------------------------------------------
    timed_pullback("eq (mass/forces/Je)", lambda pr, st: tuple(
        eq_b(pr, st, dt_w).values()), params, states)

    # ---- stage 2: narrowphase + compaction ------------------------------
    def con_f(pr, st):
        c, _ = con_b(pr, st, dt_w)
        return c.normal, c.ra, c.rb, c.depth

    timed_pullback("contacts (narrow+compact)", con_f, params, states)

    # ---- stage 3: blocks given fixed contact buffer ---------------------
    contacts, rmask = jax.jit(lambda pr, st: con_b(pr, st, dt_w))(
        params, states)
    eq = jax.jit(lambda pr, st: eq_b(pr, st, dt_w))(params, states)

    def blocks_f(pr, st, normal, ra, rb, depth):
        c = Contacts(normal, ra, rb, depth, contacts.ia, contacts.ib,
                     contacts.valid)
        bl = cb_b(pr, st, c, eq, rmask, dt_w)
        return bl["G"], bl["h"], bl["F"].mu

    timed_pullback("blocks (Jc/Jf/G/h/F, fixed buf)", blocks_f, params,
                   states, contacts.normal, contacts.ra, contacts.rb,
                   contacts.depth)

    # ---- micro: pair narrowphase gathers --------------------------------
    pairs = static.pair_lists()
    cc_i, cc_j = pairs["cc"]
    cc_i = jnp.asarray(cc_i)
    cc_j = jnp.asarray(cc_j)
    P = cc_i.shape[0]
    pos_b = states.p[:, :, 1:3]
    rad = params.radius

    def pair_stage(pos_b, rad):
        def one(pos):
            return jax.vmap(lambda i, j: circle_circle(
                pos[i], rad[i], pos[j], rad[j]))(cc_i, cc_j)
        return jax.vmap(one)(pos_b)

    timed_pullback(f"pairs (P={P} gathers+kernel)", pair_stage, pos_b, rad)

    # ---- micro: compaction gather ---------------------------------------
    C = static.c_max
    rng = np.random.default_rng(0)
    keep = jnp.asarray(
        np.stack([rng.permutation(P)[:C] for _ in range(B)]))
    packed = jnp.asarray(rng.normal(size=(B, P, 7)), jnp.float32)

    def compact(packed):
        return jnp.take_along_axis(packed, keep[..., None], axis=1)

    timed_pullback(f"compact gather (B,{C},7)<-(B,{P},7)", compact, packed)

    # ---- micro: dynamic param take --------------------------------------
    ia = contacts.ia

    def dyn_take(rest):
        return jax.vmap(lambda i: rest[i])(ia)

    timed_pullback(f"dyn param take (B,{C})<-(N,)", dyn_take,
                   params.restitution)


if __name__ == "__main__":
    main()
