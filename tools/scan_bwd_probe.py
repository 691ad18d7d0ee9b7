"""Why does the scanned dense rollout's backward cost 14.5 ms/step when
one step's VJP pullback is 5.3 ms (round-5, post take-VJP fix)?

The gap (~8.5 ms/step) is scan-AD overhead: the augmented forward
(residual computation + stacking) plus whatever XLA fails to fuse across
the scan boundary.  This tool A/Bs the knobs that move scan AD:

  scan          lax.scan, default             (the bench configuration)
  unroll8       lax.scan(unroll=8)            (fuse across steps)
  remat         jax.checkpoint(body)          (recompute, no residuals)
  remat-dots    checkpoint_dots policy        (save matmuls only)
  python-loop   8 unrolled python steps       (no scan at all)

Usage: python tools/scan_bwd_probe.py      (on the TPU)
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from bench import build_world_scene, log, time_chained


def main():
    log(f"[scan_bwd] devices: {jax.devices()}")
    from lcp_physics_tpu.parallel import make_batched_step
    from lcp_physics_tpu.utils import SimConfig

    B, n_steps = 256, 8
    static, params, states = build_world_scene(B, dense=True)
    bstep = make_batched_step(static, SimConfig(max_iter=12,
                                                solver_eps=1e-5))

    def make_loss(kind):
        def loss(params, states):
            def body(s, _):
                s2, _ = bstep(params, s, 0.01)
                return s2, ()

            if kind == "python-loop":
                s = states
                for _ in range(n_steps):
                    s, _ = body(s, None)
                return jnp.mean(s.p ** 2)

            b = body
            if kind == "remat":
                b = jax.checkpoint(body)
            elif kind == "remat-dots":
                b = jax.checkpoint(
                    body, policy=jax.checkpoint_policies.checkpoint_dots)
            unroll = 8 if kind == "unroll8" else 1
            out, _ = jax.lax.scan(b, states, None, length=n_steps,
                                  unroll=unroll)
            return jnp.mean(out.p ** 2)
        return loss

    for kind in ("scan", "unroll8", "remat", "remat-dots", "python-loop"):
        loss = make_loss(kind)

        def fb(params, states):
            v, g = jax.value_and_grad(loss)(params, states)
            return v, g.mass

        try:
            t_f = time_chained(loss, params, states, reps=20)
            t_fb = time_chained(fb, params, states, reps=10)
        except Exception as e:  # e.g. unroll8 HBM-OOMs (fragmentation)
            log(f"[scan_bwd] {kind:12s} FAILED: {str(e).splitlines()[0][:120]}")
            continue
        log(f"[scan_bwd] {kind:12s} fwd {t_f * 1e3:7.1f}  fwd+bwd "
            f"{t_fb * 1e3:7.1f}  bwd/step {(t_fb - t_f) / n_steps * 1e3:6.2f} ms"
            f"  -> {B * n_steps / t_fb:,.0f} grad-world-steps/s")


if __name__ == "__main__":
    main()
