"""Row gathers whose TRANSPOSE is a one-hot matmul instead of a scatter.

Why this module exists (round-5 backward roofline, PERF.md): the VJP of
``arr[idx]`` is a scatter-add, and TPU scatters with long index vectors
serialize — the dense flagship's 21 ms/step backward was 94% assembly
VJP, and 16.5 ms of that was the transpose of the narrowphase's static
pair gathers ``pos[pair_i]`` (B=256, P=2016 indices into N=64 rows;
``tools/asm_vjp_probe.py``).  Expressing the same transpose as
``one_hot(idx)ᵀ @ ct`` turns it into an MXU matmul (~0.1 GFLOP at those
shapes — microseconds), and when ``idx`` is a compile-time constant
(static pair lists) the one-hot constant-folds.

Exactness: each one-hot row has a single 1, so the matmul is a sum of
selected cotangent rows; the einsum runs under ``'highest'`` matmul
precision, which is f32-exact on TPU (and a no-op at f64 on CPU), so
gradients agree with the scatter-add transpose to f32 rounding.

Caveat: ``custom_vjp`` functions do not support forward-mode AD; the
engine differentiates in reverse mode only (implicit-KKT ``custom_vjp``
already rules out ``jvp`` through the solve).

Parity note: the reference has no analog — its contact generation is
host-side Python/ODE objects (SURVEY.md §3.1); this is a TPU-only
transpose-scheduling concern.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def make_take_rows(n_rows: int):
    """Return ``take(arr, idx) == arr[idx]`` (gather over axis 0 of an
    ``(n_rows, ...)`` array) whose VJP is ``einsum('pn,p...->n...',
    one_hot(idx), ct)`` — an MXU matmul instead of a scatter-add.

    ``idx`` may be a static numpy array (the one-hot constant-folds) or a
    traced int array (the one-hot is built at runtime — still a win: the
    matmul beats the serialized scatter at every shape measured).  Repeated
    indices are summed by the contraction, exactly like scatter-add.
    """

    @jax.custom_vjp
    def take(arr, idx):
        return jnp.take(arr, idx, axis=0)

    def fwd(arr, idx):
        return jnp.take(arr, idx, axis=0), idx

    def bwd(idx, ct):
        oh = jax.nn.one_hot(idx, n_rows, dtype=ct.dtype)
        with jax.default_matmul_precision("highest"):
            d = jnp.einsum("pn,p...->n...", oh, ct)
        return d, None

    take.defvjp(fwd, bwd)
    return take


def make_take_unique_rows(n_rows: int):
    """Like :func:`make_take_rows` but for index vectors the CALLER
    guarantees are unique (e.g. ``top_k`` compaction picks): the VJP is a
    ``.at[idx].set(ct)`` with ``unique_indices=True`` — no add-combine, so
    XLA can vectorize the scatter instead of serializing it.  With
    duplicate indices the gradient would be WRONG (last-write instead of
    sum); only use where uniqueness is structural.
    """

    @jax.custom_vjp
    def take(arr, idx):
        return jnp.take(arr, idx, axis=0)

    def fwd(arr, idx):
        return jnp.take(arr, idx, axis=0), idx

    def bwd(idx, ct):
        d = jnp.zeros((n_rows,) + ct.shape[1:], ct.dtype)
        d = d.at[idx].set(ct, unique_indices=True,
                          indices_are_sorted=False, mode="drop")
        return d, None

    take.defvjp(fwd, bwd)
    return take
