"""Batching utilities for the LCP layer.

Parity target: reference ``lcp_physics/lcp/util.py`` (``bger``,
``expandParam``, ``extract_nBatch``, ``get_sizes``).  In JAX the natural
batching primitive is ``vmap``, so these helpers only normalize user-provided
parameter stacks (shared vs per-instance) before vmapping.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def bger(x, y):
    """Batched outer product: (..., n) x (..., m) -> (..., n, m)."""
    return x[..., :, None] * y[..., None, :]


def get_sizes(G, A=None):
    """(m, n[, q]) from constraint matrices, ignoring leading batch dims."""
    m, n = G.shape[-2], G.shape[-1]
    if A is None:
        return m, n
    return m, n, A.shape[-2]


def extract_batch_size(Q, p, G, h, A=None, b=None, F=None):
    """Infer nBatch from whichever argument carries a leading batch axis.

    Base (unbatched) ranks: Q 2, p 1, G 2, h 1, A 2, b 1, F 2.
    """
    base = {"Q": 2, "p": 1, "G": 2, "h": 1, "A": 2, "b": 1, "F": 2}
    for name, x in [("Q", Q), ("p", p), ("G", G), ("h", h),
                    ("A", A), ("b", b), ("F", F)]:
        if x is not None and jnp.ndim(x) == base[name] + 1:
            return x.shape[0]
    return None


def expand_param(x, n_batch, base_ndim):
    """Broadcast a possibly-shared parameter to a full batch axis.

    Mirrors the reference's ``expandParam``: rank == base_ndim means shared
    across the batch, rank == base_ndim + 1 means already per-instance.
    """
    if x is None:
        return None
    x = jnp.asarray(x)
    if x.ndim == base_ndim:
        return jnp.broadcast_to(x, (n_batch,) + x.shape)
    if x.ndim == base_ndim + 1:
        return x
    raise ValueError(f"parameter rank {x.ndim} incompatible with base rank "
                     f"{base_ndim}")


def batch(fn):
    """vmap a single-instance LCP function over a leading batch axis with
    shared-parameter broadcasting (the reference's nBatch semantics)."""

    def wrapped(Q, p, G, h, A=None, b=None, F=None, **kw):
        nb = extract_batch_size(Q, p, G, h, A, b, F)
        if nb is None:
            return fn(Q, p, G, h, A, b, F, **kw)
        Q = expand_param(Q, nb, 2)
        p = expand_param(p, nb, 1)
        G = expand_param(G, nb, 2)
        h = expand_param(h, nb, 1)
        A = expand_param(A, nb, 2)
        b = expand_param(b, nb, 1)
        F = expand_param(F, nb, 2)
        return jax.vmap(lambda *xs: fn(*xs, **kw))(Q, p, G, h, A, b, F)

    return wrapped


# Reference-spelling aliases (lcp_physics/lcp/util.py).
expandParam = expand_param
extract_nBatch = extract_batch_size
