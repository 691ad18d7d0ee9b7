"""Structured friction-cone coupling matrix.

The physics engine's F block (reference ``PdipmEngine.solve_dynamics``
assembly: F = [[0,0,0],[0,0,-E],[-diag(mu),E^T,0]]) is determined by the
per-contact friction coefficients ``mu`` and the validity mask — the cone
map E is just ``fd`` stacked (masked) identities.  Materializing it densely
costs O(B m^2) memory (268 MB at B=256, C=128) and a dense matvec per IPM
iteration; this class carries the O(C) data and implements the few
products the solver needs.

Row layout (m = C * (2 + fd)): [normal (C); friction (fd*C); gamma (C)].
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["mu", "valid"], meta_fields=["fd"])
@dataclasses.dataclass
class ConeF:
    """Structured F. mu (..., C) masked friction coefficients; valid
    (..., C) float mask; fd static tangent-direction count."""

    mu: jax.Array
    valid: jax.Array
    fd: int = 2

    @property
    def C(self):
        return self.mu.shape[-1]

    @property
    def m(self):
        return self.C * (2 + self.fd)

    @property
    def dtype(self):
        return self.mu.dtype

    @property
    def ndim(self):  # matrix-rank view: (..., m, m)
        return self.mu.ndim + 1

    @property
    def shape(self):
        return self.mu.shape[:-1] + (self.m, self.m)

    def matvec(self, lam):
        """F @ lam for lam (..., m)."""
        C, fd = self.C, self.fd
        lam_n = lam[..., :C]
        beta = lam[..., C:C + fd * C]
        gamma = lam[..., C + fd * C:]
        zeros_n = jnp.zeros_like(lam_n)
        fric = -jnp.concatenate([self.valid * gamma] * fd, axis=-1)
        beta_sum = sum(beta[..., d * C:(d + 1) * C] for d in range(fd))
        g_rows = -self.mu * lam_n + self.valid * beta_sum
        return jnp.concatenate([zeros_n, fric, g_rows], axis=-1)

    def dense(self):
        """Materialize (for the generic dense solver paths / debugging)."""
        C, fd, dt = self.C, self.fd, self.dtype
        lead = self.mu.shape[:-1]
        m = self.m
        F = jnp.zeros(lead + (m, m), dt)
        eye = jnp.eye(C, dtype=dt)
        E = jnp.concatenate([eye] * fd, axis=0)          # (fd*C, C)
        Ev = E * jnp.concatenate([self.valid] * fd, axis=-1)[..., None] \
            * self.valid[..., None, :]
        F = F.at[..., C:C + fd * C, C + fd * C:].set(-Ev)
        mu_d = self.mu[..., None] * eye
        F = F.at[..., C + fd * C:, :C].set(-mu_d)
        F = F.at[..., C + fd * C:, C:C + fd * C].set(
            jnp.swapaxes(Ev, -1, -2))
        return F
