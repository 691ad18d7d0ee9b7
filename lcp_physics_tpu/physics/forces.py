"""External forces.

Parity target: reference ``lcp_physics/physics/forces.py`` —
``ExternalForce(force_func, multiplier)`` plus the module-level force
functions (``gravity``/``down_force``, ``vert_impulse``, ``hor_impulse``,
``rot_impulse``) returning generalized 3-vectors [torque, fx, fy]
(SURVEY.md §2.1).

Force functions must be jax-traceable in ``t`` (the step is jitted), so the
impulse windows use ``jnp.where`` instead of Python branches.  The
``multiplier`` is the differentiable knob: ``World`` hoists it into the
scene parameter PyTree, which is how the reference's "learn the force
magnitude by gradient descent" demo is reproduced with ``jax.grad``.
"""
from __future__ import annotations

import jax.numpy as jnp


class ExternalForce:
    """A time-dependent force attached to a body.

    ``force_func(t) -> (3,)`` direction profile; the applied force is
    ``multiplier * force_func(t)``.
    """

    def __init__(self, force_func=None, multiplier=100.0):
        self.force_func = force_func if force_func is not None else gravity
        self.multiplier = multiplier

    def __call__(self, t):
        return self.multiplier * self.force_func(t)


def gravity(t):
    """Unit downward force direction (y grows downward on screen)."""
    return jnp.array([0.0, 0.0, 1.0])


# The reference exposes both names for the same downward profile.
down_force = gravity


def _window_activation(t, window):
    """1.0 while t < window, else 0.0, at the working dtype (no hardcoded
    f32 cast — an f64 parity run must stay f64 end to end)."""
    if hasattr(t, "dtype"):
        return (t < window).astype(jnp.result_type(t, float))
    return float(t < window)


def vert_impulse(t, window=0.1):
    """Downward force active only for t < window."""
    return jnp.array([0.0, 0.0, 1.0]) * _window_activation(t, window)


def hor_impulse(t, window=0.1):
    """Horizontal (+x) force active only for t < window."""
    return jnp.array([0.0, 1.0, 0.0]) * _window_activation(t, window)


def rot_impulse(t, window=0.1):
    """Pure torque active only for t < window."""
    return jnp.array([1.0, 0.0, 0.0]) * _window_activation(t, window)
