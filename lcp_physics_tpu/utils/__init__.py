"""Math helpers, defaults and host-side recording utilities.

Parity target: reference ``lcp_physics/physics/utils.py`` (``Defaults``,
``Indices``, ``cross_2d``, ``left_orthogonal``, ``rotation_matrix``,
``get_tensor``, ``cart_to_polar``/``polar_to_cart``, ``Recorder``, ``plot``).

The math helpers here are pure jnp functions (usable inside jit/vmap); the
``Recorder``/``plot`` utilities are host-side only, exactly as in the
reference where pygame/matplotlib never touch the math path.
"""
from __future__ import annotations

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np


class Indices:
    """Index layout of the per-body generalized coordinate [rot, x, y]."""

    ROT = 0
    X = 1
    Y = 2


class _DefaultsMeta(type):
    # ENGINE/CONTACT resolve lazily: utils is imported by the physics
    # package, so binding the classes eagerly would be an import cycle.
    @property
    def ENGINE(cls):
        from lcp_physics_tpu.physics.engines import PdipmEngine
        return PdipmEngine

    @property
    def CONTACT(cls):
        from lcp_physics_tpu.physics.contacts import DiffContactHandler
        return DiffContactHandler


class Defaults(metaclass=_DefaultsMeta):
    """Default simulation constants.

    Mirrors the knob set of the reference ``Defaults`` (DT, EPSILON, TOL,
    FRIC_DIRS, FRIC_COEFF, RESTITUTION, ENGINE, CONTACT, POST_STABILIZATION,
    DTYPE, DEVICE).  Values are our own choices (the reference mount was
    empty; see SURVEY.md §0) but are kept in the same ranges the companion
    paper describes.
    """

    DT = 1.0 / 30.0
    # Interior-point / LCP solver knobs.
    EPSILON = 1e-7        # complementarity tolerance target of the PDIPM
    MAX_ITER = 20         # fixed PDIPM trip count (masked early convergence)
    # Contact handling.
    TOL = 1e-6            # penetration tolerance before dt-halving backtrack
    FRIC_DIRS = 2         # tangent direction pairs per contact (2D: +t, -t)
    FRIC_COEFF = 0.9
    RESTITUTION = 0.5
    POST_STABILIZATION = False
    # ENGINE / CONTACT are lazy class properties (see _DefaultsMeta):
    # Defaults.ENGINE is PdipmEngine, Defaults.CONTACT is DiffContactHandler
    # — the reference's documented default knobs (SURVEY.md §5.6).

    # Numerics: float64 for reference-parity runs on CPU (requires
    # jax_enable_x64), float32 for TPU production runs.
    @staticmethod
    def dtype():
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static (hashable) simulation configuration — safe as a jit static arg.

    The functional core takes this instead of reading the mutable ``Defaults``
    class, so every compiled step is pinned to an explicit configuration.
    """

    fric_dirs: int = Defaults.FRIC_DIRS
    max_iter: int = Defaults.MAX_ITER
    solver_eps: float = Defaults.EPSILON
    tol: float = Defaults.TOL
    post_stabilization: bool = Defaults.POST_STABILIZATION
    strict_no_penetration: bool = True
    max_dt_halvings: int = 6
    # Predictive contact activation: emit contact rows while bodies are
    # still separated by up to one step of travel (per-body motion bound),
    # with the normal-row target either resolving the impact at the surface
    # or capping approach at gap/dt.  Prevents the v*dt impact penetration
    # a strictly overlap-activated velocity-level LCP cannot avoid.
    # False reproduces the overlap-only reference-style activation.
    speculative: bool = True
    # Block gradients through contact geometry (reference OdeContactHandler
    # semantics: contacts from the ODE C library carry no gradients).
    stop_contact_grad: bool = False
    # KKT factorization backend: 'auto' (pallas on TPU, xla elsewhere),
    # 'xla' (batched pivoted LU), or 'pallas' (lane-batched pivotless LU).
    lcp_backend: str = "auto"
    # Iterative-refinement steps per KKT solve (0 = off).  One step
    # recovers the digit the f32 pivotless factor loses on contact-rich
    # scenes (PERF.md) at ~+30% per-iteration cost; no effect in f64.
    solver_refine: int = 0
    # Precision of the forward per-iteration KKT factorization on TPU
    # (None = fast: single-pass bf16 matmuls + rank-16 blocked GJ panel
    # inversion; 'highest' = 3-pass f32 matmuls + the precision-exact
    # scalar GJ kernel).  Round-3 finding (PERF.md): the dense-scene f32
    # merit floor TRACKS the factor configuration — fast ~4e-2, 'highest'
    # ~1e-4 (parity with the pivoted xla backend) at ~half the dense
    # throughput (7.8k -> 3.8k steps/s; converging solves run more real
    # iterations than stalling ones).  Accuracy ladder at f32:
    # default (4e-2) < solver_refine=1 (1.6e-3, -17%) <
    # factor_precision='highest' (1e-4, -52%).  No effect at f64.
    solver_factor_precision: str | None = None
    # Matmul precision of the implicit-gradient transposed KKT solve (the
    # backward pass).  None = the lcp module default (BWD_MATMUL_PRECISION
    # = 'highest', 6-pass bf16 on TPU — the conservative one-shot-solve
    # choice); 'high' (3-pass, ~f32) is measurably cheaper on dense
    # grad-rollouts with gradient error far below the default profile's
    # own solution accuracy (PERF.md round-3 "backward precision").
    # Ignored when solver_factor_precision requests an exact forward,
    # which always gets an exact backward.
    solver_bwd_precision: str | None = None
    # Reference notImprovedLim: per-instance IPM stall exit — freeze an
    # instance at its best iterate after this many consecutive
    # non-improving iterations (0 = off).  At f32, contact-rich systems
    # plateau at the conditioning floor above solver_eps; without this the
    # solver burns its full iteration budget making no progress.  Default
    # 1 (the reference's notImprovedLim default is 3, tuned for f64):
    # best-iterate return makes the earlier exit loss-free on plateauing
    # scenes — measured BIT-IDENTICAL dense-scene residuals/solutions at
    # lim 1 vs 2 with one fewer iteration (+23% dense throughput), and
    # the f64 suite (tol-asserting engine tests) stays green (PERF.md
    # round-2).  The solver additionally refuses to stall-freeze before
    # iteration lim+2, so a single early step-length collapse (alpha ~ 0,
    # merit bit-equal, next centering step recovers) cannot freeze an
    # instance at small limits.  The API-parity surfaces (lcp_solve,
    # LCPFunction) keep the reference's notImprovedLim=3 default.
    solver_stall_lim: int = 1
    # Relative merit improvement required to RESET the stall counter
    # (0.0 = reference semantics: any strict improvement resets it).
    # Near the precision floor the merit can keep creeping down by <1%
    # per iteration, so the strict criterion never stalls and
    # iteration-bound scenes (fresh impacts every step, e.g. bodies
    # raining onto a chain) burn extra iterations for no accuracy:
    # measured on the joint-chain scene at CPU-f32 'highest' precision,
    # worlds converge to merit ~1e-4 by iteration ~5 then creep to 12;
    # 0.02 cuts the summed per-step iteration maxima 81 -> 68 with
    # identical final accuracy.  On the TPU PRODUCTION profile the bf16
    # factor noise already trips the strict exit, so the measured gain
    # is only +0.5-1% (PERF.md round 4) — hence default 0.0 (reference
    # semantics); set 0.02-0.05 for iteration-bound budgets on exact
    # ('highest'/f64) profiles.  The returned iterate is always the
    # strict best seen.
    solver_stall_rtol: float = 0.0
    # Gondzio multiple-centrality-corrector rounds per IPM iteration
    # (0 = off, reference Mehrotra semantics).  Each round reuses the
    # iteration's factorization for one extra cheap solve that recenters
    # the trial point, trading solves for iterations.  Pays off when the
    # factor dominates (large contact systems) and solves genuinely
    # converge — pair with solver_factor_precision='highest' for the
    # accurate profile; measured effect on the fast bf16 profile is
    # neutral (solves stall at the precision floor regardless).
    # NOTE: any value > 0 DISABLES the fused whole-IPM Pallas kernel
    # (corrector rounds are a packed-loop feature), so small scenes that
    # normally ride the fused kernel drop to the unfused loop — on those,
    # expect a slowdown regardless of what the correctors save.
    solver_gondzio: int = 0
    # Segment the batched step over world tiles of this size (lax.map):
    # peak HBM scales with the tile instead of the full batch, which is
    # what lets a single chip run the 4096 x 64-body stretch config.
    # 0 = one fused batch (fastest while it fits).  Also the
    # contact-free fast path's GRANULARITY: the AABB dispatch is
    # per-tile, so on mixed populations (some worlds colliding, most
    # free) a tile size near the active-cluster size lets free tiles
    # skip narrowphase+solver entirely — measured 5.75x on a
    # 32-dense/224-loose batch (PERF.md round-3).
    batch_tile: int = 0
    # Hull-hull narrowphase pair budget: if > 0 and the static hull pair
    # list is longer, only this many pairs — ranked by AABB-overlap
    # extent — reach the SAT/clipping kernel each step (stop-gradient
    # selection; EXACT whenever the budget >= the true overlap count,
    # since non-overlapping pairs never produce contacts).  On a touching
    # 64-hull grid only ~200 of 2016 static pairs overlap; 0 = no budget.
    hull_pair_budget: int = 0
    # In-jit per-world dt-halving backtrack on fresh penetration for the
    # batched/scan path (make_step_batched): the reference World.step
    # restore-and-retry semantics without host round-trips.  A bounded
    # stop-gradient while_loop finds the accepted per-world dt, then one
    # differentiable re-solve runs at it (costs one extra forward solve
    # when nothing penetrates).  Worlds that backtrack advance t by their
    # accepted smaller dt.  Off by default (throughput).
    penetration_backtrack: bool = False
    # When a whole step tile has ZERO active contact rows, skip the IPM
    # entirely: a lax.cond dispatches to the closed-form equality-KKT
    # solution (core/step.py::_equality_solve — exact, and what the IPM
    # would converge to on an all-padding system).  Contact-sparse
    # workloads (loose scenes, billiards-style rollouts between impacts)
    # skip the init factorization + solver loop in forward AND backward.
    # The tile granularity is ``batch_tile``: one touching world sends
    # its whole tile down the solver branch.
    contact_free_fast_path: bool = True

    def __post_init__(self):
        # Fail fast at construction, not deep inside the first jitted step
        # (VERDICT r2 missing #4).  In 2D the tangent space is 1-D, so the
        # polyhedral friction cone is exactly the pair (+t, -t); the
        # reference exposes FRIC_DIRS as a knob but likewise always runs 2.
        if self.fric_dirs != 2:
            raise ValueError(
                f"fric_dirs={self.fric_dirs}: 2D friction needs exactly 2 "
                "tangent directions (+t, -t); other counts would leave the "
                "cone one-sided (1) or include non-tangent directions (>2)")


def get_tensor(x, dtype=None):
    """Coerce scalars/lists/np arrays to a jnp array of the working dtype."""
    dtype = dtype or Defaults.dtype()
    return jnp.asarray(x, dtype=dtype)


def cross_2d(a, b):
    """Scalar 2D cross product a_x b_y - a_y b_x (broadcasts on leading dims)."""
    return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]


def left_orthogonal(v):
    """Rotate v by -90 degrees: (x, y) -> (y, -x).

    ``left_orthogonal(omega_vec)`` conventions follow the reference helper of
    the same name; note ``omega x r`` in 2D is ``omega * perp(r)`` with
    ``perp(r) = (-r_y, r_x) = -left_orthogonal(r)``.
    """
    return jnp.stack([v[..., 1], -v[..., 0]], axis=-1)


def perp_2d(v):
    """Rotate v by +90 degrees: (x, y) -> (-y, x).  omega x r = omega * perp(r)."""
    return jnp.stack([-v[..., 1], v[..., 0]], axis=-1)


def rotation_matrix(theta):
    """2x2 rotation matrix (supports batched theta with leading dims)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    row0 = jnp.stack([c, -s], axis=-1)
    row1 = jnp.stack([s, c], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def rotate(vec, theta):
    """Rotate 2-vector(s) by angle(s) theta. vec: (..., 2), theta: (...)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    x = c * vec[..., 0] - s * vec[..., 1]
    y = s * vec[..., 0] + c * vec[..., 1]
    return jnp.stack([x, y], axis=-1)


def cart_to_polar(v, positive=True):
    r = jnp.linalg.norm(v, axis=-1)
    theta = jnp.arctan2(v[..., 1], v[..., 0])
    if positive:
        theta = jnp.where(theta < 0, theta + 2 * jnp.pi, theta)
    return r, theta


def polar_to_cart(r, theta):
    return jnp.stack([r * jnp.cos(theta), r * jnp.sin(theta)], axis=-1)


def orthogonal_tangents(n, fric_dirs=2):
    """Friction tangent directions for a contact normal n (..., 2).

    Returns (..., 2, 2): the pair (+t, -t) with t = perp(n).  In 2D the
    tangent space is one-dimensional, so exactly two opposed directions
    span the polyhedral friction cone — other counts would either leave
    the cone one-sided (1) or include non-tangent directions (>2), so they
    are rejected (the reference likewise always uses FRIC_DIRS=2).
    """
    if fric_dirs != 2:
        raise ValueError(
            f"2D friction needs exactly 2 tangent directions (+t, -t); "
            f"got fric_dirs={fric_dirs}")
    t = perp_2d(n)
    return jnp.stack([t, -t], axis=-2)


def polygon_inertia(verts, mass):
    """Moment of inertia (about centroid) of a convex polygon with vertices
    ``verts`` (V, 2) given total ``mass``.  Standard polygon second-moment
    formula; matches the reference Hull inertia computation semantics."""
    v = verts
    v2 = jnp.roll(v, -1, axis=0)
    cross = cross_2d(v, v2)
    num = jnp.sum(cross * (jnp.sum(v * v, axis=-1) + jnp.sum(v * v2, axis=-1)
                           + jnp.sum(v2 * v2, axis=-1)))
    den = 6.0 * jnp.sum(cross)
    return mass * num / den


def polygon_centroid(verts):
    """Centroid of a convex polygon (V, 2)."""
    v = verts
    v2 = jnp.roll(v, -1, axis=0)
    cross = cross_2d(v, v2)
    area6 = 3.0 * jnp.sum(cross)
    cx = jnp.sum((v[:, 0] + v2[:, 0]) * cross) / area6
    cy = jnp.sum((v[:, 1] + v2[:, 1]) * cross) / area6
    return jnp.stack([cx, cy])


class Recorder:
    """Dump rendered frames to disk at a fixed recording dt (host-side).

    Parity: reference ``Recorder`` in ``physics/utils.py``.
    """

    def __init__(self, dt, screen, path=os.path.join(".", "videos", "frames")):
        self.dt = dt
        self.prev_t = 0.0
        self.frame = 0
        self.screen = screen
        self.path = path
        os.makedirs(path, exist_ok=True)

    def record(self, t):
        if t - self.prev_t >= self.dt:
            import pygame  # lazy: never on the math path

            pygame.image.save(
                self.screen, os.path.join(self.path, f"{self.frame:07d}.bmp")
            )
            self.frame += 1
            self.prev_t += self.dt


def plot(y_axis, x_axis=None):
    """Quick matplotlib line plot (host-side debugging helper)."""
    import matplotlib.pyplot as plt  # lazy

    y = np.asarray(y_axis)
    if x_axis is None:
        plt.plot(np.arange(len(y)), y)
    else:
        plt.plot(np.asarray(x_axis), y)
    plt.show()
