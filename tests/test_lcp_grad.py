"""Finite-difference validation of the implicit KKT backward pass
(``jax.custom_vjp``) — the property the reference's ``LCPFunction.backward``
provides via one ``solve_kkt`` at the saved factorization (SURVEY.md §3.2).
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.test_util import check_grads

from lcp_physics_tpu.lcp import lcp_solve

from tests.test_pdipm import random_qp

SOLVE_KW = dict(max_iter=30, tol=1e-11)
GRAD_KW = dict(order=1, modes=["rev"], atol=1e-4, rtol=1e-4, eps=1e-6)


def test_grads_qp_all_inputs():
    rng = np.random.default_rng(10)
    Q, p, G, h, A, b, F = random_qp(rng, 6, 4, 2)
    fn = lambda *xs: lcp_solve(*xs, **SOLVE_KW).sum()
    check_grads(fn, (Q, p, G, h, A, b, F), **GRAD_KW)


def test_grads_lcp_with_F():
    rng = np.random.default_rng(11)
    Q, p, G, h, A, b, F = random_qp(rng, 6, 5, 2, with_F=True)
    fn = lambda *xs: (lcp_solve(*xs, **SOLVE_KW) ** 2).sum()
    check_grads(fn, (Q, p, G, h, A, b, F), **GRAD_KW)


def test_grads_no_equality():
    rng = np.random.default_rng(12)
    Q, p, G, h, A, b, F = random_qp(rng, 5, 3, 0)
    fn = lambda Q, p, G, h: lcp_solve(Q, p, G, h, **SOLVE_KW).sum()
    check_grads(fn, (Q, p, G, h), **GRAD_KW)


def test_grads_equality_only():
    """m == 0 route (contact-free physics step)."""
    rng = np.random.default_rng(13)
    n, q = 5, 2
    L = rng.standard_normal((n, n))
    Q = jnp.asarray(L @ L.T + n * np.eye(n))
    p = jnp.asarray(rng.standard_normal(n))
    A = jnp.asarray(rng.standard_normal((q, n)))
    b = jnp.asarray(rng.standard_normal(q))
    G = jnp.zeros((0, n))
    h = jnp.zeros((0,))
    fn = lambda Q, p, A, b: lcp_solve(Q, p, G, h, A, b, **SOLVE_KW).sum()
    check_grads(fn, (Q, p, A, b), **GRAD_KW)


def test_grad_matches_active_set_qp():
    """Against an analytic oracle: for a QP whose active set is known, the
    solution is z(theta) = argmin 1/2 z'Qz + p'z s.t. active rows tight;
    gradients of the equality-reduced solution must match."""
    rng = np.random.default_rng(14)
    n = 4
    Q = jnp.eye(n)
    p = jnp.asarray(rng.standard_normal(n))
    # One constraint, guaranteed active: z_0 <= min - margin
    G = jnp.zeros((1, n)).at[0, 0].set(1.0)
    unconstrained = -p
    h = jnp.asarray([float(unconstrained[0]) - 1.0])

    def loss(p):
        return lcp_solve(Q, p, G, h, **SOLVE_KW).sum()

    # Analytic: z_0 = h, z_i = -p_i for i>0  =>  dloss/dp = [0, -1, -1, -1]
    grad = jax.grad(loss)(p)
    np.testing.assert_allclose(grad, jnp.array([0., -1., -1., -1.]),
                               atol=1e-5)


def test_grads_batched_vmap():
    rng = np.random.default_rng(15)
    B = 4
    inst = [random_qp(rng, 5, 3, 1, with_F=True) for _ in range(B)]
    stacked = tuple(jnp.stack(xs) for xs in zip(*inst))

    def loss(*xs):
        z = jax.vmap(lambda *ys: lcp_solve(*ys, **SOLVE_KW))(*xs)
        return (z ** 2).sum()

    check_grads(loss, stacked, **GRAD_KW)


def test_grads_bwd_precision_parity():
    """bwd_precision only selects a matmul precision for the backward
    one-shot solve: at f64 on CPU every setting must give the same
    gradients (ADVICE r3), and an exact-forward profile
    (factor_precision='highest') must override a relaxed bwd_precision
    with the exact backward."""
    rng = np.random.default_rng(17)
    Q, p, G, h, A, b, F = random_qp(rng, 6, 4, 2, with_F=True)

    def grad_of(**kw):
        return jax.grad(lambda p: (lcp_solve(Q, p, G, h, A, b, F,
                                             **SOLVE_KW, **kw) ** 2).sum())(p)

    g_ref = grad_of()
    for kw in (dict(bwd_precision="high"),
               dict(bwd_precision="highest"),
               dict(factor_precision="highest", bwd_precision="high")):
        np.testing.assert_allclose(grad_of(**kw), g_ref, rtol=1e-9,
                                   err_msg=f"{kw}")
    # and the relaxed profile still passes finite differences
    fn = lambda *xs: (lcp_solve(*xs, **SOLVE_KW,
                                bwd_precision="high") ** 2).sum()
    check_grads(fn, (Q, p, G, h, A, b, F), **GRAD_KW)


def test_grad_through_jit():
    rng = np.random.default_rng(16)
    Q, p, G, h, A, b, F = random_qp(rng, 5, 3, 1)
    f = jax.jit(jax.grad(lambda p: lcp_solve(Q, p, G, h, A, b, F,
                                             **SOLVE_KW).sum()))
    g_jit = f(p)
    g_eager = jax.grad(lambda p: lcp_solve(Q, p, G, h, A, b, F,
                                           **SOLVE_KW).sum())(p)
    np.testing.assert_allclose(g_jit, g_eager, atol=1e-10)
