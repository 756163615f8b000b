"""Parallel-in-time LQR: associative-scan backward pass must match the
serial Riccati sweep on random affine LQR problems (with cross terms)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_kmanip_tpu.solvers.parallel_lqr import (
    LQRProblem,
    backward_associative,
    backward_sequential,
)


def random_problem(rng, H=12, n=6, m=3, cross=True):
    def spd(k, d, scale=1.0):
        X = rng.randn(k, d, d) * scale
        return X @ X.transpose(0, 2, 1) + 0.5 * np.eye(d)

    A = rng.randn(H, n, n) * 0.3 + np.eye(n)
    B = rng.randn(H, n, m) * 0.5
    d = rng.randn(H, n) * 0.1
    Q = spd(H, n, 0.3)
    q = rng.randn(H, n) * 0.1
    R = spd(H, m, 0.3) + np.tile(np.eye(m), (H, 1, 1))
    r = rng.randn(H, m) * 0.1
    L = rng.randn(H, m, n) * (0.1 if cross else 0.0)
    Qf = spd(1, n, 0.5)[0]
    qf = rng.randn(n) * 0.1
    f64 = lambda x: jnp.asarray(x, dtype=jnp.float64)
    return LQRProblem(*(f64(x) for x in (A, B, d, Q, q, R, r, L, Qf, qf)))


@pytest.fixture(autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.mark.parametrize("cross", [False, True])
def test_associative_matches_sequential(cross):
    if True:
        rng = np.random.RandomState(0 if cross else 1)
        p = random_problem(rng, cross=cross)
        K1, k1 = backward_sequential(p)
        K2, k2 = backward_associative(p)
        np.testing.assert_allclose(np.asarray(K1), np.asarray(K2), atol=1e-8)
        np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-8)


def test_gains_are_optimal():
    """Perturbing the gain-rolled controls must not lower the true LQR cost."""
    if True:
        rng = np.random.RandomState(2)
        p = random_problem(rng, H=8, n=4, m=2)
        K, kff = backward_sequential(p)
        x0 = jnp.asarray(rng.randn(4))

        def rollout_cost(us):
            def body(x, tu):
                t, u = tu
                c = (
                    0.5 * x @ p.Q[t] @ x + p.q[t] @ x
                    + 0.5 * u @ p.R[t] @ u + p.r[t] @ u + u @ p.L[t] @ x
                )
                x2 = p.A[t] @ x + p.B[t] @ u + p.d[t]
                return x2, c
            xT, cs = jax.lax.scan(body, x0, (jnp.arange(8), us))
            return jnp.sum(cs) + 0.5 * xT @ p.Qf @ xT + p.qf @ xT

        def roll_gains():
            us = []
            x = x0
            for t in range(8):
                u = K[t] @ x + kff[t]
                us.append(u)
                x = p.A[t] @ x + p.B[t] @ u + p.d[t]
            return jnp.stack(us)

        us_opt = roll_gains()
        c_opt = float(rollout_cost(us_opt))
        for _ in range(5):
            us_pert = us_opt + jnp.asarray(rng.randn(8, 2) * 0.05)
            assert float(rollout_cost(us_pert)) >= c_opt - 1e-9
