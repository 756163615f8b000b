"""Pallas TPU kernel: batched small-SPD Cholesky solve.

The dynamics solve (M + h B) qacc = tau runs once per physics substep over
thousands of MPC rollouts. The pure-jnp unrolled version (ops/linalg) is
already ~1.7x faster than the lapack lowering, but its ~n^2/2 tiny
elementwise ops cross many XLA fusion boundaries inside the rollout scan --
measured ~70 us per substep of overhead at K=256, n=10 against a ~10 us
VPU-ideal. This kernel runs the whole factorization + two triangular solves
as ONE Pallas program.

Layout (guide: "Tiling Constraints"): the batch K lives on the 128-wide
lane axis, matrix entries on sublanes -- M arrives as (n*n, K), b as
(n, K); every kernel op is a (1, K) VPU row op. n is static and tiny, so
the loops unroll at trace time exactly like the jnp version.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_solve_kernel(n: int, Mt_ref, bt_ref, out_ref):
    # L factor entries as (1, K) SSA rows; index [i][j] for i >= j
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = Mt_ref[j * n + j : j * n + j + 1, :]
        for kk in range(j):
            s = s - L[j][kk] * L[j][kk]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            s = Mt_ref[i * n + j : i * n + j + 1, :]
            for kk in range(j):
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv_d

    # forward substitution L y = b
    y = [None] * n
    for i in range(n):
        s = bt_ref[i : i + 1, :]
        for kk in range(i):
            s = s - L[i][kk] * y[kk]
        y[i] = s / L[i][i]

    # backward substitution L^T x = y
    for i in range(n - 1, -1, -1):
        s = y[i]
        for kk in range(i + 1, n):
            s = s - L[kk][i] * y[kk]
        y[i] = s / L[i][i]
        out_ref[i : i + 1, :] = y[i]


def cholesky_solve_pallas(M: jax.Array, b: jax.Array) -> jax.Array:
    """Solve M x = b for batched SPD M.

    M: (K, n, n), b: (K, n) -> (K, n). K should be a multiple of 128 for
    clean lane tiling (pad otherwise); n is small (<= ~24).
    """
    K, n, _ = M.shape
    Mt = M.reshape(K, n * n).T  # (n*n, K): entries on sublanes, batch on lanes
    bt = b.T  # (n, K)
    out = pl.pallas_call(
        partial(_chol_solve_kernel, n),
        out_shape=jax.ShapeDtypeStruct((n, K), M.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(Mt, bt)
    return out.T
