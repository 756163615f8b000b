"""How much of the Riccati sweep is the in-kernel Cholesky?

Adds a timing-only "diag" solve (X = RHS / diag(Quu) — WRONG math, right
shapes) to the sweep's impl registry and A/Bs it against rows/cols at
torso shapes. The rows-minus-diag gap is the Cholesky+substitution budget
a blocked formulation can attack.

Run: python tools/exp_chol_blocked.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.ops import pallas_riccati as pr

H, N, M = 100, 40, 20
REPS = 50


def _diag_solve(Quu, RHS, m, lam=0.0):
    eye = jnp.eye(m, dtype=Quu.dtype)
    diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam
    return RHS / diag


pr._CHOL_IMPLS["diag"] = _diag_solve


def make_problem(seed=0):
    rng = np.random.RandomState(seed)
    A = jnp.asarray(0.05 * rng.randn(H, N, N) + np.eye(N), jnp.float32)
    B = jnp.asarray(0.1 * rng.randn(H, N, M), jnp.float32)
    cx = jnp.asarray(rng.randn(H, N), jnp.float32)
    cu = jnp.asarray(rng.randn(H, M), jnp.float32)
    W = rng.randn(H, N, N)
    cxx = jnp.asarray(0.05 * (W @ W.transpose(0, 2, 1)) + np.eye(N), jnp.float32)
    Wu = rng.randn(H, M, M)
    cuu = jnp.asarray(0.05 * (Wu @ Wu.transpose(0, 2, 1)) + np.eye(M), jnp.float32)
    cux = jnp.asarray(0.05 * rng.randn(H, M, N), jnp.float32)
    VxT = jnp.asarray(rng.randn(N), jnp.float32)
    Wt = rng.randn(N, N)
    VxxT = jnp.asarray(0.05 * (Wt @ Wt.T) + np.eye(N), jnp.float32)
    return A, B, cx, cu, cxx, cuu, cux, VxT, VxxT


def bench(spec):
    # spec: "impl" (legacy step) or "step:impl" e.g. "gemm5:hybrid"
    if ":" in spec:
        step_impl, impl = spec.split(":")
    else:
        step_impl, impl = "legacy", spec
    prob = make_problem()

    @jax.jit
    def chain(cx):
        def body(cx, _):
            ks, Ks = pr.riccati_sweep_pallas(
                prob[0], prob[1], cx, *prob[3:], 1e-6, impl=impl,
                step_impl=step_impl,
            )
            return cx + 1e-9 * jnp.sum(ks), None

        out, _ = jax.lax.scan(body, cx, None, length=REPS)
        return out

    out = chain(prob[2])
    np.asarray(out)
    best = np.inf
    for rep in range(3):
        cx_in = prob[2] + np.float32(1e-6 * (rep + 1))
        t0 = time.time()
        out = chain(cx_in)
        np.asarray(out)
        best = min(best, time.time() - t0)
    print(f"{spec:14s} {best / REPS * 1e3:8.3f} ms/sweep")


if __name__ == "__main__":
    impls = sys.argv[1:] or ["rows", "diag"]
    for impl in impls:
        bench(impl)
