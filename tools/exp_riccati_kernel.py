"""A/B microbench of the Riccati sweep kernel's Cholesky formulations.

Times ONLY riccati_sweep_pallas (torso-sized: H=100, n=40, m=20) on the
real TPU, as a jitted chain of `reps` dependent sweeps per dispatch so the
per-sweep time comes from a long on-device chain instead of a noisy
host-side slope. Prints ms/sweep for impl in {rows, cols}.

Run: python tools/exp_riccati_kernel.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.ops.pallas_riccati import riccati_sweep_pallas

H, N, M = 100, 40, 20
REPS = 50


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


def bench(impl):
    prob = make_problem()

    @jax.jit
    def chain(cx):
        # REPS dependent sweeps: each feeds a hash of its gains back into
        # cx, so the chain cannot be value-cached or reordered
        def body(cx, _):
            ks, Ks = riccati_sweep_pallas(
                prob[0], prob[1], cx, *prob[3:], 1e-6, impl=impl
            )
            return cx + 1e-9 * jnp.sum(ks) , None

        out, _ = jax.lax.scan(body, cx, None, length=REPS)
        return out

    out = chain(prob[2])
    np.asarray(out)  # sync (block_until_ready doesn't block on axon)
    best = np.inf
    for rep in range(3):
        cx_in = prob[2] + np.float32(1e-6 * (rep + 1))
        t0 = time.time()
        out = chain(cx_in)
        np.asarray(out)
        best = min(best, time.time() - t0)
    print(f"{impl:6s} {best / REPS * 1e3:8.3f} ms/sweep")


if __name__ == "__main__":
    for impl in ("rows", "cols"):
        bench(impl)
