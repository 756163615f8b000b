"""Bisect the Riccati sweep kernel's per-step floor on the TPU.

Variants (cumulative):
  mem    — fori_loop + all 7 dynamic loads + 2 stores, body = adds only
  gemm   — mem + the 5 gemm5 MXU calls
  trans  — gemm + the Quu/Vxx transposes + symmetrize
  gersh  — trans + Gershgorin reductions  (~= gemm5:diag)

Run: python tools/exp_sweep_floor.py [variants...]
"""

import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_kmanip_tpu.ops.pallas_riccati import _mm, _mm_nt, _mm_tn

H, N, M = int(__import__('os').environ.get('FLOOR_H', 100)), 40, 20
REPS = 50


def _kernel(variant, unroll, AB_ref, cx_ref, cu_ref, cxx_ref, cuu_ref, cux_ref,
            WT_ref, ks_ref, Ks_ref):
    n, m = N, M

    def body(i, W):
        t = H - 1 - i
        AB = AB_ref[pl.ds(t, 1)].reshape(n, n + m)
        cx = cx_ref[pl.ds(t, 1)].reshape(1, n)
        cu = cu_ref[pl.ds(t, 1)].reshape(1, m)
        cxx = cxx_ref[pl.ds(t, 1)].reshape(n, n)
        cuu = cuu_ref[pl.ds(t, 1)].reshape(m, m)
        cux = cux_ref[pl.ds(t, 1)].reshape(m, n)

        if variant == "loop":
            Wn = W + np.float32(1e-9) * jax.lax.convert_element_type(t, jnp.float32)
            kff = W[:m, 0:1]
            K = W[:m, 1 : 1 + n]
        elif variant == "load1":
            Wn = W + cxx[0, 0] * 1e-9
            kff = W[:m, 0:1]
            K = W[:m, 1 : 1 + n]
        elif variant == "load1nostore":
            Wn = W + cxx[0, 0] * 1e-9
            kff = None
            K = None
        elif variant == "mem":
            Wn = W + (cx[0, 0] + cu[0, 0] + cxx[0, 0] + cuu[0, 0]
                      + cux[0, 0] + AB[0, 0]) * 1e-9
            kff = cu.T + W[:m, 0:1]
            K = cux + W[:m, 1 : 1 + n]
        else:
            GW = _mm_tn(AB, W)  # emulate AB.T @ W without transpose
            GWG = _mm(GW[:, 1:], AB)
            Qx = cx.T + GW[:n, 0:1]
            Qu = cu.T + GW[n:, 0:1]
            Qxx = cxx + GWG[:n, :n]
            Quu = cuu + GWG[n:, n:]
            Qux = cux + GWG[n:, :n]
            if variant in ("trans", "gersh"):
                Quu = 0.5 * (Quu + Quu.T)
            if variant == "gersh":
                amax = jnp.max(jnp.abs(Quu))
                eye_m = jnp.eye(m, dtype=jnp.float32)
                diag_col = jnp.sum(Quu * eye_m, axis=1, keepdims=True)
                off_col = (jnp.sum(jnp.abs(Quu), axis=1, keepdims=True)
                           - jnp.abs(diag_col))
                gersh_min = jnp.min(diag_col - off_col)
                lam = 1e-5 * amax + jnp.maximum(0.0, 1e-4 * amax - gersh_min)
            else:
                lam = 1e-6
            C = jnp.concatenate([Qu, Qux], axis=1)
            eye = jnp.eye(m, dtype=jnp.float32)
            diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam
            Kk = -(C / diag)
            U1 = _mm(Quu, Kk) + lam * Kk
            Mm = _mm_tn(Kk, U1 + C) + _mm_tn(C, Kk)
            Wn = jnp.concatenate([Qx, Qxx], axis=1) + Mm[1:, :]
            if variant in ("trans", "gersh"):
                Vxx_n = 0.5 * (Wn[:, 1:] + Wn[:, 1:].T)
                Wn = jnp.concatenate([Wn[:, 0:1], Vxx_n], axis=1)
            kff, K = Kk[:, 0:1], Kk[:, 1:]
        if kff is not None:
            ks_ref[pl.ds(t, 1)] = kff.T
            Ks_ref[pl.ds(t, 1)] = K.reshape(1, m, n)
        else:
            ks_ref[0:1] = W[0:1, :m] * 1e-9
            Ks_ref[0:1] = (W[:m, 1:1+n] * 1e-9).reshape(1, m, n)
        return Wn

    jax.lax.fori_loop(0, H, body, WT_ref[:, :], unroll=unroll)


def sweep(variant, unroll, AB, cx, cu, cxx, cuu, cux, WT):
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        partial(_kernel, variant, unroll),
        out_shape=(
            jax.ShapeDtypeStruct((H, M), jnp.float32),
            jax.ShapeDtypeStruct((H, M, N), jnp.float32),
        ),
        in_specs=[vmem] * 7,
        out_specs=(vmem, vmem),
    )(AB, cx, cu, cxx, cuu, cux, WT)


def bench(spec):
    variant, _, u = spec.partition("@")
    unroll = int(u) if u else 1
    rng = np.random.RandomState(0)
    AB = jnp.asarray(0.05 * rng.randn(H, N, N + M), jnp.float32)
    cx = jnp.asarray(rng.randn(H, N), jnp.float32)
    cu = jnp.asarray(rng.randn(H, M), jnp.float32)
    cxx = jnp.asarray(0.01 * rng.randn(H, N, N) + np.eye(N), jnp.float32)
    cuu = jnp.asarray(0.01 * rng.randn(H, M, M) + np.eye(M), jnp.float32)
    cux = jnp.asarray(0.01 * rng.randn(H, M, N), jnp.float32)
    WT = jnp.asarray(0.01 * rng.randn(N, 1 + N), jnp.float32)

    @jax.jit
    def chain(cx_in):
        def body(c, _):
            ks, Ks = sweep(variant, unroll, AB, c, cu, cxx, cuu, cux, WT)
            return c + 1e-9 * jnp.sum(ks), None

        out, _ = jax.lax.scan(body, cx_in, None, length=REPS)
        return out

    np.asarray(chain(cx))
    best = np.inf
    for rep in range(3):
        t0 = time.time()
        np.asarray(chain(cx + np.float32(1e-6 * (rep + 1))))
        best = min(best, time.time() - t0)
    print(f"{spec:10s} {best / REPS * 1e3:8.3f} ms/sweep")


if __name__ == "__main__":
    for v in (sys.argv[1:] or ["mem", "gemm", "trans", "gersh"]):
        bench(v)
