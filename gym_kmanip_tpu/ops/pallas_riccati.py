"""Pallas TPU kernel: the full iLQR Riccati backward sweep in ONE launch.

The serial backward pass is H tiny steps (a few (n+m)-sized matmuls and an
m x m SPD solve each, n<=53, m<=20) chained by the (Vx, Vxx) value
recursion. As a `lax.scan` of XLA ops it is launch/latency-bound: ~0.3 ms
per step on a v5e (~30 ms for H=100) against ~2 us of actual arithmetic.
This kernel keeps the entire problem resident in VMEM (~4 MB at torso
H=100) and runs the whole sweep inside one `fori_loop`: per-step matmuls
hit the MXU, the Quu Cholesky factorization + two-sided substitution are
trace-time-unrolled scalar rows (a column-vectorized rank-1 variant
exists and measured SLOWER — see riccati_sweep_pallas `impl`), and the
only HBM traffic is the initial operand load and the (ks, Ks) gain
write-back. This is the "fused Pallas Cholesky/Riccati sweep" the
BASELINE north star names.

Mosaic discipline: every value stays rank-2 ((n,1) columns, (1,1)
"scalars") — rank-1 vectors pick up implicit tiling dims that the TPU
layout pass rejects, and mat-vec contractions lower to unsupported
multi_reductions.

The math is identical to the serial scan in solvers/ilqr.py `backward`
(regularized Quu, symmetrized value Hessian); tests/test_mpc.py checks the
gains against it.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _mm(a, b):
    """Rank-2 matmul on the MXU in full f32.

    Precision.HIGHEST matters: the MXU's native path truncates f32 inputs
    to bf16, and the Riccati recursion amplifies that per-step truncation
    into divergence (NaN after ~20 steps measured at torso sizes); HIGHEST
    selects the multi-pass f32 algorithm.
    """
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _chol_solve_cols(Quu, RHS, m: int, lam=0.0):
    """Solve Quu X = RHS for SPD Quu (m, m), RHS (m, r): COLUMN-vectorized
    Cholesky with PIVOT DROPPING.

    Same algorithm as _chol_solve_rows expressed as m rank-1 Schur updates
    + 2m rank-1 substitution updates on whole (m,m)/(m,r) tiles — an ~8x
    shorter dependence chain than the row version's ~800 sequential
    (1,1)-scalar ops (right-looking vs left-looking Cholesky; f32 rounding
    differs only in summation order). Measured SLOWER on the v5e despite
    that (1.58 vs 1.16 ms/sweep at torso sizes — each rank-1 update pays
    tile-wide read-modify-write traffic that outweighs the chain
    shortening), so it is NOT the default; kept as the vectorized
    reference formulation and for re-evaluation on future chips.

    Robustness semantics preserved from the row version:
      * Jacobi equilibration to unit diagonal first — the ~1e5 scale
        spread between actuator classes (gripper cuu ~2e-3 vs arm B'VxxB
        ~1e2) squares into the condition number; scaling removes it
        before the f32 factorization sees it.
      * Quu = cuu + B'VxxB is SPD analytically, but near-uncontrollable
        directions push small eigenvalues below the f32 noise of the
        product; pivots of the equilibrated matrix below an absolute
        1e-5 floor are DROPPED: no Schur update, zero gain in that
        direction — a truncated pseudo-inverse instead of an exploding
        inverse.
    """
    dt = Quu.dtype
    eye = jnp.eye(m, dtype=dt)
    diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam  # (m, 1)
    dscale = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))  # (m, 1)
    # S = D (Quu + lam I) D: unit diagonal exactly (matches the row
    # version, which seeds every pivot recurrence at 1.0)
    S = dscale * Quu * dscale.T
    S = S - S * eye + eye
    floor = 1e-5
    # unit vectors / below-diagonal masks as in-kernel ops (Pallas rejects
    # captured numpy-array constants); j is static, so these fold at
    # compile time
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    # L / keepvec built by masked accumulation, NOT jnp.concatenate —
    # Mosaic rejects concatenating tiles whose sublane offsets differ on
    # the non-concat dim ("result/input offset mismatch"), which is
    # exactly what a list of (1,1)/(m,1) slices produces
    L = jnp.zeros((m, m), dt)
    keepvec = jnp.zeros((m, 1), dt)
    keeps = []
    for j in range(m):
        ej = eye[:, j : j + 1]
        below = (row_idx >= j).astype(dt)
        pivot = S[j : j + 1, j : j + 1]  # (1, 1)
        keep = pivot > floor
        d = jnp.sqrt(jnp.where(keep, pivot, 1.0))
        l = jnp.where(keep, (S[:, j : j + 1] * below) / d, 0.0)  # (m, 1)
        S = S - _mm(l, l.T)  # rank-1 Schur complement update
        L = L + jnp.where(keep, l, ej) * eye[j : j + 1, :]  # col j only
        keepvec = keepvec + jnp.where(keep, ej, 0.0)
        keeps.append(jnp.where(keep, jnp.ones((1, 1), dt), 0.0))

    # forward solve L y = D b: per column one rank-1 update. The update
    # direction (Lcol_j - e_j) both eliminates below-diagonal entries and
    # REPLACES row j with y_j itself (row j: y_j - (L_jj - 1) t = t).
    Y = RHS * dscale
    for j in range(m):
        ej = eye[:, j : j + 1]
        t = (Y[j : j + 1, :] / L[j : j + 1, j : j + 1]) * keeps[j]
        Y = Y - _mm(L[:, j : j + 1] - ej, t)
    # backward solve L^T z = y: same trick on L^T's columns (= L's rows)
    LT = L.T
    Z = Y
    for j in range(m - 1, -1, -1):
        ej = eye[:, j : j + 1]
        t = (Z[j : j + 1, :] / LT[j : j + 1, j : j + 1]) * keeps[j]
        Z = Z - _mm(LT[:, j : j + 1] - ej, t)
    # dropped directions: t was zeroed, so row j kept its (meaningless)
    # pre-substitution residual — mask it out, then undo the equilibration
    return dscale * (Z * keepvec)  # X = D z, (m, r)


def _chol_solve_rows(Quu, RHS, m: int, lam=0.0):
    """Row/scalar-unrolled variant of _chol_solve_cols (identical math and
    drop semantics; ~800 sequential (1,1)-scalar ops at m=20). Kept for
    A/B benchmarking (tools/exp_riccati_kernel.py) and as the reference
    formulation; the sweep kernel uses the column version."""
    dscale = [None] * m
    for j in range(m):
        dj = Quu[j : j + 1, j : j + 1] + lam  # implicit Quu + lam*I
        dscale[j] = 1.0 / jnp.sqrt(jnp.maximum(dj, 1e-30))
    floor = 1e-5
    L = [[None] * m for _ in range(m)]
    keep = [None] * m
    for j in range(m):
        s = jnp.ones_like(Quu[0:1, 0:1])
        for t in range(j):
            s = s - L[j][t] * L[j][t]
        keep[j] = s > floor
        L[j][j] = jnp.sqrt(jnp.where(keep[j], s, 1.0))
        inv_d = jnp.where(keep[j], 1.0 / L[j][j], 0.0)
        for i in range(j + 1, m):
            s = Quu[i : i + 1, j : j + 1] * (dscale[i] * dscale[j])
            for t in range(j):
                s = s - L[i][t] * L[j][t]
            L[i][j] = s * inv_d
    y = [None] * m
    for i in range(m):
        s = RHS[i : i + 1, :] * dscale[i]
        for t in range(i):
            s = s - L[i][t] * y[t]
        y[i] = jnp.where(keep[i], s / L[i][i], 0.0)
    z = [None] * m
    for i in range(m - 1, -1, -1):
        s = y[i]
        for t in range(i + 1, m):
            s = s - L[t][i] * z[t]
        z[i] = jnp.where(keep[i], s / L[i][i], 0.0)
    return jnp.concatenate([z[i] * dscale[i] for i in range(m)], axis=0)


_CHOL_IMPLS = {"cols": _chol_solve_cols, "rows": _chol_solve_rows}


def _sweep_kernel(
    H: int, n: int, m: int, reg: float, impl: str,
    A_ref, B_ref, cx_ref, cu_ref, cxx_ref, cuu_ref, cux_ref,
    VxT_ref, VxxT_ref, lam_ref, ks_ref, Ks_ref,
):
    chol_solve = _CHOL_IMPLS[impl]
    eye_u = jnp.eye(m, dtype=jnp.float32) * reg
    # rank-0 scalar from SMEM: keeping lam in a scalar register matters —
    # as a (1,1) VMEM tile it infects every lam-use with vector-lane ops
    # and cost the sweep +35% (1.16 -> 1.57 ms/sweep measured)
    lam_extra = lam_ref[0]

    def body(i, carry):
        Vx, Vxx = carry  # (n, 1), (n, n)
        t = H - 1 - i
        A = A_ref[pl.ds(t, 1)].reshape(n, n)
        B = B_ref[pl.ds(t, 1)].reshape(n, m)
        cx = cx_ref[pl.ds(t, 1)].reshape(1, n)
        cu = cu_ref[pl.ds(t, 1)].reshape(1, m)
        cxx = cxx_ref[pl.ds(t, 1)].reshape(n, n)
        cuu = cuu_ref[pl.ds(t, 1)].reshape(m, m)
        cux = cux_ref[pl.ds(t, 1)].reshape(m, n)

        VxxA = _mm(Vxx, A)  # (n, n)
        Qx = cx.T + _mm(A.T, Vx)  # (n, 1)
        Qu = cu.T + _mm(B.T, Vx)  # (m, 1)
        Qxx = cxx + _mm(A.T, VxxA)
        Quu = cuu + _mm(B.T, _mm(Vxx, B)) + eye_u
        Qux = cux + _mm(B.T, VxxA)  # (m, n)
        Quu = 0.5 * (Quu + Quu.T)
        # Adaptive Levenberg lift: Quu goes GENUINELY indefinite on
        # non-convex steps (measured eigenvalues down to -4 at torso
        # sizes — not f32 noise), where an unpivoted Cholesky explodes
        # and poisons the whole sweep. The classic iLQR remedy is to
        # raise lambda until Quu + lam I is PD; here the lift comes from
        # the Gershgorin bound (diag_j - sum_i|offdiag_ji|), which
        # GUARANTEES positive definiteness for the factorization, plus a
        # floor at the f32 noise scale of the B'VxxB product. The SAME
        # lifted matrix feeds the variational value update below, so the
        # recursion stays stationary w.r.t. the matrix the gains actually
        # solve; over-damped steps on indefinite stretches just lean
        # toward the gradient direction, which the caller's line search
        # handles.
        amax = jnp.max(jnp.abs(Quu))  # rank-0
        eye_m = jnp.eye(m, dtype=jnp.float32)
        diag_col = jnp.sum(Quu * eye_m, axis=1, keepdims=True)  # (m, 1)
        off_col = jnp.sum(jnp.abs(Quu), axis=1, keepdims=True) - jnp.abs(diag_col)
        gersh_min = jnp.min(diag_col - off_col)  # rank-0 lower eig bound
        # base lift (Gershgorin PD guarantee + f32-noise floor) plus the
        # ADAPTIVE multiplier threaded by the iLQR iteration loop (rises
        # x32 on each failed line search, decays x0.25 on success —
        # solvers/ilqr.iteration); lam stays a (1,1) tile
        lam = (
            1e-5 * amax
            + jnp.maximum(0.0, 1e-4 * amax - gersh_min)
            + lam_extra * amax
        )

        RHS = jnp.concatenate([Qu, Qux], axis=1)  # (m, 1+n)
        Kk = -chol_solve(Quu, RHS, m, lam)
        kff, K = Kk[:, 0:1], Kk[:, 1:]  # (m, 1), (m, n)

        # variational (expanded) value update with Quu_eff = Quu + lam I:
        # stationary at the computed gain, so first-order gain error does
        # not feed back into the recursion
        Quuk = _mm(Quu, kff) + lam * kff
        QuuK = _mm(Quu, K) + lam * K
        Vx_n = Qx + _mm(K.T, Quuk + Qu) + _mm(Qux.T, kff)
        Vxx_n = Qxx + _mm(K.T, QuuK) + _mm(K.T, Qux) + _mm(Qux.T, K)
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)

        ks_ref[pl.ds(t, 1)] = kff.T  # (1, m)
        Ks_ref[pl.ds(t, 1)] = K.reshape(1, m, n)
        return Vx_n, Vxx_n

    jax.lax.fori_loop(
        0, H, body, (VxT_ref[:, :], VxxT_ref[:, :]), unroll=False
    )


def riccati_sweep_pallas(
    A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, reg: float,
    interpret: bool = False, impl: str = "rows", lam_extra=None,
):
    """Full regularized LQR backward sweep. A: (H,n,n), B: (H,n,m), cost
    derivatives per step, terminal (Vx_T (n,), Vxx_T (n,n)). Returns
    (ks (H,m), Ks (H,m,n)). `interpret=True` runs the kernel through the
    pallas interpreter (CPU oracle for tests); `lam_extra` is the adaptive
    Levenberg multiplier (traced scalar; None/0 = base lift only); `impl`
    selects the in-kernel Cholesky formulation. A/B on the v5e
    (tools/exp_riccati_kernel.py, torso-sized H=100 n=40 m=20, 50 chained
    sweeps/dispatch): rows 1.16 ms vs cols 1.58 ms per sweep — the
    scalar-row chain wins despite its ~8x longer dependence chain, because
    Mosaic issues the (1,1) ops back to back while each rank-1 column
    update pays tile-wide read-modify-write traffic; "rows" is therefore
    the default."""
    H, n, _ = A.shape
    m = B.shape[2]
    if lam_extra is None:
        lam_extra = 0.0
    lam_arr = jnp.asarray(lam_extra, A.dtype).reshape(1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        partial(_sweep_kernel, H, n, m, float(reg), impl),
        out_shape=(
            jax.ShapeDtypeStruct((H, m), A.dtype),
            jax.ShapeDtypeStruct((H, m, n), A.dtype),
        ),
        in_specs=[vmem] * 9 + [smem],
        out_specs=(vmem, vmem),
        interpret=interpret,
    )(A, B, cx, cu, cxx, cuu, cux, Vx_T.reshape(n, 1), Vxx_T, lam_arr)
