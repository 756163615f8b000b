"""Pallas TPU kernel: the full iLQR Riccati backward sweep in ONE launch.

The serial backward pass is H tiny steps (a few (n+m)-sized matmuls and an
m x m SPD solve each, n<=53, m<=20) chained by the (Vx, Vxx) value
recursion. As a `lax.scan` of XLA ops it is launch/latency-bound: ~0.3 ms
per step on a v5e (~30 ms for H=100) against ~2 us of actual arithmetic.
This kernel keeps the entire problem resident in VMEM (~4 MB at torso
H=100) and runs the whole sweep inside one `fori_loop`. The r5 default
step (`step_impl="gemm5"`) carries the value state jointly as
W = [Vx | Vxx] and takes [A B] as one operand, collapsing ~13 MXU calls
to 5; the default solve (`impl="hybrid"`) factors Quu in m/5 BLOCK
columns (one (m,1) vector-op chain per column + one MXU Schur GEMM per
block) and substitutes with scalar rows — the measured-best mix of five
formulations (rows / cols / blocked / hybrid / hybrid2, all kept for
A/B; rank-1 tile updates lose to scalar chains on this target, and a
standalone kernel microbench carries a fixed ~0.5 ms/launch that only
in-solve timing sees through: tools/exp_chol_blocked.py,
exp_sweep_floor.py). The only HBM traffic is the initial operand load
and the gain write-back. This is the "fused Pallas Cholesky/Riccati
sweep" the BASELINE north star names.

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


import os

# MXU precision for every in-kernel matmul. The MXU's native path
# truncates f32 inputs to bf16, and the Riccati recursion amplifies that
# per-step truncation into divergence (NaN after ~20 steps measured at
# torso sizes with DEFAULT). HIGHEST (6-pass f32 emulation) is safe;
# HIGH (3-pass bf16x3, ~2^-21 relative) measured equally stable on the
# recursion (gain parity tests + fused-solve traces) at roughly half the
# per-GEMM latency, so it is the default; override with
# KMANIP_RICCATI_PRECISION=highest|high.
_PREC_MODE = os.environ.get("KMANIP_RICCATI_PRECISION", "high").lower()


def _dot3(a, b, dims):
    """bf16x3 matmul: Mosaic rejects Precision.HIGH, so emulate it —
    split each f32 operand into hi+lo bf16 halves and take the three
    dominant cross products in three NATIVE MXU passes (vs HIGHEST's six).
    Error ~2^-21 relative, ~30x below bf16, ~8x above true f32."""
    f32, bf16 = jnp.float32, jnp.bfloat16
    a_hi = a.astype(bf16)
    b_hi = b.astype(bf16)
    a_lo = (a - a_hi.astype(f32)).astype(bf16)
    b_lo = (b - b_hi.astype(f32)).astype(bf16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, (dims, ((), ())), preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT,
        )

    return d(a_hi, b_hi) + (d(a_hi, b_lo) + d(a_lo, b_hi))


def _mm(a, b):
    """Rank-2 matmul on the MXU (bf16x3 by default; see _PREC_MODE)."""
    if _PREC_MODE == "high":
        return _dot3(a, b, ((1,), (0,)))
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


def _chol_solve_blocked(Quu, RHS, m: int, lam=0.0, b: int = 5):
    """Blocked right-looking variant of _chol_solve_cols (identical math,
    equilibration and pivot-drop semantics): the factorization runs in
    m/b block-columns — within a block, each column is ONE (m,1) vector op
    chain (<=b-1 rank-1-within-block corrections), and the cross-block
    Schur complement is ONE MXU GEMM per block instead of m full-tile
    rank-1 updates. The substitutions are likewise blocked: scalar-row
    solves inside the b x b diagonal block, one GEMM panel update per
    block. Shortens the sequential op chain ~5x vs the row version's ~800
    (1,1)-scalar ops at m=20 while paying only 3(m/b) tile-wide GEMMs —
    the balance the rows-vs-cols A/B showed each pure formulation misses
    (tools/exp_riccati_kernel.py / exp_chol_blocked.py)."""
    dt = Quu.dtype
    eye = jnp.eye(m, dtype=dt)
    diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam  # (m, 1)
    dscale = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    S = dscale * Quu * dscale.T
    S = S - S * eye + eye
    floor = 1e-5
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    L = jnp.zeros((m, m), dt)
    keepvec = jnp.zeros((m, 1), dt)
    keeps = [None] * m
    Ldiag = [None] * m  # (1,1) pivots, kept as python refs for the solves
    for j0 in range(0, m, b):
        jb = min(j0 + b, m)
        cols = {}
        for j in range(j0, jb):
            # left-looking within the block; cross-block corrections are
            # already in S via the previous blocks' Schur GEMMs
            s_col = S[:, j : j + 1]  # (m, 1)
            for t in range(j0, j):
                s_col = s_col - cols[t] * cols[t][j : j + 1, :]
            pivot = s_col[j : j + 1, :]  # (1, 1)
            keep = pivot > floor
            keeps[j] = jnp.where(keep, jnp.ones((1, 1), dt), 0.0)
            d = jnp.sqrt(jnp.where(keep, pivot, 1.0))
            Ldiag[j] = d
            below = (row_idx >= j).astype(dt)
            lcol = jnp.where(keep, (s_col * below) / d, 0.0)  # (m, 1)
            cols[j] = lcol
            ej = eye[:, j : j + 1]
            L = L + jnp.where(keep, lcol, ej) * eye[j : j + 1, :]
            keepvec = keepvec + jnp.where(keep, ej, 0.0)
        if jb < m:
            # ONE Schur GEMM for the whole trailing submatrix. Dropped
            # columns are zero in cols[] already; rows above each column's
            # diagonal are zero via the below-mask, so P P^T only touches
            # the trailing block plus rows/cols already consumed (whose
            # later reads are masked anyway).
            P = L[:, j0:jb] * keepvec[j0:jb, :].T  # (m, b)
            S = S - _mm(P, P.T)

    # forward solve L Y = D RHS, blocked: (1,r) scalar-row chain inside
    # the diagonal block, one GEMM panel update for all later rows per
    # block; per-block results assembled into tiles by tiny (b,1)@(1,r)
    # accumulations (Mosaic rejects concatenating offset-mismatched rows)
    r = RHS.shape[1]
    col_idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
    yrows = [None] * m
    Ycur = RHS * dscale  # (m, r) running right-hand side
    Yfull = jnp.zeros((m, r), dt)
    for j0 in range(0, m, b):
        jb = min(j0 + b, m)
        eyeb = jnp.eye(jb - j0, dtype=dt)
        for j in range(j0, jb):
            s = Ycur[j : j + 1, :]
            for t in range(j0, j):
                s = s - L[j : j + 1, t : t + 1] * yrows[t]
            yrows[j] = (s / Ldiag[j]) * keeps[j]  # (1, r)
        Yblk = jnp.zeros((jb - j0, r), dt)
        for j in range(j0, jb):
            Yblk = Yblk + _mm(eyeb[:, j - j0 : j - j0 + 1], yrows[j])
        Yfull = Yfull + _mm(eye[:, j0:jb], Yblk)
        if jb < m:
            panel = L[:, j0:jb] * (row_idx >= jb).astype(dt)  # rows > block
            Ycur = Ycur - _mm(panel, Yblk)

    # backward solve L^T z = y: same blocking from the bottom; the panel
    # is L's block-row left of the diagonal, transposed
    zrows = [None] * m
    Zcur = Yfull
    Zfull = jnp.zeros((m, r), dt)
    for j0 in range(((m - 1) // b) * b, -1, -b):
        jb = min(j0 + b, m)
        eyeb = jnp.eye(jb - j0, dtype=dt)
        for j in range(jb - 1, j0 - 1, -1):
            s = Zcur[j : j + 1, :]
            for t in range(j + 1, jb):
                s = s - L[t : t + 1, j : j + 1] * zrows[t]
            zrows[j] = (s / Ldiag[j]) * keeps[j]
        Zblk = jnp.zeros((jb - j0, r), dt)
        for j in range(j0, jb):
            Zblk = Zblk + _mm(eyeb[:, j - j0 : j - j0 + 1], zrows[j])
        Zfull = Zfull + _mm(eye[:, j0:jb], Zblk)
        if j0 > 0:
            panel = (L[j0:jb, :] * (col_idx < j0).astype(dt)).T  # (m, b)
            Zcur = Zcur - _mm(panel, Zblk)

    return dscale * (Zfull * keepvec)


def _chol_solve_hybrid(Quu, RHS, m: int, lam=0.0, b: int = 5):
    """Blocked factorization + row-style substitutions: the best measured
    mix (tools/exp_chol_blocked.py). The factor phase is where the rows
    impl burns ~m^3/6 sequential (1,1) ops — here it runs as m/b block
    columns of (m,1) vector ops plus one MXU Schur GEMM per block; the
    substitution phase (where rows' (1,r) ops are already cheap) stays
    scalar-row, reading the factor back via (1,1)/(1,r) tile slices.
    Identical math, equilibration, and pivot-drop semantics to
    _chol_solve_rows/_cols."""
    dt = Quu.dtype
    eye = jnp.eye(m, dtype=dt)
    diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam  # (m, 1)
    dscale = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    S = dscale * Quu * dscale.T
    S = S - S * eye + eye
    floor = 1e-5
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    L = jnp.zeros((m, m), dt)
    keepvec = jnp.zeros((m, 1), dt)
    keeps = [None] * m
    Ldiag = [None] * m
    for j0 in range(0, m, b):
        jb = min(j0 + b, m)
        cols = {}
        for j in range(j0, jb):
            s_col = S[:, j : j + 1]  # (m, 1)
            for t in range(j0, j):
                s_col = s_col - cols[t] * cols[t][j : j + 1, :]
            pivot = s_col[j : j + 1, :]  # (1, 1)
            keep = pivot > floor
            keeps[j] = jnp.where(keep, jnp.ones((1, 1), dt), 0.0)
            d = jnp.sqrt(jnp.where(keep, pivot, 1.0))
            Ldiag[j] = d
            below = (row_idx >= j).astype(dt)
            lcol = jnp.where(keep, (s_col * below) / d, 0.0)  # (m, 1)
            cols[j] = lcol
            ej = eye[:, j : j + 1]
            L = L + jnp.where(keep, lcol, ej) * eye[j : j + 1, :]
            keepvec = keepvec + jnp.where(keep, ej, 0.0)
        if jb < m:
            P = L[:, j0:jb] * keepvec[j0:jb, :].T  # (m, b)
            S = S - _mm(P, P.T)

    # row-style substitutions against the assembled L tile
    y = [None] * m
    for i in range(m):
        s = RHS[i : i + 1, :] * dscale[i : i + 1, :]
        for t in range(i):
            s = s - L[i : i + 1, t : t + 1] * y[t]
        y[i] = (s / Ldiag[i]) * keeps[i]
    z = [None] * m
    for i in range(m - 1, -1, -1):
        s = y[i]
        for t in range(i + 1, m):
            s = s - L[t : t + 1, i : i + 1] * z[t]
        z[i] = (s / Ldiag[i]) * keeps[i]
    return jnp.concatenate(
        [z[i] * dscale[i : i + 1, :] for i in range(m)], axis=0
    )


def _chol_solve_hybrid2(Quu, RHS, m: int, lam=0.0, b: int = 5):
    """Blocked factorization + RANK-1 column substitutions: the winning
    mix measured IN-SOLVE (the standalone kernel harness carries a fixed
    ~0.5 ms/launch and cannot rank these). The factor runs as m/b block
    columns (one (m,1) vector-op chain per column + one MXU Schur GEMM
    per block); each substitution step is ONE rank-1 tile update that
    retires a pivot and corrects every remaining row at once — critical
    path ~2 ops per pivot versus the row version's ~m ops per row.
    Identical math/equilibration/drop semantics to _chol_solve_rows."""
    dt = Quu.dtype
    eye = jnp.eye(m, dtype=dt)
    diag = jnp.sum(Quu * eye, axis=1, keepdims=True) + lam  # (m, 1)
    dscale = 1.0 / jnp.sqrt(jnp.maximum(diag, 1e-30))
    S = dscale * Quu * dscale.T
    S = S - S * eye + eye
    floor = 1e-5
    row_idx = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    L = jnp.zeros((m, m), dt)
    keepvec = jnp.zeros((m, 1), dt)
    keeps = [None] * m
    for j0 in range(0, m, b):
        jb = min(j0 + b, m)
        cols = {}
        for j in range(j0, jb):
            s_col = S[:, j : j + 1]  # (m, 1)
            for t in range(j0, j):
                s_col = s_col - cols[t] * cols[t][j : j + 1, :]
            pivot = s_col[j : j + 1, :]  # (1, 1)
            keep = pivot > floor
            keeps[j] = jnp.where(keep, jnp.ones((1, 1), dt), 0.0)
            d = jnp.sqrt(jnp.where(keep, pivot, 1.0))
            below = (row_idx >= j).astype(dt)
            lcol = jnp.where(keep, (s_col * below) / d, 0.0)  # (m, 1)
            cols[j] = lcol
            ej = eye[:, j : j + 1]
            L = L + jnp.where(keep, lcol, ej) * eye[j : j + 1, :]
            keepvec = keepvec + jnp.where(keep, ej, 0.0)
        if jb < m:
            P = L[:, j0:jb] * keepvec[j0:jb, :].T  # (m, b)
            S = S - _mm(P, P.T)

    # rank-1 substitutions (see _chol_solve_cols for the e_j trick: one
    # update both eliminates below-diagonal entries and replaces row j
    # with y_j itself)
    Y = RHS * dscale
    for j in range(m):
        ej = eye[:, j : j + 1]
        t = (Y[j : j + 1, :] / L[j : j + 1, j : j + 1]) * keeps[j]
        Y = Y - _mm(L[:, j : j + 1] - ej, t)
    LT = L.T
    Z = Y
    for j in range(m - 1, -1, -1):
        ej = eye[:, j : j + 1]
        t = (Z[j : j + 1, :] / LT[j : j + 1, j : j + 1]) * keeps[j]
        Z = Z - _mm(LT[:, j : j + 1] - ej, t)
    return dscale * (Z * keepvec)


_CHOL_IMPLS = {
    "cols": _chol_solve_cols,
    "rows": _chol_solve_rows,
    "blocked": _chol_solve_blocked,
    "hybrid": _chol_solve_hybrid,
    "hybrid2": _chol_solve_hybrid2,
}


def _sweep_kernel_gemm5(
    H: int, n: int, m: int, reg: float, impl: str,
    AB_ref, cx_ref, cu_ref, cxx_ref, cuu_ref, cux_ref,
    WT_ref, lam_ref, ks_ref, Ks_ref,
):
    """Riccati step restructured to FIVE MXU GEMMs (from ~13).

    Carries the value state jointly as W = [Vx | Vxx] (n, 1+n) and takes
    the dynamics as AB = [A B] (n, n+m), so one GEMM pair produces every
    Q-quantity:

        GW  = AB' W            -> [A'Vx A'Vxx; B'Vx B'Vxx]
        GWG = GW[:,1:] AB      -> [A'VxxA A'VxxB; B'VxxA B'VxxB]

    and the variational value update likewise collapses: with the
    augmented gain Kk = -Quu_eff^{-1} [Qu Qux] (exactly what the solve
    returns) and C = [Qu Qux],

        M = Kk'(Quu_eff Kk + C) + C'Kk
        [Vx_n | Vxx_n] = [Qx | Qxx] + M[1:, :]

    (three GEMMs; block algebra in the module docstring of the legacy
    kernel — identical math, different association order in f32). The
    remaining per-step serial cost is the Quu solve, handled by `impl`.
    """
    chol_solve = _CHOL_IMPLS[impl]
    lam_extra = lam_ref[0]

    def body(i, W):
        t = H - 1 - i
        AB = AB_ref[pl.ds(t, 1)].reshape(n, n + m)
        cx = cx_ref[pl.ds(t, 1)].reshape(1, n)
        cu = cu_ref[pl.ds(t, 1)].reshape(1, m)
        cxx = cxx_ref[pl.ds(t, 1)].reshape(n, n)
        cuu = cuu_ref[pl.ds(t, 1)].reshape(m, m)
        cux = cux_ref[pl.ds(t, 1)].reshape(m, n)

        GW = _mm(AB.T, W)  # (n+m, 1+n)
        GWG = _mm(GW[:, 1:], AB)  # (n+m, n+m)
        Qx = cx.T + GW[:n, 0:1]  # (n, 1)
        Qu = cu.T + GW[n:, 0:1]  # (m, 1)
        Qxx = cxx + GWG[:n, :n]
        Quu = cuu + GWG[n:, n:] + jnp.eye(m, dtype=jnp.float32) * reg
        Qux = cux + GWG[n:, :n]
        Quu = 0.5 * (Quu + Quu.T)
        # Gershgorin-adaptive Levenberg lift (see legacy kernel)
        amax = jnp.max(jnp.abs(Quu))
        eye_m = jnp.eye(m, dtype=jnp.float32)
        diag_col = jnp.sum(Quu * eye_m, axis=1, keepdims=True)
        off_col = jnp.sum(jnp.abs(Quu), axis=1, keepdims=True) - jnp.abs(diag_col)
        gersh_min = jnp.min(diag_col - off_col)
        lam = (
            1e-5 * amax
            + jnp.maximum(0.0, 1e-4 * amax - gersh_min)
            + lam_extra * amax
        )

        C = jnp.concatenate([Qu, Qux], axis=1)  # (m, 1+n)
        Kk = -chol_solve(Quu, C, m, lam)
        U1 = _mm(Quu, Kk) + lam * Kk  # Quu_eff @ Kk
        M = _mm(Kk.T, U1 + C) + _mm(C.T, Kk)  # (1+n, 1+n)
        Wn = jnp.concatenate([Qx, Qxx], axis=1) + M[1:, :]  # (n, 1+n)
        Vxx_n = 0.5 * (Wn[:, 1:] + Wn[:, 1:].T)
        Wn = jnp.concatenate([Wn[:, 0:1], Vxx_n], axis=1)

        ks_ref[pl.ds(t, 1)] = Kk[:, 0:1].T  # (1, m)
        Ks_ref[pl.ds(t, 1)] = Kk[:, 1:].reshape(1, m, n)
        return Wn

    jax.lax.fori_loop(0, H, body, WT_ref[:, :], unroll=False)


def _mm_nt(a, b):
    """a @ b.T on the MXU without materializing the transpose."""
    if _PREC_MODE == "high":
        return _dot3(a, b, ((1,), (1,)))
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _mm_tn(a, b):
    """a.T @ b on the MXU without materializing the transpose."""
    if _PREC_MODE == "high":
        return _dot3(a, b, ((0,), (0,)))
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _sweep_kernel_packed(
    H: int, n: int, m: int, reg: float, impl: str, rows: int, sr: int,
    blk_ref, WT_ref, lam_ref, out_ref,
):
    """Riccati sweep with ONE full-tile load and ONE full-tile store per
    step. The gemm5 restructure alone moved nothing (tools/
    exp_chol_blocked.py): the per-step floor is dominated by the 7 partial
    -tile VMEM loads + 2 single-sublane read-modify-write stores, not by
    MXU count. Here the caller packs each timestep into one (rows, 128)
    tile —

        blk[:n+m, :n+m] = [[cxx, cux'], [cux, cuu]]   (cost Hessian, z=[x;u])
        blk[:n+m, z1]   = [cx; cu]     (z1 = n+m lanes... column n+m? see wrapper)
        blk[pad:, :n]   = [A B]'       (ABt, at the first 8-aligned row
                                        past the cost block)

    — and the gains come back as one zero-padded (sr, 128) tile per step
    (Kk = -Quu_eff^{-1} [Qux | Quu | Qu]: K in cols :n, kff in col n+m;
    the -Quu^{-1}Quu middle block is free junk that keeps every slice
    8-lane-aligned and the store full-tile). Value state is carried as
    W = [Vx | Vxx] (n, 1+n); math identical to the legacy kernel."""
    chol_solve = _CHOL_IMPLS[impl]
    lam_extra = lam_ref[0]
    z = n + m
    abt0 = ((z + 7) // 8) * 8  # ABt block start: 8-aligned past cost block

    def body(i, W):
        t = H - 1 - i
        blk = blk_ref[pl.ds(t, 1)].reshape(rows, 128)
        ABt = blk[abt0 : abt0 + z, :n]  # (z, n) = [A B]'
        # GW = [A'Vx A'Vxx; B'Vx B'Vxx]  (z, 1+n)
        GW = _mm(ABt, W)
        # GWG = [A'VxxA A'VxxB; B'VxxA B'VxxB]  (z, z)
        GWG = _mm_nt(GW[:, 1:], ABt)
        # Qfull = [Qzz | qz] + [GWG | GW_vx]  (z, z+1), all in one add
        addend = jnp.concatenate(
            [GWG, GW[:, 0:1], jnp.zeros((z, 128 - z - 1), jnp.float32)],
            axis=1,
        )
        Qfull = blk[:z, :] + addend  # cols z+1.. are junk zeros + zeros
        Quu = Qfull[n:z, n:z] + jnp.eye(m, dtype=jnp.float32) * reg
        Quu = 0.5 * (Quu + Quu.T)
        amax = jnp.max(jnp.abs(Quu))
        eye_m = jnp.eye(m, dtype=jnp.float32)
        diag_col = jnp.sum(Quu * eye_m, axis=1, keepdims=True)
        off_col = jnp.sum(jnp.abs(Quu), axis=1, keepdims=True) - jnp.abs(diag_col)
        gersh_min = jnp.min(diag_col - off_col)
        lam = (
            1e-5 * amax
            + jnp.maximum(0.0, 1e-4 * amax - gersh_min)
            + lam_extra * amax
        )
        # RHS = the whole u-row block [Qux | Quu+.. | Qu | 0pad] (m, 128):
        # solving against all 128 lanes costs the same one-tile row ops,
        # keeps kff/K extraction aligned, and the store full-tile. The
        # middle Quu-lanes of the result are junk (-I-ish), never read.
        RHS = Qfull[n:z, :]
        Kk = -chol_solve(Quu, RHS, m, lam)
        U1 = _mm(Quu, Kk) + lam * Kk  # (m, 128)
        M = _mm_tn(Kk, U1 + RHS) + _mm_tn(RHS, Kk)  # (128, 128)
        Vx_n = Qfull[:n, z : z + 1] + M[:n, z : z + 1]
        Vxx_n = Qfull[:n, :n] + M[:n, :n]
        Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
        Wn = jnp.concatenate([Vx_n, Vxx_n], axis=1)
        out_ref[pl.ds(t, 1)] = jnp.concatenate(
            [Kk, jnp.zeros((sr - m, 128), jnp.float32)], axis=0
        ).reshape(1, sr, 128)
        return Wn

    jax.lax.fori_loop(0, H, body, WT_ref[:, :], unroll=False)


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
    interpret: bool = False, impl: str = None, lam_extra=None,
    step_impl: str = "gemm5",
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
    if impl is None:
        impl = os.environ.get("KMANIP_RICCATI_IMPL", "hybrid")
    if lam_extra is None:
        lam_extra = 0.0
    lam_arr = jnp.asarray(lam_extra, A.dtype).reshape(1)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if step_impl == "packed":
        z = n + m
        abt0 = ((z + 7) // 8) * 8
        rows = abt0 + abt0  # cost block rows + ABt rows, both 8-aligned
        sr = ((m + 7) // 8) * 8
        dt = A.dtype
        # one (rows, 128) tile per step; XLA fuses this packing into the
        # operands' producers, and total HBM traffic is within ~1.4x of
        # the separate-tensor layout
        blk = jnp.zeros((H, rows, 128), dt)
        blk = blk.at[:, :n, :n].set(cxx)
        blk = blk.at[:, :n, n:z].set(jnp.swapaxes(cux, 1, 2))
        blk = blk.at[:, n:z, :n].set(cux)
        blk = blk.at[:, n:z, n:z].set(cuu)
        blk = blk.at[:, :n, z].set(cx)
        blk = blk.at[:, n:z, z].set(cu)
        blk = blk.at[:, abt0 : abt0 + n, :n].set(jnp.swapaxes(A, 1, 2))
        blk = blk.at[:, abt0 + n : abt0 + z, :n].set(jnp.swapaxes(B, 1, 2))
        WT = jnp.concatenate([Vx_T.reshape(n, 1), Vxx_T], axis=1)
        out = pl.pallas_call(
            partial(
                _sweep_kernel_packed, H, n, m, float(reg), impl, rows, sr
            ),
            out_shape=jax.ShapeDtypeStruct((H, sr, 128), dt),
            in_specs=[vmem, vmem, smem],
            out_specs=vmem,
            interpret=interpret,
        )(blk, WT, lam_arr)
        return out[:, :m, z], out[:, :m, :n]
    if step_impl == "gemm5":
        AB = jnp.concatenate([A, B], axis=2)  # (H, n, n+m) — fused by XLA
        WT = jnp.concatenate([Vx_T.reshape(n, 1), Vxx_T], axis=1)
        return pl.pallas_call(
            partial(_sweep_kernel_gemm5, H, n, m, float(reg), impl),
            out_shape=(
                jax.ShapeDtypeStruct((H, m), A.dtype),
                jax.ShapeDtypeStruct((H, m, n), A.dtype),
            ),
            in_specs=[vmem] * 7 + [smem],
            out_specs=(vmem, vmem),
            interpret=interpret,
        )(AB, cx, cu, cxx, cuu, cux, WT, lam_arr)
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
