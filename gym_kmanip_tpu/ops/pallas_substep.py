"""Pallas TPU kernel: the ENTIRE physics substep as one fused program.

Composes the validated row cores -- FK+RNEA (_rnea_rows), contact model
(_contact_rows) -- with in-kernel fingertip kinematics, actuator/friction/
limit torques, COM-Jacobian mass-matrix assembly, unrolled Cholesky solve,
and semi-implicit integration (robot + cube free body with safe quaternion
update). One kernel launch per substep replaces the ~40 fused-XLA kernels
that remained after the per-stage kernels, eliminating the last of the
launch-bound overhead in MPC rollouts.

Dispatched through a custom_vmap seam (dynamics.engine.substep fast path);
mirrors the jnp substep op-for-op and is pinned to it by interpret-mode
tests (tests/test_pallas.py).
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models.spec import HINGE, RobotModel
from gym_kmanip_tpu.ops.pallas_contacts import _contact_rows
from gym_kmanip_tpu.ops.pallas_dynamics import (
    _add,
    _cross,
    _dot,
    _qmul,
    _qrot,
    _rnea_rows,
    _scale,
    _sub,
)

_CUBE_INV_MASS = 1.0 / k.CUBE_MASS
_CUBE_INV_INERTIA = 1.0 / k.CUBE_DIAG_INERTIA


def _chol_pattern(n, nz):
    """Symbolic Cholesky: nz[i][j] (i >= j) = structural nonzeros of M;
    returns the factor pattern with fill-in (single left-to-right pass is
    exact: column kk's pattern is final before column j > kk uses it)."""
    pat = [[bool(nz[i][j]) for j in range(n)] for i in range(n)]
    for j in range(n):
        for i in range(j + 1, n):
            if pat[i][j]:
                continue
            for kk in range(j):
                if pat[i][kk] and pat[j][kk]:
                    pat[i][j] = True
                    break
    return pat


def _chol_factor_rows(n, M, pat=None):
    """Unrolled Cholesky factor on row-matrices: M list-of-lists (lower
    half used). Returns L rows, reusable for several substitutions.

    `pat` (from _chol_pattern) skips structurally-zero entries: for the
    tree-structured mass matrix the dof couple only within root-connected
    subtrees (torso: 2+9+9 block-diagonal), so the dense n^3/6 op chain
    shrinks ~5x AND the independent blocks factor in instruction-level
    parallel. BIT-EXACT vs the dense factor — every skipped term is an
    exact 0*x against an exact-zero M entry."""
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = M[j][j]
        for kk in range(j):
            if pat is not None and not pat[j][kk]:
                continue
            s = s - L[j][kk] * L[j][kk]
        L[j][j] = jnp.sqrt(s)
        inv_d = 1.0 / L[j][j]
        for i in range(j + 1, n):
            if pat is not None and not pat[i][j]:
                continue
            s = M[i][j] if i >= j else M[j][i]
            for kk in range(j):
                if pat is not None and not (pat[i][kk] and pat[j][kk]):
                    continue
                s = s - L[i][kk] * L[j][kk]
            L[i][j] = s * inv_d
    return L


def _chol_substitute_rows(n, L, b, pat=None):
    """Solve L L^T x = b (rows) given a factor from _chol_factor_rows."""
    y = [None] * n
    for i in range(n):
        s = b[i]
        for kk in range(i):
            if pat is not None and not pat[i][kk]:
                continue
            s = s - L[i][kk] * y[kk]
        y[i] = s / L[i][i]
    for i in range(n - 1, -1, -1):
        s = y[i]
        for kk in range(i + 1, n):
            if pat is not None and not pat[kk][i]:
                continue
            s = s - L[kk][i] * y[kk]
        y[i] = s / L[i][i]
    return y


def _chol_rows(n, M, b, pat=None):
    """Unrolled Cholesky solve on row-matrices (factor + substitute)."""
    return _chol_substitute_rows(n, _chol_factor_rows(n, M, pat), b, pat)


def _substep_core(
    model: RobotModel,
    dt: float,
    contact: bool,
    implicit_actuation: bool,
    q, v, ctrl, cube,
):
    """The physics substep as a PURE function on (1, K) row values.

    q/v/ctrl: lists of rows; cube: dict(pos/quat/lv/av of row tuples).
    Returns (q_out, v_out, cube_out, touch, x, qq): new state rows, the
    per-tip touch rows, and the PRE-step body frames (the aux contract
    the jnp substep exposes). Shared by the one-substep kernel below and
    the fused rollout+cost megakernel (one launch per whole horizon)."""
    nq, nu = model.nq, model.nu
    T = len(model.fingertips)
    kp = np.asarray(model.actuator_kp, dtype=np.float32)
    frange = np.asarray(model.force_range, dtype=np.float32)
    fl = np.asarray(model.jnt_frictionloss, dtype=np.float32)
    lo = np.asarray(model.jnt_range[:, 0], dtype=np.float32)
    hi = np.asarray(model.jnt_range[:, 1], dtype=np.float32)
    mass = np.asarray(model.body_mass, dtype=np.float32)
    I_diag = np.asarray(model.body_inertia, dtype=np.float32)
    com_l = np.asarray(model.body_com, dtype=np.float32)
    anc = np.asarray(model.ancestors)  # (nq, nq) bool

    # ---- forward dynamics terms ----
    rn = _rnea_rows(model, -9.81, q, v)
    x, qq, axis, w, vb = rn["x"], rn["qq"], rn["axis"], rn["w"], rn["v"]
    bias = rn["bias"]
    zero = rn["zero"]

    # fingertip kinematics from body frames
    tip_pos, tip_vel = [], []
    for t in model.fingertips:
        par = t.parent
        off = tuple(zero + float(c) for c in t.pos)
        p = _add(x[par], _qrot(qq[par], off))
        vt = _add(vb[par], _cross(w[par], _sub(p, x[par])))
        tip_pos.append(p)
        tip_vel.append(vt)

    # ---- contacts ----
    if contact and T > 0:
        force_c, torque_c, tip_forces, touch, _ttab = _contact_rows(
            model, tip_pos, tip_vel, cube
        )
    else:
        force_c = (zero, zero, zero)
        torque_c = (zero, zero, zero)
        tip_forces = [(zero, zero, zero)] * T
        touch = [zero > 1.0] * T

    # ---- joint torques ----
    tau = []
    for i in range(nq):
        t_i = zero
        if i < nu and kp[i] != 0.0:
            raw = float(kp[i]) * (ctrl[i] - q[i])
            if np.isfinite(frange[i, 0]):
                raw = jnp.clip(raw, float(frange[i, 0]), float(frange[i, 1]))
            t_i = t_i + raw
        # frictionloss applied post-solve as dry friction (see integrate)
        t_i = t_i - k.JOINT_DAMPING * v[i]
        t_i = t_i - bias[i]
        if implicit_actuation and i < nu:
            t_i = t_i - dt * float(kp[i]) * v[i]
        tau.append(t_i)

    # contact reaction torques: tau_j += sum_t jv_{t,j} . f_t
    for ti, t in enumerate(model.fingertips):
        par = t.parent
        f = tip_forces[ti]
        for j in range(nq):
            if not anc[par, j]:
                continue
            if int(model.jnt_type[j]) == HINGE:
                jv = _cross(axis[j], _sub(tip_pos[ti], x[j]))
            else:
                jv = axis[j]
            tau[j] = tau[j] + _dot(jv, f)

    # ---- mass matrix (COM-Jacobian contraction) ----
    com_w = []
    Iw_ax = [dict() for _ in range(nq)]  # per body: Iw_i @ axis_j rows
    for i in range(nq):
        cl = tuple(zero + float(c) for c in com_l[i])
        com_w.append(_add(x[i], _qrot(qq[i], cl)))
    R_list = rn["Rs"]

    def Iw_mul(i, y):
        R = R_list[i]
        rty = [
            R[0][0] * y[0] + R[1][0] * y[1] + R[2][0] * y[2],
            R[0][1] * y[0] + R[1][1] * y[1] + R[2][1] * y[2],
            R[0][2] * y[0] + R[1][2] * y[1] + R[2][2] * y[2],
        ]
        sy = [rty[j] * float(I_diag[i][j]) for j in range(3)]
        return (
            R[0][0] * sy[0] + R[0][1] * sy[1] + R[0][2] * sy[2],
            R[1][0] * sy[0] + R[1][1] * sy[1] + R[1][2] * sy[2],
            R[2][0] * sy[0] + R[2][1] * sy[1] + R[2][2] * sy[2],
        )

    jv_rows = [dict() for _ in range(nq)]  # jv_rows[i][j]
    for i in range(nq):
        for j in range(nq):
            if not anc[i, j]:
                continue
            if int(model.jnt_type[j]) == HINGE:
                jv_rows[i][j] = _cross(axis[j], _sub(com_w[i], x[j]))
                Iw_ax[i][j] = Iw_mul(i, axis[j])
            else:
                jv_rows[i][j] = axis[j]

    M = [[None] * nq for _ in range(nq)]
    for j in range(nq):
        for kk in range(j + 1):
            s = zero
            for i in range(nq):
                if not (anc[i, j] and anc[i, kk]):
                    continue
                s = s + float(mass[i]) * _dot(jv_rows[i][j], jv_rows[i][kk])
                if (
                    int(model.jnt_type[j]) == HINGE
                    and int(model.jnt_type[kk]) == HINGE
                ):
                    s = s + _dot(axis[j], Iw_ax[i][kk])
            M[j][kk] = s
    for i in range(nq):
        extra = float(model.armature[i]) + dt * k.JOINT_DAMPING
        if implicit_actuation and i < nu:
            extra += dt * dt * float(kp[i])
        M[i][i] = M[i][i] + extra

    # ---- solve + integrate robot ----
    # dof i,j couple in M only when they share a descendant body (the
    # M[j][kk] assembly above produces exact zeros elsewhere); the
    # symbolic pattern lets the Cholesky skip those ops bit-exactly
    coupled = (anc.astype(np.int32).T @ anc.astype(np.int32)) > 0
    pat = _chol_pattern(nq, coupled)
    Mdiag = [M[i][i] for i in range(nq)]
    Lrows = _chol_factor_rows(nq, M, pat)
    qacc0 = _chol_substitute_rows(nq, Lrows, tau, pat)
    # limits + frictionloss as force-space dual Jacobi sweeps (mirrors
    # engine.constraint_qacc: the forces propagate through the full M^-1,
    # factorization reused per sweep)
    d_imp = k.LIMIT_IMPEDANCE
    f_fric = [zero] * nq
    f_lo = [zero] * nq
    f_hi = [zero] * nq
    qacc = qacc0
    for _ in range(k.CONSTRAINT_ITERS):
        f_tot = []
        for i in range(nq):
            if fl[i] != 0.0:
                # regularized dry friction (MuJoCo solreffriction
                # semantics; mirrors engine.constraint_qacc): under-bound
                # applied forces leave velocity creep instead of latching
                d_fr = k.FRICTION_IMPEDANCE
                f_fric[i] = jnp.clip(
                    f_fric[i]
                    + d_fr * Mdiag[i] * (-k.FRICTION_BETA * v[i] - qacc[i])
                    - (1.0 - d_fr) * f_fric[i],
                    -float(fl[i]),
                    float(fl[i]),
                )
            viol_lo = float(lo[i]) - q[i]
            viol_hi = q[i] - float(hi[i])
            aref_lo = k.LIMIT_KAPPA * viol_lo - k.LIMIT_BETA * v[i]
            aref_hi = -k.LIMIT_KAPPA * viol_hi - k.LIMIT_BETA * v[i]
            f_lo[i] = jnp.where(
                viol_lo > 0,
                jnp.maximum(f_lo[i] + d_imp * Mdiag[i] * (aref_lo - qacc[i]), 0.0),
                0.0,
            )
            f_hi[i] = jnp.where(
                viol_hi > 0,
                jnp.minimum(f_hi[i] + d_imp * Mdiag[i] * (aref_hi - qacc[i]), 0.0),
                0.0,
            )
            f_tot.append(f_fric[i] + f_lo[i] + f_hi[i])
        dq_acc = _chol_substitute_rows(nq, Lrows, f_tot, pat)
        qacc = [qacc0[i] + dq_acc[i] for i in range(nq)]
    q_out, v_out = [], []
    for i in range(nq):
        a_i = qacc[i]
        v_new = v[i] + dt * a_i
        q_new = q[i] + dt * v_new
        lo_s = float(lo[i]) - k.LIMIT_SAFETY_MARGIN
        hi_s = float(hi[i]) + k.LIMIT_SAFETY_MARGIN
        q_cl = jnp.clip(q_new, lo_s, hi_s)
        v_new = jnp.where(
            ((q_new > hi_s) & (v_new > 0)) | ((q_new < lo_s) & (v_new < 0)),
            0.0,
            v_new,
        )
        q_out.append(q_cl)
        v_out.append(v_new)

    # ---- cube free body ----
    lv = _add(cube["lv"], _scale(force_c, dt * _CUBE_INV_MASS))
    lv = (lv[0], lv[1], lv[2] + dt * k.GRAVITY[2])
    av = _add(cube["av"], _scale(torque_c, dt * _CUBE_INV_INERTIA))
    # dry frictionloss (mirrors engine: bounded velocity-zeroing projection)
    cap_l = dt * k.CUBE_FRICTIONLOSS * _CUBE_INV_MASS
    cap_a = dt * k.CUBE_FRICTIONLOSS * _CUBE_INV_INERTIA
    lv = tuple(c + jnp.clip(-c, -cap_l, cap_l) for c in lv)
    av = tuple(c + jnp.clip(-c, -cap_a, cap_a) for c in av)
    # energy cap (see constants.CUBE_MAX_LINVEL)
    lv = tuple(jnp.clip(c, -k.CUBE_MAX_LINVEL, k.CUBE_MAX_LINVEL) for c in lv)
    av = tuple(jnp.clip(c, -k.CUBE_MAX_ANGVEL, k.CUBE_MAX_ANGVEL) for c in av)
    pos = _add(cube["pos"], _scale(lv, dt))
    # safe quaternion integrate (mirrors utils.rotations.quat_integrate)
    rot_v = _scale(av, dt)
    sq = _dot(rot_v, rot_v)
    small = sq < 1e-14
    angle = jnp.sqrt(jnp.where(small, 1.0, sq))
    half = 0.5 * angle
    scale_s = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / angle)
    w_s = jnp.where(small, 1.0 - sq / 8.0, jnp.cos(half))
    dq = (w_s, scale_s * rot_v[0], scale_s * rot_v[1], scale_s * rot_v[2])
    quat = _qmul(dq, cube["quat"])
    qn = jnp.sqrt(
        jnp.maximum(
            quat[0] * quat[0] + quat[1] * quat[1] + quat[2] * quat[2]
            + quat[3] * quat[3],
            1e-12,
        )
    )
    quat = tuple(c / qn for c in quat)
    cube_out = dict(pos=pos, quat=quat, lv=lv, av=av)
    return q_out, v_out, cube_out, touch, x, qq


def _substep_kernel(
    model: RobotModel,
    dt: float,
    contact: bool,
    implicit_actuation: bool,
    q_ref, v_ref, ctrl_ref, cube_ref,
    qo_ref, vo_ref, cubeo_ref, touch_ref, xpos_ref, xquat_ref,
):
    nq, nu = model.nq, model.nu
    T = len(model.fingertips)

    def row(ref, i):
        return ref[i : i + 1, :]

    def vec(ref, base):
        return (row(ref, base), row(ref, base + 1), row(ref, base + 2))

    q = [row(q_ref, i) for i in range(nq)]
    v = [row(v_ref, i) for i in range(nq)]
    ctrl = [row(ctrl_ref, i) for i in range(nu)]
    cube = dict(
        pos=vec(cube_ref, 0),
        quat=(row(cube_ref, 3), row(cube_ref, 4), row(cube_ref, 5), row(cube_ref, 6)),
        lv=vec(cube_ref, 7),
        av=vec(cube_ref, 10),
    )

    q_out, v_out, cube_out, touch, x, qq = _substep_core(
        model, dt, contact, implicit_actuation, q, v, ctrl, cube
    )
    zero = jnp.zeros_like(q[0])

    for i in range(nq):
        qo_ref[i : i + 1, :] = q_out[i]
        vo_ref[i : i + 1, :] = v_out[i]
    for c in range(3):
        cubeo_ref[c : c + 1, :] = cube_out["pos"][c]
        cubeo_ref[7 + c : 8 + c, :] = cube_out["lv"][c]
        cubeo_ref[10 + c : 11 + c, :] = cube_out["av"][c]
    for c in range(4):
        cubeo_ref[3 + c : 4 + c, :] = cube_out["quat"][c]

    for t in range(max(T, 1)):
        if T > 0:
            touch_ref[t : t + 1, :] = touch[t].astype(jnp.float32)
        else:
            touch_ref[t : t + 1, :] = zero
    for i in range(nq):
        for c in range(3):
            xpos_ref[i * 3 + c : i * 3 + c + 1, :] = x[i][c]
        for c in range(4):
            xquat_ref[i * 4 + c : i * 4 + c + 1, :] = qq[i][c]


def substep_batched(
    model: RobotModel,
    dt: float,
    contact: bool,
    implicit_actuation: bool,
    qpos: jax.Array,  # (K, nq)
    qvel: jax.Array,  # (K, nq)
    ctrl: jax.Array,  # (K, nu)
    cube13: jax.Array,  # (K, 13) pos, quat, linvel, angvel
):
    """One fused substep for the whole rollout batch.

    Returns (qpos', qvel', cube13', touch (K,T) bool, xpos (K,nq,3),
    xquat (K,nq,4)) -- frames are the PRE-step frames, matching the jnp
    substep's aux contract.
    """
    K, nq = qpos.shape
    nu = ctrl.shape[1]
    T = max(len(model.fingertips), 1)
    kernel = partial(_substep_kernel, model, dt, contact, implicit_actuation)
    in_rows = (nq, nq, nu, 13)
    out_rows = (nq, nq, 13, T, nq * 3, nq * 4)

    # Lane-dim discipline: the batch lives on the 128-wide lane axis, so
    # (a) always pad K up to a multiple of 128 — sub-128 batches (iLQR
    # line-search candidates, batch-of-1 nominal rollouts) waste no
    # hardware and ragged lane counts compile pathologically; (b) VMEM
    # scales with the lane width, so batches beyond _BK lanes (e.g. the
    # iLQR finite-difference linearization's H*(2n+2m) ~ 15k items) are
    # tiled over a grid. Padding replicates the edge item: pad lanes run
    # valid physics (no NaN risk).
    _BK = 2048
    Kp = max(128, -(-K // 128) * 128)
    n_blk = -(-Kp // _BK)
    if n_blk > 1:
        Kp = n_blk * _BK

    def padded(a):
        return jnp.pad(a, ((0, Kp - K), (0, 0)), mode="edge").T

    if n_blk == 1:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        out_specs = tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 6)
        grid = ()
    else:
        in_specs = [
            pl.BlockSpec((r, _BK), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in in_rows
        ]
        out_specs = tuple(
            pl.BlockSpec((r, _BK), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in out_rows
        )
        grid = (n_blk,)
    qo, vo, co, touch, xp, xq = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=tuple(
            jax.ShapeDtypeStruct((r, Kp), jnp.float32) for r in out_rows
        ),
        in_specs=in_specs,
        out_specs=out_specs,
    )(padded(qpos), padded(qvel), padded(ctrl), padded(cube13))
    qo, vo, co = qo[:, :K], vo[:, :K], co[:, :K]
    touch, xp, xq = touch[:, :K], xp[:, :K], xq[:, :K]
    return (
        qo.T,
        vo.T,
        co.T,
        touch.T > 0.5,
        xp.T.reshape(K, nq, 3),
        xq.T.reshape(K, nq, 4),
    )


# ---------------------------------------------------------------------------
# Fused rollout+cost megakernel: the WHOLE horizon in one kernel launch.
#
# The horizon loop runs INSIDE the kernel (jax.lax.fori_loop), keeping the
# whole rollout state VMEM-resident for the full (K, H) sweep; the cost
# function (the reference reward shape, mpc/cost.cube_pick_cost) is
# evaluated in row space each step and accumulated, so MPPI's score pass
# needs only the (K,) totals out of the kernel.
#
# Measured (v5e, K=256..2048, H=50): ~equal to the scanned per-substep
# kernel (0.92-1.06x) — after round 3 removed the runtime slow-mode
# triggers, the scanned chain is NOT launch-bound; both paths are bound by
# the substep's sequential row compute. Kept as a verified alternative
# backend (make_fused_pick_solver): identical controls on-chip, one
# dispatchable program for the whole score pass, and the natural place to
# push further fusion (e.g. sampling + update in-kernel) later.
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Feedback-rollout megakernel: the iLQR line-search / nominal forward pass
# (u = clip(u_nom + alpha*k + K (x - x_nom)); x' = f(x, u)) for ALL alpha
# candidates over the WHOLE horizon as ONE kernel launch.
#
# Why: at line-search batch sizes (6 alphas, or batch-1 nominal rollouts)
# the scanned per-substep kernel is pure launch/scan overhead — ~7-10 us
# per horizon step against ~1 us of 128-lane compute, ~1.5 ms per fused
# iLQR iteration at torso H=100. Keeping the state VMEM-resident across
# the horizon removes exactly that. (The MPPI megakernel above is ~1x vs
# the scanned chain at K>=256 because compute dominates there; this one
# exists for the small-batch regime where it doesn't.)
#
# Supports the REDUCED iLQR state layout (x = [qpos, qvel], cube pinned at
# the template state; ILQRConfig.reduced_state, which requires
# contact=False) — the only regime the fused iLQR bench runs in.
# ---------------------------------------------------------------------------


def _rollout_feedback_kernel(
    model: RobotModel,
    dt: float,
    horizon: int,
    n_substeps: int,
    implicit_actuation: bool,
    clip_lo: tuple,
    clip_hi: tuple,
    alphas_ref, x0_ref, cube0_ref, xs_nom_ref, us_nom_ref, ks_ref, Ks_ref,
    xs_out_ref, us_out_ref,
):
    nq, nu = model.nq, model.nu
    n = 2 * nq
    alpha = alphas_ref[0:1, :]  # (1, B)
    zero = alpha * 0.0

    def bval(ref, i):
        # (1,1) scalar from a (rows,1) block, broadcast over lanes
        return zero + ref[i : i + 1, 0:1]

    q0 = tuple(bval(x0_ref, j) for j in range(nq))
    v0 = tuple(bval(x0_ref, nq + j) for j in range(nq))
    # cube rows pinned at the template every control step (reduced layout:
    # contact=False decouples it; f_fast re-reads the template each step)
    cube_rows = tuple(bval(cube0_ref, c) for c in range(13))
    cube_t = dict(
        pos=cube_rows[0:3],
        quat=cube_rows[3:7],
        lv=cube_rows[7:10],
        av=cube_rows[10:13],
    )

    def body(h, carry):
        q, v = carry
        xn = xs_nom_ref[h]  # (n, 1)
        un = us_nom_ref[h]  # (nu, 1)
        kf = ks_ref[h]  # (nu, 1)
        Kh = Ks_ref[h]  # (nu, n)
        dx = [q[j] - xn[j : j + 1, 0:1] for j in range(nq)] + [
            v[j] - xn[nq + j : nq + j + 1, 0:1] for j in range(nq)
        ]
        ctrl = []
        for i in range(nu):
            acc = un[i : i + 1, 0:1] + alpha * kf[i : i + 1, 0:1]  # (1, B)
            for j in range(n):
                acc = acc + Kh[i : i + 1, j : j + 1] * dx[j]
            ctrl.append(jnp.clip(acc, clip_lo[i], clip_hi[i]))
        cube = dict(cube_t)
        for _ in range(n_substeps):
            q_out, v_out, cube, _touch, _x, _qq = _substep_core(
                model, dt, False, implicit_actuation, list(q), list(v),
                ctrl, cube,
            )
            q, v = tuple(q_out), tuple(v_out)
        for j in range(nq):
            xs_out_ref[h, j : j + 1, :] = q[j]
            xs_out_ref[h, nq + j : nq + j + 1, :] = v[j]
        for i in range(nu):
            us_out_ref[h, i : i + 1, :] = ctrl[i]
        return q, v

    jax.lax.fori_loop(0, horizon, body, (q0, v0), unroll=False)


def rollout_feedback(
    model: RobotModel,
    x0: jax.Array,  # (2*nq,) reduced initial state
    cube0: jax.Array,  # (13,) template cube state (pos, quat, lv, av)
    xs_nom: jax.Array,  # (H, 2*nq) nominal states
    us_nom: jax.Array,  # (H, nu) nominal controls
    ks: jax.Array,  # (H, nu) feedforward gains
    Ks: jax.Array,  # (H, nu, 2*nq) feedback gains
    alphas: jax.Array,  # (B,) line-search step sizes
    n_substeps: int = 1,
    dt: float = k.CONTROL_TIMESTEP,
    implicit_actuation: bool = True,
    interpret: bool = False,
):
    """One kernel launch for the whole (B alphas, H steps) feedback
    rollout. Returns (xs (B, H, n), us (B, H, nu)) — post-step states per
    step, controls as applied (clipped to ctrl_range, exactly like the
    scan-path line search in solvers/ilqr.linesearch).

    Pinned to the scan path by tests/test_pallas.py (interpret oracle) and
    used by the fused iLQR solve for the line search AND the nominal
    rollout (alphas=[1], zero gains — note the nominal path therefore
    clips u to ctrl_range, which the scan rollout0 does not; identical for
    any in-range u, and every accepted iterate is in range by
    construction)."""
    H, n = xs_nom.shape
    nq, nu = model.nq, model.nu
    assert n == 2 * nq, "rollout_feedback supports the reduced layout only"
    B = alphas.shape[0]
    Bp = max(128, -(-B // 128) * 128)
    f32 = jnp.float32
    al = jnp.pad(jnp.asarray(alphas, f32), (0, Bp - B), mode="edge")

    lo = tuple(float(v) for v in model.ctrl_range[:, 0])
    hi = tuple(float(v) for v in model.ctrl_range[:, 1])
    kernel = partial(
        _rollout_feedback_kernel, model, dt, H, n_substeps,
        implicit_actuation, lo, hi,
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    xs, us = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((H, n, Bp), f32),
            jax.ShapeDtypeStruct((H, nu, Bp), f32),
        ),
        in_specs=[vmem] * 7,
        out_specs=(vmem, vmem),
        interpret=interpret,
    )(
        al.reshape(1, Bp),
        jnp.asarray(x0, f32).reshape(n, 1),
        jnp.asarray(cube0, f32).reshape(13, 1),
        jnp.asarray(xs_nom, f32).reshape(H, n, 1),
        jnp.asarray(us_nom, f32).reshape(H, nu, 1),
        jnp.asarray(ks, f32).reshape(H, nu, 1),
        jnp.asarray(Ks, f32),
    )
    return (
        xs[:, :, :B].transpose(2, 0, 1),
        us[:, :, :B].transpose(2, 0, 1),
    )


class PickCostSpec(NamedTuple):
    """Host-side spec of cube_pick_cost (mpc/cost.py) for the fused kernel.

    Plain floats/bools only — these are baked into the kernel as literals
    (device arrays in closures trigger the axon slow mode,
    tests/test_no_device_closures.py)."""

    w_vel: float = float(k.REWARD_VEL_PENALTY)
    w_grip_dist: float = float(k.REWARD_GRIP_DIST)
    w_touch: float = float(k.REWARD_TOUCH_CUBE)
    w_lift: float = float(k.REWARD_LIFT_CUBE)
    w_ctrl: float = 1e-3
    use_right: bool = True
    use_left: bool = False


def _table_touch_row(cube_out):
    """Row-space replica of contacts.cube_table's `touching` on the
    POST-step cube state (matching mpc_step's aux.touch_table, which is
    computed from the post-step state — mpc/rollout.py)."""
    pos, quat = cube_out["pos"], cube_out["quat"]
    touching = None
    for sx in (-1.0, 1.0):
        for sy in (-1.0, 1.0):
            for sz in (-1.0, 1.0):
                off = (sx * k.CUBE_HALF_SIZE, sy * k.CUBE_HALF_SIZE,
                       sz * k.CUBE_HALF_SIZE)
                cw = _add(pos, _qrot(quat, tuple(jnp.float32(c) for c in off)))
                over = (
                    (jnp.abs(cw[0] - float(k.TABLE_POS[0])) < k.TABLE_HALF_X)
                    & (jnp.abs(cw[1] - float(k.TABLE_POS[1])) < k.TABLE_HALF_Y)
                )
                t = over & (cw[2] < k.TABLE_TOP_Z)
                touching = t if touching is None else (touching | t)
    return touching


def _pick_cost_row(model, spec, q_out, v_out, cube_out, ctrl, touch, x, qq):
    """cube_pick_cost (mpc/cost.py:40-69) on (1, K) rows.

    Mirrors the state/aux time alignment of mpc_step: post-step state
    (q_out/v_out/cube_out), PRE-step frames (x, qq) for the site position,
    last-substep touch flags, post-step table touch."""
    nq, nu = model.nq, model.nu
    # w_vel * safe_norm([qvel, cube_linvel, cube_angvel])
    sq = None
    for r in list(v_out) + list(cube_out["lv"]) + list(cube_out["av"]):
        sq = r * r if sq is None else sq + r * r
    c = spec.w_vel * jnp.sqrt(jnp.where(sq < 1e-16, 1e-16, sq))

    for use, site_name in ((spec.use_right, "eer_site"),
                           (spec.use_left, "eel_site")):
        if not use:
            continue
        s = model.site(site_name)
        off = tuple(jnp.float32(float(v)) for v in np.asarray(s.pos))
        p = _add(x[s.parent], _qrot(qq[s.parent], off))
        d = _sub(cube_out["pos"], p)
        dist = jnp.sqrt(jnp.maximum(_dot(d, d), 1e-30))
        c = c - spec.w_grip_dist / (dist + k.EPSILON)

    T = len(model.fingertips)
    if T > 0:
        touched = None
        for t_i, tip in enumerate(model.fingertips):
            flag = touch[t_i]
            touched = flag if touched is None else (touched | flag)
        ttab = _table_touch_row(cube_out)
        c = c - jnp.where(touched, spec.w_touch, 0.0)
        c = c - jnp.where(touched & ~ttab, spec.w_lift, 0.0)

    effort = None
    for i in range(nu):
        e = (ctrl[i] - q_out[i]) ** 2
        effort = e if effort is None else effort + e
    return c + spec.w_ctrl * effort


def _rollout_pick_kernel(
    model: RobotModel,
    dt: float,
    horizon: int,
    n_substeps: int,
    contact: bool,
    implicit_actuation: bool,
    spec: PickCostSpec,
    U_ref, q_ref, v_ref, cube_ref,
    cost_ref,
):
    nq, nu = model.nq, model.nu

    def row(ref, i):
        return ref[i : i + 1, :]

    def vec(ref, base):
        return (row(ref, base), row(ref, base + 1), row(ref, base + 2))

    q0 = tuple(row(q_ref, i) for i in range(nq))
    v0 = tuple(row(v_ref, i) for i in range(nq))
    cube0 = (
        vec(cube_ref, 0),
        (row(cube_ref, 3), row(cube_ref, 4), row(cube_ref, 5),
         row(cube_ref, 6)),
        vec(cube_ref, 7),
        vec(cube_ref, 10),
    )
    acc0 = jnp.zeros_like(q0[0])

    def body(h, carry):
        q, v, cube_t, acc = carry
        # U_ref is (H, nu, K): dynamic index on the LEADING dim only — a
        # dynamic sublane offset (h*nu with nu=10) is not 8-aligned and
        # Mosaic rejects it; leading-dim indexing is always tile-aligned.
        blk = U_ref[h]  # (nu, K)
        ctrl = [blk[i : i + 1, :] for i in range(nu)]
        cube = dict(pos=cube_t[0], quat=cube_t[1], lv=cube_t[2],
                    av=cube_t[3])
        for _ in range(n_substeps):
            q_out, v_out, cube_out, touch, x, qq = _substep_core(
                model, dt, contact, implicit_actuation,
                list(q), list(v), ctrl, cube,
            )
            q, v, cube = tuple(q_out), tuple(v_out), cube_out
        acc = acc + _pick_cost_row(
            model, spec, q, v, cube, ctrl, touch, x, qq
        )
        cube_t = (tuple(cube["pos"]), tuple(cube["quat"]),
                  tuple(cube["lv"]), tuple(cube["av"]))
        return q, v, cube_t, acc

    _, _, _, acc = jax.lax.fori_loop(0, horizon, body, (q0, v0, cube0, acc0))
    cost_ref[0:1, :] = acc


def rollout_pick_costs(
    model: RobotModel,
    ctrl_seqs: jax.Array,  # (K, H, nu) candidate control sequences
    state0,  # SimState (single, shared by all candidates)
    spec: PickCostSpec = PickCostSpec(),
    n_substeps: int = 1,
    dt: float = k.CONTROL_TIMESTEP,
    contact: bool = True,
    implicit_actuation: bool = True,
    interpret: bool = False,
    block_k: int = 1024,
) -> jax.Array:
    """Total pick cost of K control sequences: ONE kernel launch for the
    whole (K, H) rollout+cost sweep. Exactly matches
    vmap(rollout(..., cube_pick_cost))'s totals (tests/test_pallas.py).

    `block_k`: lane-block size per grid step (K > block_k tiles the batch
    over a 1-D grid; exposed mainly so tests can exercise the grid path
    at small K)."""
    K, H, nu = ctrl_seqs.shape
    nq = model.nq

    _BK = block_k
    Kp = max(128, -(-K // 128) * 128)
    n_blk = -(-Kp // _BK)
    if n_blk > 1:
        Kp = n_blk * _BK

    U = jnp.pad(ctrl_seqs, ((0, Kp - K), (0, 0), (0, 0)), mode="edge")
    U = U.transpose(1, 2, 0)  # (H, nu, Kp)

    def bcast(a, rows):
        return jnp.broadcast_to(
            jnp.asarray(a, jnp.float32).reshape(rows, 1), (rows, Kp)
        )

    q0 = bcast(state0.qpos, nq)
    v0 = bcast(state0.qvel, nq)
    cube0 = bcast(
        jnp.concatenate([
            state0.cube_pos, state0.cube_quat,
            state0.cube_linvel, state0.cube_angvel,
        ]), 13,
    )

    kernel = partial(
        _rollout_pick_kernel, model, dt, H, n_substeps, contact,
        implicit_actuation, spec,
    )
    if n_blk == 1:
        in_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 4
        out_specs = pl.BlockSpec(memory_space=pltpu.VMEM)
        grid = ()
    else:
        in_specs = [
            pl.BlockSpec(
                (H, nu, _BK), lambda i: (0, 0, i), memory_space=pltpu.VMEM
            )
        ] + [
            pl.BlockSpec((r, _BK), lambda i: (0, i), memory_space=pltpu.VMEM)
            for r in (nq, nq, 13)
        ]
        out_specs = pl.BlockSpec(
            (1, _BK), lambda i: (0, i), memory_space=pltpu.VMEM
        )
        grid = (n_blk,)
    cost = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((1, Kp), jnp.float32),
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(U, q0, v0, cube0)
    return cost[0, :K]
