"""Pallas TPU kernel: fused batched FK + RNEA forward pass.

The per-substep kinematics/bias computation is an unrolled chain of ~1000
tiny vector ops (ops/kinematics.rnea_terms). Under `vmap` over thousands of
rollouts XLA batches each op but keeps them as separate fused-kernel
launches inside the horizon scan -- the substep is launch-bound, not
FLOP-bound. This kernel runs the WHOLE forward+backward recursion as one
Pallas program: the rollout batch K lives on the 128-lane axis and every
quaternion/vector component is a (1, K) VPU row op; the tree structure and
all per-joint constants are static and unroll at trace time, mirroring
ops/kinematics.rnea_terms op-for-op.

Wired into the engine through the same custom_vmap seam as the Cholesky
kernel (ops/linalg.make_batch_aware_solve): per-item calls keep the jnp
path, vmapped calls dispatch here.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_kmanip_tpu.models.spec import HINGE, RobotModel

# ---- row-tuple algebra: a 3-vector is (x, y, z) of (1, K) rows, a
# quaternion is (w, x, y, z) of (1, K) rows; scalars broadcast ----


def _qmul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return (
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    )


def _qrot(q, v):
    """Rotate row-vector v by row-quaternion q: v + 2(w u x v + u x (u x v))."""
    w = q[0]
    u = (q[1], q[2], q[3])
    uv = _cross(u, v)
    uuv = _cross(u, uv)
    return (
        v[0] + 2.0 * (w * uv[0] + uuv[0]),
        v[1] + 2.0 * (w * uv[1] + uuv[1]),
        v[2] + 2.0 * (w * uv[2] + uuv[2]),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _add(a, b):
    return tuple(x + y for x, y in zip(a, b))


def _sub(a, b):
    return tuple(x - y for x, y in zip(a, b))


def _scale(a, s):
    return tuple(x * s for x in a)


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _rnea_rows(model: RobotModel, g_z: float, q_rows, v_rows):
    """Core FK+RNEA recursion on (1, K) rows.

    q_rows/v_rows: lists of nq rows. Returns dict with per-joint lists:
    x, qq (quat), axis, w, v (all row-tuples), and bias (rows).
    Shared by the standalone RNEA kernel and the fused substep kernel.
    """
    nq = model.nq
    jp = np.asarray(model.jnt_pos, dtype=np.float32)
    jqn = np.asarray(model.jnt_quat, dtype=np.float32)
    mass = np.asarray(model.body_mass, dtype=np.float32)
    I_diag = np.asarray(model.body_inertia, dtype=np.float32)
    com_l = np.asarray(model.body_com, dtype=np.float32)

    zero = jnp.zeros_like(q_rows[0])
    one = zero + 1.0

    x, qq, axis, w, v, alpha, a = [], [], [], [], [], [], []
    for i in range(nq):
        par = int(model.parent[i])
        if par < 0:
            xp_, qp = (zero, zero, zero), (one, zero, zero, zero)
            wp, vp, alp, ap = (
                (zero, zero, zero), (zero, zero, zero), (zero, zero, zero),
                (zero, zero, zero + (-g_z)),
            )
        else:
            xp_, qp = x[par], qq[par]
            wp, vp, alp, ap = w[par], v[par], alpha[par], a[par]
        jpc = tuple(zero + float(c) for c in jp[i])
        jqc = (zero + float(jqn[i, 0]), zero + float(jqn[i, 1]),
               zero + float(jqn[i, 2]), zero + float(jqn[i, 3]))
        r = _qrot(qp, jpc)
        xi = _add(xp_, r)
        qi = _qmul(qp, jqc)
        qi_dat = q_rows[i]
        vi_dat = v_rows[i]
        if int(model.jnt_type[i]) == HINGE:
            half = 0.5 * qi_dat
            qz = (jnp.cos(half), zero, zero, jnp.sin(half))
            qi = _qmul(qi, qz)
            ax = _qrot(qi, (zero, zero, one))
            wi = _add(wp, _scale(ax, vi_dat))
            ali = _add(alp, _cross(wp, _scale(ax, vi_dat)))
            vi = _add(vp, _cross(wp, r))
            ai = _add(_add(ap, _cross(alp, r)), _cross(wp, _cross(wp, r)))
        else:  # SLIDE along local z
            ax = _qrot(qi, (zero, zero, one))
            xi = _add(xi, _scale(ax, qi_dat))
            wi = wp
            ali = alp
            r_eff = _add(r, _scale(ax, qi_dat))
            vi = _add(_add(vp, _cross(wp, r_eff)), _scale(ax, vi_dat))
            ai = _add(
                _add(_add(ap, _cross(alp, r_eff)), _cross(wp, _cross(wp, r_eff))),
                _scale(_cross(wp, _scale(ax, vi_dat)), 2.0),
            )
        x.append(xi)
        qq.append(qi)
        axis.append(ax)
        w.append(wi)
        v.append(vi)
        alpha.append(ali)
        a.append(ai)

    # inertial loads at each COM (world frame)
    f_net, n_net = [], []
    Rs = []
    for i in range(nq):
        cl = tuple(zero + float(c) for c in com_l[i])
        c = _qrot(qq[i], cl)
        a_com = _add(_add(a[i], _cross(alpha[i], c)), _cross(w[i], _cross(w[i], c)))
        qw, qx, qy, qz_ = qq[i]
        R = [
            [1 - 2 * (qy * qy + qz_ * qz_), 2 * (qx * qy - qw * qz_), 2 * (qx * qz_ + qw * qy)],
            [2 * (qx * qy + qw * qz_), 1 - 2 * (qx * qx + qz_ * qz_), 2 * (qy * qz_ - qw * qx)],
            [2 * (qx * qz_ - qw * qy), 2 * (qy * qz_ + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
        Rs.append(R)

        def Iw_mul(y, R=R, i=i):
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

        f_net.append(_scale(a_com, float(mass[i])))
        n_net.append(_add(Iw_mul(alpha[i]), _cross(w[i], Iw_mul(w[i]))))

    # backward pass
    F = [None] * nq
    N = [None] * nq
    bias = [None] * nq
    for i in range(nq - 1, -1, -1):
        cl = tuple(zero + float(c) for c in com_l[i])
        c = _qrot(qq[i], cl)
        Fi = f_net[i]
        Ni = _add(n_net[i], _cross(c, f_net[i]))
        for ch in range(i + 1, nq):
            if int(model.parent[ch]) == i:
                Fi = _add(Fi, F[ch])
                Ni = _add(_add(Ni, N[ch]), _cross(_sub(x[ch], x[i]), F[ch]))
        F[i] = Fi
        N[i] = Ni
        bias[i] = _dot(axis[i], Ni) if int(model.jnt_type[i]) == HINGE else _dot(
            axis[i], Fi
        )
    return dict(x=x, qq=qq, axis=axis, w=w, v=v, bias=bias, Rs=Rs, zero=zero, one=one)


def _rnea_kernel(model: RobotModel, g_z: float, q_ref, v_ref, xpos_ref,
                 xquat_ref, axis_ref, bias_ref):
    nq = model.nq

    def row(ref, i):
        return ref[i : i + 1, :]

    out = _rnea_rows(
        model, g_z,
        [row(q_ref, i) for i in range(nq)],
        [row(v_ref, i) for i in range(nq)],
    )
    for i in range(nq):
        bias_ref[i : i + 1, :] = out["bias"][i]
        for c in range(3):
            xpos_ref[i * 3 + c : i * 3 + c + 1, :] = out["x"][i][c]
            axis_ref[i * 3 + c : i * 3 + c + 1, :] = out["axis"][i][c]
        for c in range(4):
            xquat_ref[i * 4 + c : i * 4 + c + 1, :] = out["qq"][i][c]


def rnea_terms_batched(
    model: RobotModel, qpos: jax.Array, qvel: jax.Array, g: float = 9.81
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Batched (xpos, xquat, axis_w, bias) via one fused kernel.

    qpos, qvel: (K, nq) -> outputs (K, nq, 3), (K, nq, 4), (K, nq, 3), (K, nq).
    """
    K, nq = qpos.shape
    qt = qpos.T  # (nq, K)
    vt = qvel.T
    xpos_t, xquat_t, axis_t, bias_t = pl.pallas_call(
        partial(_rnea_kernel, model, -g),
        out_shape=(
            jax.ShapeDtypeStruct((nq * 3, K), qpos.dtype),
            jax.ShapeDtypeStruct((nq * 4, K), qpos.dtype),
            jax.ShapeDtypeStruct((nq * 3, K), qpos.dtype),
            jax.ShapeDtypeStruct((nq, K), qpos.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 4),
    )(qt, vt)
    return (
        xpos_t.T.reshape(K, nq, 3),
        xquat_t.T.reshape(K, nq, 4),
        axis_t.T.reshape(K, nq, 3),
        bias_t.T,
    )
