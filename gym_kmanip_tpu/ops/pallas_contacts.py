"""Pallas TPU kernel: fused batched contact model.

Ports dynamics/contacts.contact_forces (cube-table corners, fingertip-cube
sphere-box, fingertip-table) into one Pallas program with the rollout batch
on the lane axis -- the contact stage measured ~3.5 ms of an 8.1 ms MPPI
solve at K=256 H=50 purely from launch-bound elementwise kernels. Same
row-tuple algebra as ops/pallas_dynamics; mirrors the jnp reference
op-for-op (validated in interpret mode by tests/test_pallas.py).
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models.spec import RobotModel
from gym_kmanip_tpu.ops.pallas_dynamics import _add, _cross, _dot, _scale, _sub

_CORNER_SIGNS = [
    (sx, sy, sz)
    for sx in (-1.0, 1.0)
    for sy in (-1.0, 1.0)
    for sz in (-1.0, 1.0)
]


def _normal_force(pen, vn, a0, m_eff):
    # MuJoCo-impedance form (see dynamics/contacts._normal_force)
    aref = k.CONTACT_KAPPA * pen - k.CONTACT_BETA * vn
    return jnp.where(pen > 0, m_eff * jnp.maximum(aref - a0, 0.0), 0.0)


def _friction(fn, vt):
    speed = jnp.sqrt(vt[0] * vt[0] + vt[1] * vt[1] + vt[2] * vt[2] + k.CONTACT_SLIP_VEL**2)
    s = -k.CONTACT_FRICTION_MU * fn / speed
    return (vt[0] * s, vt[1] * s, vt[2] * s)


def _over_table(px, py):
    return (jnp.abs(px - k.TABLE_POS[0]) < k.TABLE_HALF_X) & (
        jnp.abs(py - k.TABLE_POS[1]) < k.TABLE_HALF_Y
    )


def _R_rows(q):
    """Row-quaternion -> 3x3 of (1,K) rows (body->world)."""
    w, x, y, z = q
    return [
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ]


def _contact_rows(model: RobotModel, tip_pos_rows, tip_vel_rows, cube):
    """Core contact model on (1, K) rows.

    tip_pos_rows/tip_vel_rows: lists of T row-triples; cube: dict with
    row-tuples pos, quat, lv, av. Returns (force, torque, tip_forces list,
    touch list, touching_table). Shared by the standalone contact kernel
    and the fused substep kernel.
    """
    T = len(model.fingertips)
    radii = [float(t.radius) for t in model.fingertips]
    h = k.CUBE_HALF_SIZE

    cube_pos, cube_quat = cube["pos"], cube["quat"]
    cube_lv, cube_av = cube["lv"], cube["av"]
    R = _R_rows(cube_quat)

    def Rmul(v):
        return (
            R[0][0] * v[0] + R[0][1] * v[1] + R[0][2] * v[2],
            R[1][0] * v[0] + R[1][1] * v[1] + R[1][2] * v[2],
            R[2][0] * v[0] + R[2][1] * v[1] + R[2][2] * v[2],
        )

    def Rtmul(v):
        return (
            R[0][0] * v[0] + R[1][0] * v[1] + R[2][0] * v[2],
            R[0][1] * v[0] + R[1][1] * v[1] + R[2][1] * v[2],
            R[0][2] * v[0] + R[1][2] * v[1] + R[2][2] * v[2],
        )

    zero = jnp.zeros_like(cube_pos[0])

    # fingertip-cube pairs FIRST: their force on the cube feeds the table
    # contact's a0 (same Gauss-Seidel ordering as dynamics/contacts.py)
    force = (zero, zero, zero)
    torque = (zero, zero, zero)
    tip_forces = []
    touch = []
    for t in range(T):
        p = tip_pos_rows[t]
        v = tip_vel_rows[t]
        r = radii[t]
        local = Rtmul(_sub(p, cube_pos))
        clamped = tuple(jnp.clip(c, -h, h) for c in local)
        delta = _sub(local, clamped)
        sq = _dot(delta, delta)
        outside = sq > 1e-18
        dist = jnp.sqrt(jnp.where(outside, sq, 1.0))
        n_out = _scale(delta, 1.0 / dist)
        pen_out = r - dist
        fd = tuple(h - jnp.abs(c) for c in local)
        sgn = tuple(jnp.sign(c + 1e-12) for c in local)
        m01 = fd[0] <= fd[1]
        fd01 = jnp.where(m01, fd[0], fd[1])
        ax_is0 = m01 & (fd[0] <= fd[2])
        ax_is1 = (~m01) & (fd[1] <= fd[2])
        ax_is2 = ~(ax_is0 | ax_is1)
        n_in = (
            jnp.where(ax_is0, sgn[0], 0.0),
            jnp.where(ax_is1, sgn[1], 0.0),
            jnp.where(ax_is2, sgn[2], 0.0),
        )
        pen_in = r + jnp.where(fd01 <= fd[2], fd01, fd[2])
        pen = jnp.where(outside, pen_out, pen_in)
        n_local = tuple(jnp.where(outside, a, b) for a, b in zip(n_out, n_in))
        n = Rmul(n_local)
        cpoint = _sub(p, _scale(n, r - jnp.maximum(pen, 0.0) * 0.5))
        arm = _sub(cpoint, cube_pos)
        v_cpt = _add(cube_lv, _cross(cube_av, arm))
        v_rel = _sub(v, v_cpt)
        vn = _dot(v_rel, n)
        a0 = -(k.GRAVITY[0] * n[0] + k.GRAVITY[1] * n[1] + k.GRAVITY[2] * n[2])
        fn = _normal_force(pen, vn, a0, k.CUBE_MASS)
        vt = _sub(v_rel, _scale(n, vn))
        fr = _friction(fn, vt)
        f_tip = _add(_scale(n, fn), fr)
        # no tip-table force (matches dynamics/contacts.py: the reference has
        # no finger collision geoms, so grippers pass through the tabletop)

        f_on_cube = _sub(_scale(_scale(n, fn), -1.0), fr)
        force = _add(force, f_on_cube)
        torque = _add(torque, _cross(arm, f_on_cube))
        tip_forces.append(f_tip)
        touch.append(pen > 0)

    # cube-corner vs table plane, impedance form with a0 from gravity + the
    # accumulated fingertip force/torque (dynamics/contacts.cube_table)
    ext_f = (
        force[0] + k.CUBE_MASS * k.GRAVITY[0],
        force[1] + k.CUBE_MASS * k.GRAVITY[1],
        force[2] + k.CUBE_MASS * k.GRAVITY[2],
    )
    acc_com = _scale(ext_f, 1.0 / k.CUBE_MASS)
    alpha = _scale(torque, 1.0 / k.CUBE_DIAG_INERTIA)
    touching = zero > 1.0
    pens, vcs, arms, a0s, overs = [], [], [], [], []
    n_act = zero
    for sx, sy, sz in _CORNER_SIGNS:
        local = (zero + sx * h, zero + sy * h, zero + sz * h)
        arm = Rmul(local)
        cw = _add(cube_pos, arm)
        vc = _add(cube_lv, _cross(cube_av, arm))
        over = _over_table(cw[0], cw[1])
        plane_z = jnp.where(over, k.TABLE_TOP_Z, 0.0)
        pen = plane_z - cw[2]
        a_corner = _add(acc_com, _add(_cross(alpha, arm), _cross(cube_av, _cross(cube_av, arm))))
        pens.append(pen)
        vcs.append(vc)
        arms.append(arm)
        a0s.append(a_corner[2])
        overs.append(over)
        n_act = n_act + jnp.where(pen > 0, 1.0, 0.0)
        touching = touching | ((pen > 0) & over)
    m_eff = k.CUBE_MASS / jnp.maximum(n_act, 1.0)
    for pen, vc, arm, a0c in zip(pens, vcs, arms, a0s):
        fn = _normal_force(pen, vc[2], a0c, m_eff)
        ft = _friction(fn, (vc[0], vc[1], zero))
        f = (ft[0], ft[1], ft[2] + fn)
        force = _add(force, f)
        torque = _add(torque, _cross(arm, f))
    return force, torque, tip_forces, touch, touching


def _contacts_kernel(model: RobotModel, tip_pos_ref, tip_vel_ref, cube_ref,
                     fc_ref, tc_ref, tf_ref, touch_ref, ttab_ref):
    T = len(model.fingertips)

    def row(ref, i):
        return ref[i : i + 1, :]

    def vec(ref, base):
        return (row(ref, base), row(ref, base + 1), row(ref, base + 2))

    cube = dict(
        pos=vec(cube_ref, 0),
        quat=(row(cube_ref, 3), row(cube_ref, 4), row(cube_ref, 5), row(cube_ref, 6)),
        lv=vec(cube_ref, 7),
        av=vec(cube_ref, 10),
    )
    force, torque, tip_forces, touch, touching = _contact_rows(
        model,
        [vec(tip_pos_ref, 3 * t) for t in range(T)],
        [vec(tip_vel_ref, 3 * t) for t in range(T)],
        cube,
    )
    for t in range(T):
        for c in range(3):
            tf_ref[3 * t + c : 3 * t + c + 1, :] = tip_forces[t][c]
        touch_ref[t : t + 1, :] = touch[t].astype(jnp.float32)
    for c in range(3):
        fc_ref[c : c + 1, :] = force[c]
        tc_ref[c : c + 1, :] = torque[c]
    ttab_ref[0:1, :] = touching.astype(jnp.float32)


def contact_forces_batched(
    model: RobotModel,
    tip_pos: jax.Array,  # (K, T, 3)
    tip_vel: jax.Array,  # (K, T, 3)
    cube_pos: jax.Array,  # (K, 3)
    cube_quat: jax.Array,  # (K, 4)
    cube_linvel: jax.Array,  # (K, 3)
    cube_angvel: jax.Array,  # (K, 3)
):
    """Batched ContactOut fields via one fused kernel."""
    K, T, _ = tip_pos.shape
    cube = jnp.concatenate([cube_pos, cube_quat, cube_linvel, cube_angvel], axis=1).T
    fc, tc, tf, touch, ttab = pl.pallas_call(
        partial(_contacts_kernel, model),
        out_shape=(
            jax.ShapeDtypeStruct((3, K), tip_pos.dtype),
            jax.ShapeDtypeStruct((3, K), tip_pos.dtype),
            jax.ShapeDtypeStruct((T * 3, K), tip_pos.dtype),
            jax.ShapeDtypeStruct((T, K), jnp.float32),
            jax.ShapeDtypeStruct((1, K), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=tuple([pl.BlockSpec(memory_space=pltpu.VMEM)] * 5),
    )(tip_pos.reshape(K, T * 3).T, tip_vel.reshape(K, T * 3).T, cube)
    from gym_kmanip_tpu.dynamics.contacts import ContactOut

    return ContactOut(
        force_cube=fc.T,
        torque_cube=tc.T,
        tip_forces=tf.T.reshape(K, T, 3),
        touch_tip=touch.T > 0.5,
        touch_table=ttab[0] > 0.5,
    )
