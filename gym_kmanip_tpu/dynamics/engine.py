"""Forward dynamics step: PD actuators + bias + contacts, semi-implicit Euler.

TPU-native replacement for the reference's `physics.step()` pipeline
(dm_control -> native MuJoCo mj_step, /root/reference/gym_kmanip/env_sim.py:
196-210): one 20 ms control step = `lax.scan` over 10 substeps of 2 ms
(CONTROL_TIMESTEP / PHYSICS_TIMESTEP, reference __init__.py:30 + MuJoCo
default timestep).

The actuator model mirrors MuJoCo `<position>` servos (arm_r.xml:44-55,
torso.xml:113-135): tau = kp * (ctrl - q), clamped to forcerange. The
reference XMLs specify no joint damping; a small engine damping plus the
XML frictionloss keeps the undamped kp=1000 servos well-behaved under
explicit integration (documented engine regularization, not reference
behavior).

Everything is a pure function of (model, state, ctrl); model is static and
closed over by jit, state/ctrl vmap over rollout batches.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.dynamics import contacts
from gym_kmanip_tpu.dynamics.state import SimState, StepAux
from gym_kmanip_tpu.models.spec import RobotModel
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.utils import rotations as rot

_CUBE_INV_MASS = 1.0 / k.CUBE_MASS
_CUBE_INV_INERTIA = 1.0 / k.CUBE_DIAG_INERTIA  # isotropic (scene.xml:16)


def _tip_state(
    model: RobotModel, xpos, xquat, axis_w, qvel
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """World fingertip positions, velocities, and translational Jacobians."""
    tips = model.fingertips
    pos, jac, rad = [], [], []
    for t in tips:
        p = xpos[t.parent] + rot.quat_rotate(
            xquat[t.parent], jnp.asarray(t.pos, dtype=qvel.dtype)
        )
        jp, _ = kin.point_jacobian(model, xpos, axis_w, p, t.parent)
        pos.append(p)
        jac.append(jp)
        rad.append(t.radius)
    pos = jnp.stack(pos)  # (T,3)
    jac = jnp.stack(jac)  # (T,3,nq)
    vel = jac @ qvel  # (T,3)
    return pos, vel, jac, jnp.asarray(rad, dtype=qvel.dtype)


def _limit_torque(model: RobotModel, qpos, qvel) -> jax.Array:
    """Soft joint-limit penalty (MuJoCo handles limits as constraints;
    penalty + the hard clamp in _integrate matches the stiff-limit
    behavior well enough for control purposes)."""
    lo = jnp.asarray(model.jnt_range[:, 0], dtype=qpos.dtype)
    hi = jnp.asarray(model.jnt_range[:, 1], dtype=qpos.dtype)
    over = jnp.maximum(qpos - hi, 0.0)
    under = jnp.maximum(lo - qpos, 0.0)
    return k.LIMIT_STIFFNESS * (under - over) - k.LIMIT_DAMPING * qvel * (
        (over > 0) | (under > 0)
    )


def substep(model: RobotModel, state: SimState, dt: float) -> Tuple[SimState, jax.Array]:
    """One physics substep. Returns (new_state, touch (T,) tip-cube bools)."""
    q, v = state.qpos, state.qvel

    # single forward pass: world frames + bias forces (RNEA)
    xpos, xquat, axis_w, tau_bias = kin.rnea_terms(model, q, v)
    tip_pos, tip_vel, tip_jac, tip_rad = _tip_state(model, xpos, xquat, axis_w, v)

    con = contacts.contact_forces(
        tip_pos,
        tip_vel,
        tip_rad,
        state.cube_pos,
        state.cube_quat,
        state.cube_linvel,
        state.cube_angvel,
    )

    # ---- robot ----
    kp = jnp.asarray(model.actuator_kp, dtype=q.dtype)
    frange = jnp.asarray(model.force_range, dtype=q.dtype)
    tau_act = jnp.clip(kp * (state.ctrl - q[: model.nu]), frange[:, 0], frange[:, 1])
    tau_act = jnp.zeros_like(q).at[: model.nu].set(tau_act)

    fl = jnp.asarray(model.jnt_frictionloss, dtype=q.dtype)
    tau_fric = -fl * jnp.tanh(v / 0.01) - k.JOINT_DAMPING * v
    tau_contact = jnp.einsum("taj,ta->j", tip_jac, con.tip_forces)

    tau = tau_act + tau_fric + tau_contact + _limit_torque(model, q, v) - tau_bias
    M = kin.mass_matrix_from_frames(model, xpos, xquat, axis_w)
    L = jnp.linalg.cholesky(M)
    qacc = jax.scipy.linalg.cho_solve((L, True), tau)

    v_new = v + dt * qacc
    q_new = q + dt * v_new
    # hard clamp at joint limits, zeroing outward velocity
    lo = jnp.asarray(model.jnt_range[:, 0], dtype=q.dtype)
    hi = jnp.asarray(model.jnt_range[:, 1], dtype=q.dtype)
    q_clamped = jnp.clip(q_new, lo, hi)
    v_new = jnp.where(
        ((q_new > hi) & (v_new > 0)) | ((q_new < lo) & (v_new < 0)), 0.0, v_new
    )

    # ---- cube (free body) ----
    g = jnp.asarray(k.GRAVITY, dtype=q.dtype)
    linvel = state.cube_linvel + dt * (con.force_cube * _CUBE_INV_MASS + g)
    angvel = state.cube_angvel + dt * (con.torque_cube * _CUBE_INV_INERTIA)
    # cube_joint frictionloss 0.01 (scene.xml:15): smooth Coulomb on both
    # velocity components, divided by mass/inertia
    linvel = linvel - dt * k.CUBE_FRICTIONLOSS * jnp.tanh(linvel / 0.01) * _CUBE_INV_MASS
    angvel = angvel - dt * k.CUBE_FRICTIONLOSS * jnp.tanh(angvel / 0.01) * _CUBE_INV_INERTIA
    cube_pos = state.cube_pos + dt * linvel
    cube_quat = rot.quat_integrate(state.cube_quat, angvel, dt)

    new = SimState(
        qpos=q_clamped,
        qvel=v_new,
        ctrl=state.ctrl,
        cube_pos=cube_pos,
        cube_quat=cube_quat,
        cube_linvel=linvel,
        cube_angvel=angvel,
        time=state.time + dt,
    )
    return new, con.touch_tip


def control_step(
    model: RobotModel, state: SimState, ctrl: jax.Array
) -> Tuple[SimState, StepAux]:
    """One 20 ms control step = N_SUBSTEPS scanned physics substeps.

    `ctrl` is the already-decoded actuator target vector (the env layer does
    action decoding + the exponential ctrl filter, mirroring
    KManipTask.before_step, env_sim.py:38-108).
    """
    state = state._replace(ctrl=jnp.asarray(ctrl, dtype=state.qpos.dtype))

    def body(s, _):
        s2, touch = substep(model, s, k.PHYSICS_TIMESTEP)
        return s2, touch

    state, touches = jax.lax.scan(body, state, None, length=k.N_SUBSTEPS)

    # diagnostics at the final state (the reference reads contacts/xpos after
    # the substep loop, env_sim.py:163-178)
    xpos, xquat, _ = kin.fk(model, state.qpos)
    sp, sq = [], []
    for s in model.sites:
        p, qu = kin.site_pose(model, xpos, xquat, s.name)
        sp.append(p)
        sq.append(qu)
    touch_last = touches[-1]  # (T,)
    sides_r = jnp.asarray([t.side == "r" for t in model.fingertips])
    sides_l = jnp.asarray([t.side == "l" for t in model.fingertips])

    # cube-table touch recomputed at final state
    _, _, touch_table = contacts.cube_table(
        state.cube_pos, state.cube_quat, state.cube_linvel, state.cube_angvel
    )

    aux = StepAux(
        touch_r=jnp.any(touch_last & sides_r),
        touch_l=jnp.any(touch_last & sides_l),
        touch_table=touch_table,
        site_pos=jnp.stack(sp),
        site_quat=jnp.stack(sq),
        qfrc_contact=jnp.zeros_like(state.qvel),
    )
    return state, aux


def make_control_step(model: RobotModel):
    """Jitted single-env control step closed over a static model."""
    return jax.jit(partial(control_step, model))
