"""Batched damped least-squares IK in pure JAX.

TPU-native replacement for the reference's scipy-TRF IK
(/root/reference/gym_kmanip/ik_mujoco.py:100-155). The residual is the same
stack the reference builds (ik_mujoco.py:20-53):

    r(q) = [ ee_pos(q) - goal_pos                      (3,)
             IK_RES_RAD * subQuat(goal_orn, ee_orn(q)) (3,)
             IK_RES_REG_PREV * (q - q_prev)            (n,)
             IK_RES_REG_HOME * (q - q_home)            (n,) ]

so the least-squares minimum is the reference's. scipy's adaptive
trust-region loop cannot be jitted; instead we run a fixed-budget
Levenberg-Marquardt iteration with bound projection, which matches the
reference's solutions to well below actuator resolution because env steps
warm-start from the previous solution and move goals by <=1 cm
(EE_POS_DELTA). Deviation, documented: the reference passes an analytic
Jacobian whose regularization rows use IK_JAC_REG=9e-3 while the residual
uses 6e-3/2e-6 (ik_mujoco.py:95-97) -- an inconsistency we do not copy; we
use the exact Jacobian of the residual via jacfwd.

The solver never calls back to the host, vmaps over arbitrary batches of
(qpos, goals), and is the inner kernel reused by the trajectory optimizers.
"""

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models.spec import RobotModel
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.utils import rotations as rot


class IKResult(NamedTuple):
    qpos: jax.Array  # (n,) solved joint positions (masked subset)
    residual_norm: jax.Array  # () final |r|
    iters_used: jax.Array  # () int


def _residual(
    model: RobotModel,
    q_masked: jax.Array,
    qpos_full: jax.Array,
    goal_pos: jax.Array,
    goal_orn: jax.Array,
    q_home: jax.Array,
    q_prev: jax.Array,
    q_mask: Tuple[int, ...],
    site_name: str,
) -> jax.Array:
    mask = jnp.asarray(q_mask)
    q_full = qpos_full.at[mask].set(q_masked)
    xpos, xquat, _ = kin.fk(model, q_full)
    ee_pos, ee_quat = kin.site_pose(model, xpos, xquat, site_name)
    res_pos = ee_pos - goal_pos
    res_quat = k.IK_RES_RAD * rot.quat_sub(goal_orn, ee_quat)
    res_prev = k.IK_RES_REG_PREV * (q_masked - q_prev)
    res_home = k.IK_RES_REG_HOME * (q_masked - q_home)
    return jnp.concatenate([res_pos, res_quat, res_prev, res_home])


def ik(
    model: RobotModel,
    qpos_full: jax.Array,
    goal_pos: jax.Array,
    goal_orn: jax.Array,
    q_pos_home_full: jax.Array,
    q_pos_prev_full: jax.Array,
    *,
    q_mask: Tuple[int, ...],
    site_name: str,
    iters: int = k.IK_MAX_ITERS,
) -> jax.Array:
    """Solve IK for the masked joints; returns the solved masked q.

    Mirrors ik() at ik_mujoco.py:100-155 including its post-solve behavior:
    the reference's "velocity limit" clip is a no-op (it clips the solution
    around itself, ik_mujoco.py:139-145) so only the joint-range clip is
    applied. Solver failure cannot occur here (no host exceptions); NaN
    guards keep the previous solution, matching the reference's
    try/except-keep-previous fallback (ik_mujoco.py:128-138).
    """
    mask = jnp.asarray(q_mask)
    lo = jnp.asarray(model.jnt_range[list(q_mask), 0], dtype=qpos_full.dtype)
    hi = jnp.asarray(model.jnt_range[list(q_mask), 1], dtype=qpos_full.dtype)
    q0 = qpos_full[mask]
    q_home = q_pos_home_full[mask]
    q_prev = q_pos_prev_full[mask]

    res_fn = partial(
        _residual,
        model,
        qpos_full=qpos_full,
        goal_pos=goal_pos,
        goal_orn=goal_orn,
        q_home=q_home,
        q_prev=q_prev,
        q_mask=q_mask,
        site_name=site_name,
    )

    n = len(q_mask)
    eye = jnp.eye(n, dtype=qpos_full.dtype)

    def body(carry, _):
        q, lam = carry
        r = res_fn(q)
        J = jax.jacfwd(res_fn)(q)
        H = J.T @ J + lam * eye
        g = J.T @ r
        dq = -jax.scipy.linalg.solve(H, g, assume_a="pos")
        q_new = jnp.clip(q + dq, lo, hi)
        # simple trust logic: shrink damping on improvement, grow otherwise
        c_old = jnp.sum(r * r)
        r_new = res_fn(q_new)
        c_new = jnp.sum(r_new * r_new)
        improved = c_new < c_old
        q = jnp.where(improved, q_new, q)
        lam = jnp.where(improved, jnp.maximum(lam * 0.5, 1e-8), lam * 4.0)
        return (q, lam), None

    (q, _), _ = jax.lax.scan(body, (q0, jnp.asarray(1e-4, dtype=q0.dtype)), None, length=iters)

    # NaN guard: keep the warm start (reference keeps previous on failure)
    q = jnp.where(jnp.isnan(q).any(), q0, q)
    # joint position limit clip (ik_mujoco.py:146-151)
    return jnp.clip(q, lo, hi)
