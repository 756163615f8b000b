"""Experiment: does LM driven by the reference's INCONSISTENT analytic
Jacobian (ik_mujoco.py:56-97: reg rows at IK_JAC_REG=9e-3 while the residual
uses 6e-3/2e-6) reproduce scipy-TRF's fixed point?

Compares over a 20-step receding-goal sequence (the env regime):
  A. scipy TRF + reference-style wrong Jacobian  (what the reference DOES)
  B. scipy TRF + exact jacfwd Jacobian           (round-1 oracle)
  C. our LM + wrong Jacobian                     (proposed round-2 solver)
"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"

from functools import partial

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from scipy.optimize import least_squares

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.solvers.ik import _residual
from gym_kmanip_tpu.utils import rotations as rot

MODEL = get_model("solo_arm")
Q_MASK = tuple(int(i) for i in k.Q_ID_R_MASK_SOLO)
MASK = jnp.asarray(Q_MASK)
SITE = "eer_site"


def ee_pose(q_full):
    xpos, xquat, _ = kin.fk(MODEL, q_full)
    return kin.site_pose(MODEL, xpos, xquat, SITE)


def quat_from_tangent(e):
    # MuJoCo local tangent convention: q' = q o exp([0, e/2])
    angle = jnp.sqrt(jnp.sum(e * e) + 1e-24)
    axis = e / angle
    half = 0.5 * angle
    return jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])


def subquat_jac_b(qa, qb):
    """Db = d subQuat(qa, qb o exp(e/2)) / de at e=0 (mjd_subQuat's Db)."""
    f = lambda e: rot.quat_sub(qa, rot.quat_mul(qb, quat_from_tangent(e)))
    return jax.jacfwd(f)(jnp.zeros(3, dtype=qa.dtype))


def ref_jacobian(q_masked, qpos_full, goal_orn):
    """Replicates ik_jac (ik_mujoco.py:56-97) including its quirks:
    reg rows = IK_JAC_REG * I (both blocks), quat rows = rad * D_ee.T @ R.T @ jacr.
    """
    q_full = qpos_full.at[MASK].set(q_masked)
    xpos, xquat, axis_w = kin.fk(MODEL, q_full)
    s = MODEL.site(SITE)
    ee_pos, ee_quat = kin.site_pose(MODEL, xpos, xquat, SITE)
    jacp, jacr = kin.point_jacobian(MODEL, xpos, axis_w, ee_pos, s.parent)
    R = rot.quat_to_mat(ee_quat)
    Db = subquat_jac_b(goal_orn, ee_quat)
    mat = k.IK_JAC_RAD * Db.T @ R.T  # reference quirk: Db.T, R named "target_mat"
    jac_quat = mat @ jacr
    n = len(Q_MASK)
    jac_reg = k.IK_JAC_REG * jnp.eye(n, dtype=q_masked.dtype)
    return jnp.vstack([jacp[:, MASK], jac_quat[:, MASK], jac_reg, jac_reg])


def lm_wrong_jac(q0, res_fn, jac_fn, lo, hi, iters=20):
    q = q0
    lam = 1e-4
    for _ in range(iters):
        r = res_fn(q)
        J = jac_fn(q)
        g = J.T @ r
        H = J.T @ J
        for _ in range(8):
            dq = -jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), g)
            q_new = jnp.clip(q + dq, lo, hi)
            if float(jnp.sum(res_fn(q_new) ** 2)) < float(jnp.sum(r**2)):
                q = q_new
                lam = max(lam * 0.5, 1e-8)
                break
            lam *= 4.0
    return q


def newton_on_gradient(q0, res_fn, jac_fn, lo, hi, iters=20):
    """Treat scipy-TRF's fixed point g(q)=J_w(q)^T r(q)=0 as a root-finding
    problem: Gauss-Newton steps on g, accepted on |g| decrease."""
    q = q0
    lam = 1e-6

    def grad(qq):
        r = res_fn(qq)
        J = jac_fn(qq)
        return J.T @ r, J

    g, J = grad(q)
    gn = float(jnp.sum(g * g))
    for _ in range(iters):
        H = J.T @ J
        accepted = False
        for _ in range(8):
            dq = -jnp.linalg.solve(H + lam * jnp.eye(H.shape[0]), g)
            q_new = jnp.clip(q + dq, lo, hi)
            g_new, J_new = grad(q_new)
            gn_new = float(jnp.sum(g_new * g_new))
            if gn_new < gn:
                q, g, J, gn = q_new, g_new, J_new, gn_new
                lam = max(lam * 0.5, 1e-9)
                accepted = True
                break
            lam *= 4.0
        if not accepted or gn < 1e-22:
            break
    return q


def main():
    q_full = jnp.asarray(MODEL.home_qpos, dtype=jnp.float32)
    lo = MODEL.jnt_range[list(Q_MASK), 0]
    hi = MODEL.jnt_range[list(Q_MASK), 1]
    rng = np.random.RandomState(0)

    states = {"A": q_full, "B": q_full, "C": q_full, "D": q_full}
    prevs = {kk: q_full for kk in states}
    p0, quat0 = ee_pose(q_full)
    goal = np.asarray(p0)

    max_ab = max_ac = max_ad = 0.0
    for t in range(20):
        goal = goal + rng.uniform(-1, 1, 3) * k.EE_POS_DELTA
        g = jnp.asarray(goal, dtype=jnp.float32)
        sols = {}
        for key in ("A", "B", "C", "D"):
            qf = states[key]
            res_fn = partial(
                _residual, MODEL, qpos_full=qf, goal_pos=g, goal_orn=quat0,
                q_home=q_full[MASK], q_prev=prevs[key][MASK],
                q_mask=Q_MASK, site_name=SITE,
            )
            np_res = lambda q: np.asarray(res_fn(jnp.asarray(q, jnp.float32)), np.float64)
            if key == "A":
                jf = lambda q: np.asarray(
                    ref_jacobian(jnp.asarray(q, jnp.float32), qf, quat0), np.float64)
                r = least_squares(np_res, np.asarray(qf)[list(Q_MASK)], jac=jf,
                                  bounds=(lo, hi))
                sols[key] = r.x
            elif key == "B":
                jac_exact = jax.jacfwd(res_fn)
                jf = lambda q: np.asarray(jac_exact(jnp.asarray(q, jnp.float32)), np.float64)
                r = least_squares(np_res, np.asarray(qf)[list(Q_MASK)], jac=jf,
                                  bounds=(lo, hi))
                sols[key] = r.x
            elif key == "C":
                jfn = lambda q: ref_jacobian(q, qf, quat0)
                sols[key] = np.asarray(
                    lm_wrong_jac(qf[MASK], res_fn, jfn, jnp.asarray(lo, jnp.float32),
                                 jnp.asarray(hi, jnp.float32)))
            else:
                jfn = lambda q: ref_jacobian(q, qf, quat0)
                sols[key] = np.asarray(
                    newton_on_gradient(qf[MASK], res_fn, jfn,
                                       jnp.asarray(lo, jnp.float32),
                                       jnp.asarray(hi, jnp.float32)))
            prevs[key] = states[key]
            states[key] = states[key].at[MASK].set(jnp.asarray(sols[key], jnp.float32))
        dab = np.abs(sols["A"] - sols["B"]).max()
        dac = np.abs(sols["A"] - sols["C"]).max()
        dad = np.abs(sols["A"] - sols["D"]).max()
        max_ab = max(max_ab, dab)
        max_ac = max(max_ac, dac)
        max_ad = max(max_ad, dad)
        print(f"t={t:2d}  |A-B|={dab:.2e}  |A-C|={dac:.2e}  |A-D|={dad:.2e}")

    print(f"\ncumulative max: |A-B| (ref vs exact-jac TRF) = {max_ab:.2e}")
    print(f"cumulative max: |A-C| (ref vs our LM+wrongJ)  = {max_ac:.2e}")
    print(f"cumulative max: |A-D| (ref vs Newton-on-grad) = {max_ad:.2e}")


if __name__ == "__main__":
    main()
