"""IK solver tests: goal tracking, scipy-TRF oracle parity, batching.

The reference solves the same residual with scipy.optimize.least_squares
(ik_mujoco.py:129-135); here scipy (driven by OUR residual/Jacobian) is the
adaptive-solver oracle that the fixed-budget LM must match.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.solvers.ik import _residual, ik
from gym_kmanip_tpu.utils import rotations as rot

Q_MASK = tuple(int(i) for i in k.Q_ID_R_MASK_SOLO)


@pytest.fixture(scope="module")
def solo():
    return get_model("solo_arm")


def _ee_pose(model, q_full):
    xpos, xquat, _ = kin.fk(model, jnp.asarray(q_full, dtype=jnp.float32))
    return kin.site_pose(model, xpos, xquat, "eer_site")


def test_ik_reaches_nearby_goal(solo):
    q0 = jnp.asarray(solo.home_qpos, dtype=jnp.float32)
    p0, quat0 = _ee_pose(solo, q0)
    goal = p0 + jnp.array([0.01, -0.01, 0.01])
    q_sol = ik(
        solo, q0, goal, quat0, q0, q0, q_mask=Q_MASK, site_name="eer_site"
    )
    q_full = q0.at[jnp.asarray(Q_MASK)].set(q_sol)
    p1, _ = _ee_pose(solo, q_full)
    assert float(jnp.linalg.norm(p1 - goal)) < 1.5e-3


def test_ik_tracks_goal_sequence(solo):
    """Receding 1 cm goal steps (the env's EE_POS_DELTA regime) stay locked."""
    q_full = jnp.asarray(solo.home_qpos, dtype=jnp.float32)
    q_prev = q_full
    p, quat0 = _ee_pose(solo, q_full)
    rng = np.random.RandomState(0)
    for _ in range(10):
        goal = p + jnp.asarray(rng.uniform(-1, 1, 3) * k.EE_POS_DELTA)
        q_sol = ik(
            solo, q_full, goal, quat0, jnp.asarray(solo.home_qpos, dtype=jnp.float32),
            q_prev, q_mask=Q_MASK, site_name="eer_site",
        )
        q_prev = q_full
        q_full = q_full.at[jnp.asarray(Q_MASK)].set(q_sol)
        p, _ = _ee_pose(solo, q_full)
        assert float(jnp.linalg.norm(p - goal)) < 2e-3


def test_ik_matches_scipy_trf(solo):
    """Fixed-budget LM vs scipy adaptive TRF on the same residual."""
    from scipy.optimize import least_squares

    q0 = jnp.asarray(solo.home_qpos, dtype=jnp.float32)
    p0, quat0 = _ee_pose(solo, q0)
    rng = np.random.RandomState(1)
    for _ in range(3):
        goal = p0 + jnp.asarray(rng.uniform(-1, 1, 3) * 0.02)
        res_fn = partial(
            _residual,
            solo,
            qpos_full=q0,
            goal_pos=goal,
            goal_orn=quat0,
            q_home=q0[jnp.asarray(Q_MASK)],
            q_prev=q0[jnp.asarray(Q_MASK)],
            q_mask=Q_MASK,
            site_name="eer_site",
        )
        np_res = lambda q: np.asarray(res_fn(jnp.asarray(q, dtype=jnp.float32)), dtype=np.float64)
        # scipy needs the analytic Jacobian: finite differences at its default
        # step are pure noise against a float32 residual
        jac_fn = jax.jacfwd(res_fn)
        np_jac = lambda q: np.asarray(jac_fn(jnp.asarray(q, dtype=jnp.float32)), dtype=np.float64)
        lo = solo.jnt_range[list(Q_MASK), 0]
        hi = solo.jnt_range[list(Q_MASK), 1]
        ref = least_squares(
            np_res, np.asarray(q0)[list(Q_MASK)], jac=np_jac, bounds=(lo, hi)
        )
        ours = ik(solo, q0, goal, quat0, q0, q0, q_mask=Q_MASK, site_name="eer_site")
        # match within well below actuator resolution (SURVEY.md hard part 2)
        np.testing.assert_allclose(np.asarray(ours), ref.x, atol=2e-3)


def test_ik_vmap_batch(solo):
    q0 = jnp.asarray(solo.home_qpos, dtype=jnp.float32)
    p0, quat0 = _ee_pose(solo, q0)
    B = 8
    rng = np.random.RandomState(2)
    goals = p0 + jnp.asarray(rng.uniform(-1, 1, (B, 3)) * 0.02, dtype=jnp.float32)
    solve = jax.jit(
        jax.vmap(
            lambda g: ik(
                solo, q0, g, quat0, q0, q0, q_mask=Q_MASK, site_name="eer_site"
            )
        )
    )
    qs = solve(goals)
    assert qs.shape == (B, len(Q_MASK))
    for i in range(B):
        q_full = q0.at[jnp.asarray(Q_MASK)].set(qs[i])
        p, _ = _ee_pose(solo, q_full)
        assert float(jnp.linalg.norm(p - goals[i])) < 2e-3


def test_ik_respects_joint_limits(solo):
    q0 = jnp.asarray(solo.home_qpos, dtype=jnp.float32)
    _, quat0 = _ee_pose(solo, q0)
    # unreachable goal far outside the workspace
    goal = jnp.array([5.0, 5.0, 5.0])
    q_sol = ik(solo, q0, goal, quat0, q0, q0, q_mask=Q_MASK, site_name="eer_site")
    lo = solo.jnt_range[list(Q_MASK), 0]
    hi = solo.jnt_range[list(Q_MASK), 1]
    assert np.all(np.asarray(q_sol) >= lo - 1e-6)
    assert np.all(np.asarray(q_sol) <= hi + 1e-6)
    assert not np.any(np.isnan(np.asarray(q_sol)))


def test_ik_trf_tracks_scipy_sequence(solo):
    """The env-path TRF solver (solvers/trf.py) must track scipy's
    least_squares SOLUTIONS across a 20-step receding-goal sequence, warm
    starts and all — including trust-radius-collapse early exits, where a
    plain LM lands elsewhere on the redundant-arm manifold. Both solvers
    use the reference's analytic (deliberately inconsistent) Jacobian
    (ik_mujoco.py:56-97). Float32 accumulates a few 1e-4 rad of roundoff
    divergence; the f64 port is bit-exact (tools/exp_trf_replica.py)."""
    from scipy.optimize import least_squares

    from gym_kmanip_tpu.solvers.ik import ik_trf, reference_jacobian

    f = jnp.float32
    q_scipy = jnp.asarray(solo.home_qpos, dtype=f)
    q_ours = q_scipy
    prev_scipy = q_scipy
    prev_ours = q_ours
    p0, quat0 = _ee_pose(solo, q_scipy)
    goal = np.asarray(p0)
    lo = solo.jnt_range[list(Q_MASK), 0]
    hi = solo.jnt_range[list(Q_MASK), 1]
    solve = jax.jit(partial(ik_trf, solo, q_mask=Q_MASK, site_name="eer_site"))
    q_home = jnp.asarray(solo.home_qpos, dtype=f)

    rng = np.random.RandomState(0)
    worst = 0.0
    for _ in range(20):
        goal = goal + rng.uniform(-1, 1, 3) * k.EE_POS_DELTA
        g = jnp.asarray(goal, dtype=f)
        res_fn = partial(
            _residual, solo, qpos_full=q_scipy, goal_pos=g, goal_orn=quat0,
            q_home=q_home[jnp.asarray(Q_MASK)],
            q_prev=prev_scipy[jnp.asarray(Q_MASK)],
            q_mask=Q_MASK, site_name="eer_site",
        )
        np_res = lambda q: np.asarray(res_fn(jnp.asarray(q, f)), np.float64)
        np_jac = lambda q: np.asarray(
            reference_jacobian(solo, jnp.asarray(q, f), q_scipy, quat0,
                               Q_MASK, "eer_site"), np.float64)
        ref = least_squares(np_res, np.asarray(q_scipy)[list(Q_MASK)],
                            jac=np_jac, bounds=(lo, hi))
        q_sol, _ = solve(q_ours, g, quat0, q_home, prev_ours)
        worst = max(worst, float(np.abs(ref.x - np.asarray(q_sol)).max()))
        prev_scipy, prev_ours = q_scipy, q_ours
        q_scipy = q_scipy.at[jnp.asarray(Q_MASK)].set(jnp.asarray(ref.x, f))
        q_ours = q_ours.at[jnp.asarray(Q_MASK)].set(q_sol)
    # cumulative (each solver warm-starts from its OWN trajectory)
    assert worst < 1e-3, f"TRF diverged from scipy: {worst:.2e} rad"
