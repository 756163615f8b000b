"""BASELINE configs 3+4: DualArm bimanual reach MPC and Torso full-body iLQR.

- DualArm: coordinated two-goal EE reach via MPPI with the box joint-limit
  constraints enforced by ctrlrange projection inside the solver (the QP
  trust region of SURVEY.md §2.4 reduces to box projection for
  position-servo targets).
- Torso (2dof head + two 6dof arms + grippers, 20 dof, 53-dim state):
  full-body iLQR at H=100 with a contact-aware smooth cost.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.cost import ee_tracking_cost
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.solvers.ilqr import ILQRConfig, make_ilqr_solver, unflatten_state


def dual_arm_bimanual():
    model = get_model("dual_arm")
    s0 = init_state(model)
    xp, xq, _ = kin.fk(model, s0.qpos)
    eer, _ = kin.site_pose(model, xp, xq, "eer_site")
    eel, _ = kin.site_pose(model, xp, xq, "eel_site")
    goal_r = eer + jnp.asarray([0.0, 0.03, -0.03])
    goal_l = eel + jnp.asarray([0.0, 0.03, -0.03])

    def cost_fn(s, aux, u):
        ir = model.site_index("eer_site")
        il = model.site_index("eel_site")
        return (
            100.0 * jnp.sum((aux.site_pos[ir] - goal_r) ** 2)
            + 100.0 * jnp.sum((aux.site_pos[il] - goal_l) ** 2)
            + 0.01 * jnp.sum(s.qvel**2)
        )

    cfg = MPPIConfig(horizon=20, n_samples=128, n_iters=1, contact=False)
    solver = make_mppi_solver(model, cfg, cost_fn)
    st = init_mppi(model, cfg)
    st, u0, J = solver(st, s0)
    jax.block_until_ready(u0)
    t0 = time.time()
    for _ in range(10):
        st, u0, J = solver(st, s0)
    jax.block_until_ready(u0)
    print(f"dual-arm bimanual MPPI: {(time.time()-t0)/10*1000:.0f} ms/solve, J={float(J):.3f}")
    lo, hi = model.ctrl_range[:, 0], model.ctrl_range[:, 1]
    assert np.all(np.asarray(u0) >= lo - 1e-6) and np.all(np.asarray(u0) <= hi + 1e-6)
    print("joint-limit box constraints satisfied on u0")


def torso_ilqr(horizon: int = 100):
    model = get_model("torso")
    s0 = init_state(model)
    xp, xq, _ = kin.fk(model, s0.qpos)
    eer, _ = kin.site_pose(model, xp, xq, "eer_site")
    goal = eer + jnp.asarray([0.0, 0.04, -0.03])

    def cost_xu(x, u):
        s = unflatten_state(model, x, s0)
        xp2, xq2, _ = kin.fk(model, s.qpos)
        ee, _ = kin.site_pose(model, xp2, xq2, "eer_site")
        # contact-aware smooth term: keep the cube undisturbed
        cube_pen = jnp.sum((s.cube_pos - s0.cube_pos) ** 2)
        return (
            100.0 * jnp.sum((ee - goal) ** 2)
            + 10.0 * cube_pen
            + 0.01 * jnp.sum(s.qvel**2)
            + 1e-3 * jnp.sum((u - s.qpos[: model.nu]) ** 2)
        )

    cfg = ILQRConfig(horizon=horizon, n_iters=5)
    solver = make_ilqr_solver(model, cfg, cost_xu)
    u_init = jnp.tile(jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (horizon, 1))
    t0 = time.time()
    res = solver(s0, u_init)
    jax.block_until_ready(res.us)
    print(
        f"torso iLQR H={horizon} (20 dof, 53-dim state): compile+solve "
        f"{time.time()-t0:.1f}s, cost {np.asarray(res.cost_trace).round(2)}"
    )


if __name__ == "__main__":
    dual_arm_bimanual()
    torso_ilqr()
