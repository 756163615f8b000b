"""iLQR trajectory optimization for EE goal reaching.

No reference analog (SURVEY.md §2.4). Solves a horizon-H EE tracking
problem with the full articulated dynamics, then executes the plan
open-loop on the full-fidelity plant and reports the tracking error
(the BASELINE "EE tracking error" metric).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import make_control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.solvers.ilqr import (
    ILQRConfig,
    ilqr_solve,
    make_ilqr_solver,
    unflatten_state,
)

HORIZON = 40


def main():
    model = get_model("solo_arm")
    state0 = init_state(model)

    # goal: 6 cm toward the cube spawn center from the home EE pose
    xpos, xquat, _ = kin.fk(model, state0.qpos)
    ee0, _ = kin.site_pose(model, xpos, xquat, "eer_site")
    goal = jnp.asarray(ee0) + jnp.asarray([0.0, 0.04, -0.04])

    nq = model.nq

    def cost_xu(x, u):
        s = unflatten_state(model, x, state0)
        xp, xq, _ = kin.fk(model, s.qpos)
        ee, _ = kin.site_pose(model, xp, xq, "eer_site")
        return (
            100.0 * jnp.sum((ee - goal) ** 2)
            + 0.01 * jnp.sum(s.qvel**2)
            + 1e-3 * jnp.sum((u - s.qpos[: model.nu]) ** 2)
        )

    cfg = ILQRConfig(horizon=HORIZON, n_iters=8)
    solver = make_ilqr_solver(model, cfg, cost_xu)
    u_init = jnp.tile(jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (HORIZON, 1))

    t0 = time.time()
    result = solver(state0, u_init)
    jax.block_until_ready(result.us)
    print(f"iLQR solve (compile+run): {time.time()-t0:.1f}s")
    print("cost trace:", np.asarray(result.cost_trace).round(3))

    # execute on the full-fidelity plant
    plant_step = make_control_step(model)
    s = state0
    for t in range(HORIZON):
        s, aux = plant_step(s, result.us[t])
    ee_f = aux.site_pos[model.site_index("eer_site")]
    err = float(jnp.linalg.norm(ee_f - goal))
    print(f"final EE tracking error on plant: {err*1000:.1f} mm")


if __name__ == "__main__":
    main()
