"""Sampling MPC (MPPI) on the cube-pick task -- the TPU-first flagship.

No reference analog (gym-kmanip has no MPC; SURVEY.md §2.4): this is the
BASELINE north-star workload. Runs receding-horizon MPPI with K rollouts
per solve against the full-fidelity env dynamics, optionally sharded over
every local chip via the ('rollout',) mesh.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import make_control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.parallel.mesh import make_mesh, make_sharded_mppi_solver

HORIZON = 30
N_SAMPLES = 256
N_CONTROL_STEPS = 50
SHARDED = len(jax.devices()) > 1


def main():
    model = get_model("solo_arm")
    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(model, s, aux, u, params)
    cfg = MPPIConfig(horizon=HORIZON, n_samples=N_SAMPLES, n_iters=1)
    if SHARDED:
        mesh = make_mesh()
        print(f"sharding {N_SAMPLES} rollouts over {mesh.devices.size} devices")
        solver = make_sharded_mppi_solver(model, cfg, cost_fn, mesh)
    else:
        solver = make_mppi_solver(model, cfg, cost_fn)

    plant_step = make_control_step(model)  # full-fidelity plant (10 substeps)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model)

    # warm-up compile
    mppi_state, u0, J = solver(mppi_state, sim_state)
    jax.block_until_ready(u0)

    t0 = time.time()
    for i in range(N_CONTROL_STEPS):
        mppi_state, u0, J = solver(mppi_state, sim_state)
        sim_state, aux = plant_step(sim_state, u0)
        if i % 10 == 0:
            ee = aux.site_pos[model.site_index("eer_site")]
            dist = float(jnp.linalg.norm(sim_state.cube_pos - ee))
            print(
                f"step {i}: expected cost {float(J):.3f}, ee-cube dist {dist:.3f} m, "
                f"touch_r={bool(aux.touch_r)}"
            )
    wall = time.time() - t0
    print(
        f"{N_CONTROL_STEPS} MPC solves + plant steps in {wall:.2f}s "
        f"({N_CONTROL_STEPS / wall:.1f} Hz control rate)"
    )


if __name__ == "__main__":
    main()
