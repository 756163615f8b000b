"""Vision MPC: rendered grip-cam obs feeding a learned-cost MPPI solve.

BASELINE config 5. The cost CNN is first fit to regress true EE-cube
distance from rendered frames (self-supervised), then drives MPPI where
every rollout step renders the gripper camera on-device.
"""

import time

import jax
import jax.numpy as jnp

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.mpc.vision_cost import fit_distance_cost, make_vision_cost

HORIZON = 10
N_SAMPLES = 32
N_SOLVES = 5


def main():
    model = get_model("solo_arm")
    print("fitting distance cost CNN from rendered frames...")
    params = fit_distance_cost(model, jax.random.PRNGKey(0), n_samples=128, n_steps=100)
    cost_fn = make_vision_cost(model, params)

    cfg = MPPIConfig(horizon=HORIZON, n_samples=N_SAMPLES, n_iters=1)
    solver = make_mppi_solver(model, cfg, cost_fn)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model)

    mppi_state, u0, J = solver(mppi_state, sim_state)  # compile
    jax.block_until_ready(u0)
    t0 = time.time()
    for i in range(N_SOLVES):
        mppi_state, u0, J = solver(mppi_state, sim_state)
        print(f"solve {i}: learned cost {float(J):.4f}")
    jax.block_until_ready(u0)
    per = (time.time() - t0) / N_SOLVES
    renders = N_SAMPLES * HORIZON
    print(
        f"{per*1000:.0f} ms/solve with {renders} on-device renders+CNN evals "
        f"per solve ({renders/per:.0f} renders/s)"
    )


if __name__ == "__main__":
    main()
