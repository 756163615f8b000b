"""Vision MPC: rendered grip-cam obs feeding a learned-cost MPPI solve.

BASELINE config 5. The cost CNN is first fit to regress true EE-cube
distance from rendered frames (self-supervised), then drives MPPI where
every rollout step renders the gripper camera on-device. The closed-loop
phase steps the REAL plant (full-fidelity contact step) with the solver's
controls and reports the TRUE fingertip-cube distance — the learned cost
must move the physical arm toward the cube, not just descend on itself.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import make_control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.mpc.vision_cost import fit_distance_cost, make_vision_cost

HORIZON = 10
N_SAMPLES = 64
N_SOLVES = 5
N_CLOSED_LOOP = 40


def true_tip_cube_dist(aux, state) -> float:
    return float(
        jnp.linalg.norm(aux.tip_pos - state.cube_pos[None, :], axis=-1).min()
    )


def main():
    model = get_model("solo_arm")
    print("fitting distance cost CNN from rendered frames...")
    # top camera: the grip cam's narrow fovy loses the cube entirely when
    # the arm is displaced; the overhead view keeps both in frame
    params = fit_distance_cost(
        model, jax.random.PRNGKey(0), n_samples=256, n_steps=1200,
        cam_name="top", height=48, width=64,
    )
    cost_fn = make_vision_cost(model, params, cam_name="top", height=48, width=64)

    cfg = MPPIConfig(horizon=HORIZON, n_samples=N_SAMPLES, n_iters=1, noise_beta=0.9)
    solver = make_mppi_solver(model, cfg, cost_fn)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model, cube_pos=np.array([0.15, 0.58, 0.62]))

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

    # ---- closed loop against the real plant ----
    plant_step = make_control_step(model)
    _, aux0 = plant_step(sim_state, u0)
    d0 = true_tip_cube_dist(aux0, sim_state)
    dist = d0
    for i in range(N_CLOSED_LOOP):
        mppi_state, u0, J = solver(mppi_state, sim_state)
        sim_state, aux = plant_step(sim_state, u0)
        dist = true_tip_cube_dist(aux, sim_state)
        if i % 10 == 0:
            print(f"closed-loop step {i}: TRUE tip-cube dist {dist:.3f} m")
    print(
        f"closed loop: true tip-cube distance {d0:.3f} -> {dist:.3f} m "
        f"({'REDUCED' if dist < d0 else 'NOT reduced'})"
    )


if __name__ == "__main__":
    main()
