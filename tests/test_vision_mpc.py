"""Vision-in-the-loop MPC must move the REAL arm toward the cube.

VERDICT r1 item 7: learned-cost descent alone proves nothing — this drives
the full loop at CPU-sized shapes: fit the distance CNN from on-device
renders (top camera — the grip cam's fovy-20 view loses the cube entirely
when the arm is displaced), run MPPI whose every rollout step renders the
camera, step the REAL plant (full-fidelity contact dynamics) with the
solver's controls, and assert the TRUE fingertip-cube distance closes.

The assertion is on the closest approach: the learned landscape's minimum
sits near but not exactly at the cube, so the loop overshoots once it
arrives (measured: 0.22 -> 0.07 m by step ~4, rising after) — the claim
vision-MPC earns is "the arm reaches the cube neighborhood from pixels
alone", not millimeter station-keeping.
"""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.mpc.vision_cost import fit_distance_cost, make_vision_cost

H_PX, W_PX = 48, 64  # enough for the ~2-4 px cube/EE signal from the top cam


@pytest.mark.slow
def test_vision_mpc_reduces_true_distance():
    model = get_model("solo_arm")
    params = fit_distance_cost(
        model, jax.random.PRNGKey(0), n_samples=256, n_steps=1200,
        height=H_PX, width=W_PX, cam_name="top",
    )
    cost_fn = make_vision_cost(
        model, params, cam_name="top", height=H_PX, width=W_PX, w_vel=0.001
    )

    # horizon long enough that moving beats the velocity penalty (a short
    # horizon is locally optimal at rest, see test_mppi_improves_bad_nominal)
    cfg = MPPIConfig(
        horizon=20, n_samples=16, n_iters=1, sigma=0.12, noise_beta=0.9,
        contact=False,
    )
    solver = make_mppi_solver(model, cfg, cost_fn)
    mppi_state = init_mppi(model, cfg)
    state = init_state(model, cube_pos=np.array([0.15, 0.58, 0.62]))
    # start the arm DISPLACED from home (base joint swung away, EE-cube
    # distance 0.22 vs 0.14 at home) so there is genuine room to descend
    lo = jnp.asarray(model.jnt_range[:, 0], dtype=jnp.float32)
    hi = jnp.asarray(model.jnt_range[:, 1], dtype=jnp.float32)
    q_off = jnp.clip(
        jnp.asarray(model.home_qpos, dtype=jnp.float32).at[0].add(-0.5), lo, hi
    )
    state = state._replace(qpos=q_off, ctrl=q_off[: model.nu])
    mppi_state = mppi_state._replace(
        nominal=jnp.tile(q_off[: model.nu], (cfg.horizon, 1))
    )

    def true_dist(aux, state):
        return float(
            jnp.linalg.norm(aux.tip_pos - state.cube_pos[None, :], axis=-1).min()
        )

    _, aux0 = control_step(model, state, state.ctrl)
    d0 = true_dist(aux0, state)
    dists = []
    for _ in range(6):
        mppi_state, u0, J = solver(mppi_state, state)
        state, aux = control_step(model, state, u0)
        dists.append(true_dist(aux, state))
    assert all(np.isfinite(d) for d in dists)
    # the learned vision cost must pull the REAL gripper into the cube's
    # neighborhood (closest approach well below the start distance)
    assert min(dists) < d0 - 0.05, (d0, dists)
