"""Pick from pixels: grasp + lift with the cube state coming ONLY from
rendered camera frames (VERDICT r2 next #5 — beyond the closest-approach
reaching of examples/10).

Architecture (perception -> belief -> the verified state-based pick MPC):

  * a CubePosCNN estimator (mpc/vision_cost.fit_cube_pos_estimator) is
    trained self-supervised on overhead renders of random (arm, cube)
    configurations — regressing the cube's world position to ~sub-cm;
  * at control time the controller NEVER reads the plant's cube state:
    its belief holds proprioception (qpos/qvel — a real robot has
    encoders) plus a cube pose that comes from the estimator while the
    gripper is clear of the cube, and from DEAD-RECKONING through the
    controller's own dynamics model once the hand is near/occluding it
    (the cube is static on the table before contact; after contact the
    model propagates the grasp);
  * the examples/8 MPPI pick expert runs on the belief state; success is
    judged on the TRUE plant (cube >= 4 cm above spawn), which the
    controller never saw.

Run: python -m gym_kmanip_tpu.examples.14_pick_from_pixels
CI twin: tests/test_pick_from_pixels.py (slow tier).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import make_control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver
from gym_kmanip_tpu.mpc.vision_cost import fit_cube_pos_estimator
from gym_kmanip_tpu.render.raycast import render_camera

H_PX, W_PX = 64, 96
CAM = "top"
LIFT_DZ = 0.04
# hand-to-belief-cube distance below which the estimator view is treated
# as occluded and the belief switches to dead-reckoning
OCCLUDE_DIST = 0.10


def make_cost(model):
    def cost_fn(s, aux, u):
        d2 = jnp.sum((aux.tip_pos - s.cube_pos[None, :]) ** 2, axis=-1)
        touched = aux.touch_r | aux.touch_l
        return (
            50.0 * jnp.mean(d2)
            + 0.01 * jnp.sum(s.qvel**2)
            - jnp.where(touched, 5.0, 0.0)
            - jnp.where(touched & ~aux.touch_table, 10.0, 0.0)
        )

    return cost_fn


def run_episode(model, solver, mppi_state, estimate, spawn, ep_len=120,
                n_samples=256, log=print):
    """One pixels-only pick episode. Returns (lifted, est_err_m)."""
    from gym_kmanip_tpu.ops import kinematics as kin

    plant_step = make_control_step(model)  # the TRUE plant
    belief_step = make_control_step(model)  # the controller's model

    true_state = init_state(model, cube_pos=spawn)

    @jax.jit
    def observe_cube(state):
        img = render_camera(
            model, CAM, state.qpos, state.cube_pos, state.cube_quat,
            H_PX, W_PX,
        ).astype(jnp.float32) / 255.0
        return estimate(img)

    @jax.jit
    def ee_pos_of(state):
        xp, xq, _ = kin.fk(model, state.qpos)
        p, _ = kin.site_pose(model, xp, xq, "eer_site")
        return p

    # initial belief: proprioception + vision estimate, cube at rest
    est0 = observe_cube(true_state)
    est_err = float(jnp.linalg.norm(est0 - true_state.cube_pos))
    belief = true_state._replace(
        cube_pos=est0,
        cube_quat=jnp.asarray([1.0, 0, 0, 0], jnp.float32),
        cube_linvel=jnp.zeros(3, jnp.float32),
        cube_angvel=jnp.zeros(3, jnp.float32),
    )

    lifted = False
    for t in range(ep_len):
        mppi_state, u0, J = solver(mppi_state, belief)
        # advance the true plant (the controller never reads its cube)
        true_state, aux_true = plant_step(true_state, u0)
        # advance the belief through the controller's own model
        belief, aux_b = belief_step(belief, u0)
        # proprioception is ground truth (encoders); cube stays model-side
        belief = belief._replace(qpos=true_state.qpos, qvel=true_state.qvel)
        hand_dist = float(
            jnp.linalg.norm(ee_pos_of(belief) - belief.cube_pos)
        )
        if hand_dist > OCCLUDE_DIST:
            # hand clear of the cube: refresh the belief from pixels
            est = observe_cube(true_state)
            belief = belief._replace(
                cube_pos=est,
                cube_linvel=jnp.zeros(3, jnp.float32),
                cube_angvel=jnp.zeros(3, jnp.float32),
            )
        true_z = float(true_state.cube_pos[2])
        lifted = lifted or true_z > float(spawn[2]) + LIFT_DZ
        if t % 20 == 0:
            log(f"  t={t}: belief-cube err "
                f"{float(jnp.linalg.norm(belief.cube_pos - true_state.cube_pos)):.3f} m, "
                f"true cube_z={true_z:.3f}, hand_dist={hand_dist:.3f}")
    return lifted, est_err


def run(n_episodes=5, ep_len=120, n_samples=256, est_samples=512,
        est_steps=1500, seed=0, log=print):
    model = get_model("solo_arm")
    log("training cube-position estimator from renders...")
    t0 = time.time()
    _params, estimate = fit_cube_pos_estimator(
        model, jax.random.PRNGKey(seed), n_samples=est_samples,
        n_steps=est_steps, height=H_PX, width=W_PX, cam_name=CAM,
    )
    log(f"estimator trained in {time.time() - t0:.1f}s")

    cfg = MPPIConfig(
        horizon=20, n_samples=n_samples, n_iters=2, sigma=0.15,
        n_substeps=10, dt=k.PHYSICS_TIMESTEP, noise_beta=0.9,
    )
    solver = make_mppi_solver(model, cfg, make_cost(model))
    mppi_state = init_mppi(model, cfg)

    rng = np.random.RandomState(seed + 1)
    spawn_lo = k.CUBE_SPAWN_RANGE[:, 0]
    spawn_hi = k.CUBE_SPAWN_RANGE[:, 1]
    n_lift, errs = 0, []
    for ep in range(n_episodes):
        spawn = np.array([0.15, 0.58, 0.62]) + rng.uniform(-1, 1, 3) * np.array(
            [0.02, 0.02, 0.0]
        )
        spawn = np.clip(spawn, spawn_lo, spawn_hi)
        lifted, est_err = run_episode(
            model, solver, mppi_state, estimate, spawn, ep_len=ep_len,
            n_samples=n_samples, log=log,
        )
        n_lift += int(lifted)
        errs.append(est_err)
        log(f"episode {ep}: lifted={lifted} (initial estimate err "
            f"{est_err * 100:.1f} cm, spawn {spawn.round(3)})")
    return n_lift / n_episodes, float(np.mean(errs))


def main():
    rate, est_err = run()
    print(json.dumps({"metric": "pixels_pick_success_rate", "value": rate,
                      "unit": "fraction", "vs_baseline": rate}))
    print(json.dumps({"metric": "cube_estimator_err_m", "value": est_err,
                      "unit": "m", "vs_baseline": est_err / 0.01}))


if __name__ == "__main__":
    main()
