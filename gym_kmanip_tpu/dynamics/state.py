"""Simulation state pytree.

The whole world state is a flat NamedTuple of arrays so it vmaps/shards over
rollout batches for free. This replaces the reference's mutable
`physics.data` (MuJoCo mjData reached via dm_control, env_sim.py:196-210)
with an immutable functional state threaded through `lax.scan`.

Cube free-body state is kept split (pos/quat/linvel/angvel) rather than
packed into a 7+6 qpos/qvel tail the way MuJoCo lays it out
(env_sim.py:131,139 reads `qpos[-7:]`); the env layer reassembles the
MuJoCo-shaped views where API parity requires them.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models.spec import RobotModel


class SimState(NamedTuple):
    qpos: jax.Array  # (nq,) robot joint positions
    qvel: jax.Array  # (nq,) robot joint velocities
    ctrl: jax.Array  # (nu,) last applied actuator targets
    cube_pos: jax.Array  # (3,) world
    cube_quat: jax.Array  # (4,) wxyz
    cube_linvel: jax.Array  # (3,) world
    cube_angvel: jax.Array  # (3,) world
    time: jax.Array  # () seconds


class StepAux(NamedTuple):
    """Per-control-step diagnostics (evaluated at the final substep), the
    functional analog of scanning `physics.data.contact` + named xpos reads
    in the reference reward (env_sim.py:148-179)."""

    touch_r: jax.Array  # () bool: any right fingertip touching the cube
    touch_l: jax.Array  # () bool: any left fingertip touching the cube
    touch_table: jax.Array  # () bool: cube touching the table
    site_pos: jax.Array  # (n_sites, 3) world EE-site positions
    site_quat: jax.Array  # (n_sites, 4)
    qfrc_contact: jax.Array  # (nq,) contact torques on the robot
    tip_pos: jax.Array  # (T, 3) world fingertip sphere centers


def init_state(model: RobotModel, cube_pos=None, cube_quat=None) -> SimState:
    """Home-pose state, the analog of KManipTask.initialize_episode
    (env_sim.py:23-36): qpos/ctrl <- home, qvel <- 0, cube at spawn pose."""
    if cube_pos is None:
        cube_pos = k.CUBE_INIT_POS
    if cube_quat is None:
        cube_quat = np.array([1.0, 0, 0, 0])
    f = jnp.float32
    return SimState(
        qpos=jnp.asarray(model.home_qpos, dtype=f),
        qvel=jnp.zeros(model.nq, dtype=f),
        ctrl=jnp.asarray(model.home_qpos[: model.nu], dtype=f),
        cube_pos=jnp.asarray(cube_pos, dtype=f),
        cube_quat=jnp.asarray(cube_quat, dtype=f),
        cube_linvel=jnp.zeros(3, dtype=f),
        cube_angvel=jnp.zeros(3, dtype=f),
        time=jnp.zeros((), dtype=f),
    )
