"""Record heuristic-policy episodes with both loggers.

Analog of /root/reference/gym_kmanip/examples/2_synthetic_data.py:27-41,
including its reach heuristic: move the right EE toward the cube by feeding
the normalized (cube_pos - eer_pos) gap as the position action
(2_synthetic_data.py:33-38).
"""

import gymnasium as gym
import numpy as np

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.ops import kinematics as kin

ENV_NAME: str = "KManipSoloArm"
NUM_EPISODES: int = 2


def heuristic_action(env, obs) -> dict:
    backend = env.unwrapped.env  # sim backend
    state = backend.state
    import jax.numpy as jnp

    xpos, xquat, _ = kin.fk(backend.model, state.qpos)
    eer_pos, _ = kin.site_pose(backend.model, xpos, xquat, "eer_site")
    gap = np.asarray(state.cube_pos) - np.asarray(eer_pos)
    act = {
        "eer_pos": np.clip(gap / (np.linalg.norm(gap) + 1e-6), -1, 1).astype(
            np.float32
        ),
        "eer_orn": np.zeros(3, dtype=np.float32),
        "grip_r": np.asarray([1.0 if np.linalg.norm(gap) > 0.05 else -1.0],
                             dtype=np.float32),
    }
    return act


def main():
    env = gym.make(ENV_NAME, log_h5py=True, log_rerun=True, log_prefix="synthetic")
    for ep in range(NUM_EPISODES):
        obs, info = env.reset()
        for _ in range(k.MAX_EPISODE_STEPS):
            obs, reward, terminated, truncated, info = env.step(
                heuristic_action(env, obs)
            )
            if terminated or truncated:
                break
        print(f"episode {ep}: final reward {reward:.3f}")
    env.close()
    print(f"episodes written under {env.unwrapped.log_dir}")


if __name__ == "__main__":
    main()
