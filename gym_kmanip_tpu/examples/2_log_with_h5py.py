"""Record random-action episodes to HDF5 (ACT/LeRobot layout).

Analog of /root/reference/gym_kmanip/examples/2_log_with_h5py.py.
"""

import gymnasium as gym

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k

ENV_NAME: str = "KManipSoloArm"
NUM_EPISODES: int = 2


def main():
    env = gym.make(ENV_NAME, log_h5py=True, log_prefix="h5py_test")
    for _ in range(NUM_EPISODES):
        env.reset()
        for _ in range(k.MAX_EPISODE_STEPS):
            obs, reward, terminated, truncated, info = env.step(
                env.action_space.sample()
            )
            if terminated or truncated:
                break
    env.close()
    print(f"episodes written under {env.unwrapped.log_dir}")


if __name__ == "__main__":
    main()
