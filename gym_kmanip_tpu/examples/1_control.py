"""Sinusoidal control sweep.

Analog of /root/reference/gym_kmanip/examples/1_control.py:24-33: a policy
that drives every action channel with a phase-shifted sine wave.
"""

import gymnasium as gym
import numpy as np

import gym_kmanip_tpu  # noqa: F401

ENV_NAME: str = "KManipSoloArmQPos"
# ENV_NAME: str = "KManipDualArmQPos"
NUM_STEPS: int = 64


def policy(t: float, action_space) -> dict:
    action = {}
    for i, (name, space) in enumerate(action_space.spaces.items()):
        phase = t * 2 * np.pi + i * np.pi / 4
        action[name] = (np.sin(phase) * np.ones(space.shape)).astype(space.dtype)
    return action


def main():
    env = gym.make(ENV_NAME)
    env.reset(seed=0)
    for i in range(NUM_STEPS):
        obs, reward, terminated, truncated, info = env.step(
            policy(i / NUM_STEPS, env.action_space)
        )
        print(f"step {i}: reward={reward:.4f} sim_time={info['sim_time']:.2f}")
        if terminated or truncated:
            break
    env.close()


if __name__ == "__main__":
    main()
