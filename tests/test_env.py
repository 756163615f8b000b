"""Env conformance tests.

Mirrors the reference's single test file (tests/test_env.py:8-23: gym.make +
gymnasium env_checker over all 8 registered ids) and extends it with
behavioral checks the reference lacks (SURVEY.md §4): obs normalization
bounds, reward shape, determinism under seeding, episode truncation.
"""

import gymnasium as gym
import numpy as np
import pytest
from gymnasium.utils.env_checker import check_env

import gym_kmanip_tpu  # noqa: F401 -- registers the env ids
from gym_kmanip_tpu import constants as k

ENV_NAMES = [
    "KManipSoloArm",
    "KManipSoloArmQPos",
    "KManipDualArm",
    "KManipDualArmQPos",
    "KManipTorso",
]
VISION_ENV_NAMES = [
    "KManipSoloArmVision",
    "KManipDualArmVision",
    "KManipTorsoVision",
]


@pytest.mark.parametrize("env_name", ENV_NAMES)
def test_env_checker(env_name):
    env = gym.make(env_name)
    check_env(env.unwrapped, skip_render_check=True)
    env.close()


@pytest.mark.slow
@pytest.mark.parametrize("env_name", VISION_ENV_NAMES)
def test_vision_env_checker(env_name):
    """Full gymnasium conformance INCLUDING the render check (the
    reference's test runs check_env unskipped, tests/test_env.py:21-23) for
    every Vision morphology."""
    env = gym.make(env_name)
    check_env(env.unwrapped)
    env.close()


@pytest.mark.parametrize("env_name", VISION_ENV_NAMES[1:])
def test_vision_env_smoke(env_name):
    """Vision envs: reset/step produce in-space uint8 camera obs."""
    env = gym.make(env_name)
    obs, info = env.reset(seed=0)
    assert env.observation_space.contains(obs)
    obs, r, term, trunc, info = env.step(env.action_space.sample())
    assert env.observation_space.contains(obs)
    for name, sp in env.observation_space.spaces.items():
        if "camera" in name:
            img = obs[name]
            assert img.dtype == np.uint8 and img.shape == sp.shape
            assert img.std() > 0  # a real render, not a constant fill
    env.close()


def test_obs_normalization_bounds():
    env = gym.make("KManipSoloArm")
    obs, _ = env.reset(seed=3)
    for key in ("q_pos", "q_vel", "cube_pos", "cube_orn"):
        assert np.all(obs[key] >= -1.0) and np.all(obs[key] <= 1.0), key
    env.close()


def test_reset_determinism():
    env = gym.make("KManipSoloArm")
    obs1, _ = env.reset(seed=42)
    env2 = gym.make("KManipSoloArm")
    obs2, _ = env2.reset(seed=42)
    for key in obs1:
        np.testing.assert_allclose(obs1[key], obs2[key], atol=1e-7)
    env.close()
    env2.close()


def test_episode_truncates_at_max_steps():
    env = gym.make("KManipSoloArmQPos")
    env.reset(seed=0)
    action = {name: np.zeros(sp.shape, dtype=sp.dtype)
              for name, sp in env.action_space.spaces.items()}
    truncated = False
    for i in range(k.MAX_EPISODE_STEPS + 1):
        _, _, terminated, truncated, _ = env.step(action)
        if truncated or terminated:
            break
    assert truncated
    assert i == k.MAX_EPISODE_STEPS - 1
    env.close()


def test_info_dict_keys():
    env = gym.make("KManipSoloArm")
    _, info = env.reset(seed=0)
    for key in ("step", "episode", "is_success", "q_keys", "q_len", "a_len",
                "obs_list", "act_list", "cameras", "sim", "sim_time",
                "cpu_time", "reward", "terminated"):
        assert key in info, key
    env.close()


def test_zero_action_keeps_cube_still():
    """With zero actions the cube must stay at its spawn (on the table)."""
    env = gym.make("KManipSoloArm")
    obs0, _ = env.reset(seed=7)
    action = {name: np.zeros(sp.shape, dtype=sp.dtype)
              for name, sp in env.action_space.spaces.items()}
    for _ in range(10):
        obs, r, *_ = env.step(action)
    np.testing.assert_allclose(obs["cube_pos"][:2], obs0["cube_pos"][:2], atol=0.05)
    env.close()
