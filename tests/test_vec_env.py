"""Vectorized env tests: batch semantics, autoreset, single-env agreement."""

import numpy as np
import pytest

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.env.vec_env import KManipVecEnv


def _zero_actions(env, n):
    dims = {"eer_pos": 3, "eer_orn": 3, "grip_r": 1, "q_pos_r": 7}
    return {
        name: np.zeros((n, dims[name]), dtype=np.float32)
        for name in env.cfg.act_list
    }


def test_vec_env_shapes_and_bounds():
    env = KManipVecEnv("KManipSoloArmQPos", num_envs=4, seed=0)
    obs = env.reset()
    assert obs["q_pos"].shape == (4, 10)
    assert obs["cube_pos"].shape == (4, 3)
    obs, r, term, trunc, _ = env.step(_zero_actions(env, 4))
    assert r.shape == (4,)
    assert not trunc.any()
    for key in ("q_pos", "q_vel", "cube_pos", "cube_orn"):
        assert np.all(obs[key] >= -1.0) and np.all(obs[key] <= 1.0)
    env.close()


def test_vec_env_independent_spawns():
    env = KManipVecEnv("KManipSoloArmQPos", num_envs=4, seed=1)
    obs = env.reset()
    # cube spawns differ across the batch
    assert np.std(obs["cube_pos"], axis=0).max() > 1e-3
    env.close()


def test_vec_env_autoreset():
    env = KManipVecEnv("KManipSoloArmQPos", num_envs=2, seed=2)
    obs0 = env.reset()
    acts = _zero_actions(env, 2)
    for i in range(k.MAX_EPISODE_STEPS):
        obs, r, term, trunc, _ = env.step(acts)
    assert trunc.all()  # all envs truncated at the limit...
    # ...and were auto-reset: fresh episode state, step counters cleared
    obs, r, term, trunc, _ = env.step(acts)
    assert not trunc.any()
    env.close()


def test_vec_env_rejects_vision():
    with pytest.raises(ValueError):
        KManipVecEnv("KManipSoloArmVision", num_envs=2)
