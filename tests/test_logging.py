"""Logger and checkpoint tests: HDF5 ACT schema, viz logger protocol,
pytree checkpoint round-trip. The reference has no logger tests
(SURVEY.md §4)."""

import glob
import os

import h5py
import numpy as np
import pytest

import gymnasium as gym

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k


def test_h5py_episode_schema(tmp_path, monkeypatch):
    monkeypatch.setattr(k, "DATA_DIR", str(tmp_path))
    # env_base reads DATA_DIR through the constants module at call time
    import gym_kmanip_tpu.env.env_base as eb

    monkeypatch.setattr(eb.k, "DATA_DIR", str(tmp_path))
    env = gym.make("KManipSoloArm", log_h5py=True, log_prefix="t")
    env.reset(seed=0)
    for _ in range(3):
        env.step(env.action_space.sample())
    env.close()

    files = glob.glob(str(tmp_path / "*" / "episode_*.hdf5"))
    assert len(files) == 1
    with h5py.File(files[0], "r") as f:
        # ACT/LeRobot layout (reference log_h5py.py:13-61)
        assert f["observations/qpos"].shape == (k.MAX_EPISODE_STEPS, 10)
        assert f["observations/qvel"].shape == (k.MAX_EPISODE_STEPS, 10)
        assert f["action"].shape[0] == k.MAX_EPISODE_STEPS
        assert f["action"].shape[1] == 7  # eer_pos 3 + eer_orn 3 + grip_r 1
        assert "metadata" in f
        assert f.attrs["sim"]
        # recorded steps are non-trivial
        assert np.any(f["observations/qpos"][0] != 0)


def test_viz_logger_jsonl_fallback(tmp_path, monkeypatch):
    import gym_kmanip_tpu.env.env_base as eb

    monkeypatch.setattr(eb.k, "DATA_DIR", str(tmp_path))
    env = gym.make("KManipSoloArm", log_rerun=True, log_prefix="t")
    env.reset(seed=0)
    env.step(env.action_space.sample())
    env.close()

    from gym_kmanip_tpu.log.log_rerun import HAS_RERUN

    suffix = ".rrd" if HAS_RERUN else ".rrd.jsonl"
    files = glob.glob(str(tmp_path / "*" / ("episode_*" + suffix)))
    assert files, list(tmp_path.rglob("*"))
    if not HAS_RERUN:
        import json

        lines = [json.loads(l) for l in open(files[0])]
        kinds = {l["kind"] for l in lines}
        assert "blueprint" in kinds and "step" in kinds


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from gym_kmanip_tpu.dynamics import init_state
    from gym_kmanip_tpu.models import get_model
    from gym_kmanip_tpu.utils import checkpoint

    s = init_state(get_model("solo_arm"))
    path = str(tmp_path / "state.npz")
    checkpoint.save(path, s)
    s2 = checkpoint.restore(path, s)
    assert type(s2) is type(s)
    np.testing.assert_allclose(np.asarray(s.qpos), np.asarray(s2.qpos))
    np.testing.assert_allclose(np.asarray(s.cube_pos), np.asarray(s2.cube_pos))
    assert s2.qpos.dtype == s.qpos.dtype
