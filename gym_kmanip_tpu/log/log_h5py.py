"""HDF5 episode logger (ACT / LeRobot-compatible layout).

Same file schema and new/cam/step/end protocol as the reference
(/root/reference/gym_kmanip/log_h5py.py:13-61): `observations/qpos|qvel`,
`observations/images/<cam>`, `action`, metadata attrs, chunked image
datasets, flush per step.

Fix-and-document (SURVEY.md §7): the reference writes only
`action["grip_r"]` into the whole action dataset (log_h5py.py:56) and sizes
it by the number of action *keys*; here the action dataset is the full
flattened action vector in act_list order, sized by the true action
dimension, which is what the ACT/LeRobot training format expects.
"""

import os
from typing import Any, Dict

import h5py
import numpy as np
from numpy.typing import NDArray

from gym_kmanip_tpu import constants as k


def _action_dim(info: Dict[str, Any]) -> int:
    act_dims = info.get("act_dims")
    if act_dims:
        return max(sum(act_dims.values()), 1)
    dims = {"eel_pos": 3, "eel_orn": 3, "eer_pos": 3, "eer_orn": 3,
            "grip_l": 1, "grip_r": 1, "q_pos_r": 7, "q_pos_l": 7}
    return max(sum(dims.get(name, 0) for name in info["act_list"]), 1)


def new(log_dir: str, info: Dict[str, Any]) -> h5py.File:
    assert os.path.exists(log_dir), f"Directory {log_dir} does not exist"
    log_path = os.path.join(log_dir, f"episode_{info['episode']}.hdf5")
    f = h5py.File(log_path, "w", rdcc_nbytes=k.H5PY_CHUNK_SIZE_BYTES)
    f.attrs["sim"] = info["sim"]
    g = f.create_group("metadata")
    for key, value in info.items():
        try:
            g.attrs[key] = value
        except TypeError:
            pass  # non-serializable info entries (e.g. Cam objects)
    f.create_group("observations/images")
    f.create_dataset("observations/qpos", (k.MAX_EPISODE_STEPS, info["q_len"]))
    f.create_dataset("observations/qvel", (k.MAX_EPISODE_STEPS, info["q_len"]))
    f.create_dataset("action", (k.MAX_EPISODE_STEPS, _action_dim(info)))
    return f


def end(f: h5py.File) -> None:
    if f is not None:
        f.close()


def cam(f: h5py.File, cam: k.Cam) -> None:
    g = f.create_group(f"metadata/{cam.log_name}")
    g.attrs["resolution"] = [cam.w, cam.h]
    g.attrs["focal_length"] = cam.fl
    g.attrs["principal_point"] = cam.pp
    f.create_dataset(
        f"/observations/images/{cam.name}",
        (k.MAX_EPISODE_STEPS, cam.h, cam.w, cam.c),
        dtype=cam.dtype,
        chunks=(1, cam.h, cam.w, cam.c),
    )


def step(
    f: h5py.File,
    action: Dict[str, NDArray],
    observation: Dict[str, NDArray],
    info: Dict[str, Any],
) -> None:
    idx: int = info["step"] - 1
    flat = np.concatenate(
        [np.asarray(action[name]).reshape(-1) for name in info["act_list"] if name in action]
    ) if action else np.zeros(1)
    n = min(len(flat), f["action"].shape[1])
    f["action"][idx, :n] = flat[:n]
    if "q_pos" in observation:
        f["observations/qpos"][idx] = observation["q_pos"]
    if "q_vel" in observation:
        f["observations/qvel"][idx] = observation["q_vel"]
    # camera-less recordings (state-only experts, examples/13_bc_pick.py)
    # simply have no image datasets — mirror new()'s tolerance
    for cam_ in info.get("cameras", ()):
        f[f"/observations/images/{cam_.name}"][idx] = observation[cam_.log_name]
    f.flush()
