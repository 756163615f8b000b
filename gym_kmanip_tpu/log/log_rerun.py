"""Visualization episode logger with the rerun new/cam/step/end protocol.

Mirrors /root/reference/gym_kmanip/log_rerun.py:11-117: blueprint layout
(3D scene + per-camera 2D views + q/action time series), per-step scalars
per joint, EE/cube transforms, camera images, and the four timelines
(sim_time, cpu_time, episode, step).

The rerun-sdk is an optional dependency (not available in every deployment);
when absent, the same logical streams are written as one JSON line per step
to `episode_<n>.rrd.jsonl` so episodes remain inspectable and the logger
contract (and its tests) hold either way.
"""

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np
from numpy.typing import NDArray

from gym_kmanip_tpu import constants as k

try:  # pragma: no cover - exercised only where rerun-sdk is installed
    import rerun as rr
    import rerun.blueprint as rrb

    HAS_RERUN = True
except ImportError:
    rr = None
    rrb = None
    HAS_RERUN = False

_state: Dict[str, Any] = {"f": None, "path": None}


def new(log_dir: str, info: Dict[str, Any]) -> None:
    assert os.path.exists(log_dir), f"Directory {log_dir} does not exist"
    if HAS_RERUN:
        views: List[Any] = []
        if "q_pos" in info["obs_list"]:
            views.append(rrb.TimeSeriesView(origin="/state/q_pos", name="q_pos"))
        if "q_vel" in info["obs_list"]:
            views.append(rrb.TimeSeriesView(origin="/state/q_vel", name="q_vel"))
        if len(info["act_list"]) > 0:
            views.append(rrb.TimeSeriesView(origin="/action", name="action"))
        cam_views = [
            rrb.Spatial2DView(origin=c.log_name, name=c.name) for c in info["cameras"]
        ]
        blueprint = rrb.Blueprint(
            rrb.Horizontal(
                rrb.Vertical(
                    rrb.Spatial3DView(origin="/world", name="scene"),
                    rrb.Horizontal(*cam_views),
                ),
                rrb.Vertical(*views),
            )
        )
        rr.init("gym_kmanip_tpu", default_blueprint=blueprint)
        rr.save(os.path.join(log_dir, f"episode_{info['episode']}.rrd"))
    else:
        path = os.path.join(log_dir, f"episode_{info['episode']}.rrd.jsonl")
        _state["f"] = open(path, "w")
        _state["path"] = path
        _state["f"].write(
            json.dumps(
                {
                    "kind": "blueprint",
                    "obs_list": list(info["obs_list"]),
                    "act_list": list(info["act_list"]),
                    "cameras": [c.name for c in info["cameras"]],
                }
            )
            + "\n"
        )


def end() -> None:
    if HAS_RERUN:
        rr.disconnect()
    elif _state["f"] is not None:
        _state["f"].close()
        _state["f"] = None


def cam(cam_: k.Cam) -> None:
    if HAS_RERUN:
        rr.log(
            f"world/camera/{cam_.name}",
            rr.Pinhole(
                resolution=[cam_.w, cam_.h],
                focal_length=cam_.fl,
                principal_point=cam_.pp,
            ),
        )
    elif _state["f"] is not None:
        _state["f"].write(
            json.dumps(
                {
                    "kind": "pinhole",
                    "camera": cam_.name,
                    "resolution": [cam_.w, cam_.h],
                    "focal_length": cam_.fl,
                    "principal_point": list(cam_.pp),
                }
            )
            + "\n"
        )


def step(
    action: Dict[str, NDArray],
    observation: Dict[str, NDArray],
    info: Dict[str, Any],
) -> None:
    if HAS_RERUN:
        rr.set_time_seconds("sim_time", info["sim_time"])
        rr.set_time_seconds("cpu_time", info["cpu_time"])
        rr.set_time_sequence("episode", info["episode"])
        rr.set_time_sequence("step", info["step"])
        for i, key in enumerate(info["q_keys"]):
            if "q_pos" in observation:
                rr.log(f"state/q_pos/{key}", rr.Scalar(float(observation["q_pos"][i])))
            if "q_vel" in observation:
                rr.log(f"state/q_vel/{key}", rr.Scalar(float(observation["q_vel"][i])))
        for name, val in action.items():
            for j, v in enumerate(np.asarray(val).reshape(-1)):
                rr.log(f"action/{name}/{j}", rr.Scalar(float(v)))
        if "cube_pos" in observation:
            rr.log(
                "world/cube",
                rr.Transform3D(translation=np.asarray(observation["cube_pos"])),
            )
        for c in info["cameras"]:
            rr.log(c.log_name, rr.Image(observation[c.log_name]))
    elif _state["f"] is not None:
        rec = {
            "kind": "step",
            "sim_time": info["sim_time"],
            "cpu_time": info["cpu_time"],
            "episode": info["episode"],
            "step": info["step"],
            "action": {n: np.asarray(v).reshape(-1).tolist() for n, v in action.items()},
            "q_pos": np.asarray(observation.get("q_pos", [])).tolist(),
            "q_vel": np.asarray(observation.get("q_vel", [])).tolist(),
            "cube_pos": np.asarray(observation.get("cube_pos", [])).tolist(),
            "cube_orn": np.asarray(observation.get("cube_orn", [])).tolist(),
            "images": {
                c.name: [int(x) for x in np.asarray(observation[c.log_name]).shape]
                for c in info["cameras"]
            },
        }
        _state["f"].write(json.dumps(rec) + "\n")
        _state["f"].flush()
