"""Robot model registry.

Three Stompy morphologies, keyed by the same MJCF filenames the reference
uses to select robots (gym_kmanip/__init__.py:18-20), so
`get_model("_env_solo_arm.xml")` is the TPU-native analog of
`mujoco.Physics.from_xml_path(...)` (env_sim.py:208).
"""

from functools import lru_cache

import numpy as np

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.models import _chains as ch
from gym_kmanip_tpu.models.spec import (
    HINGE,
    SLIDE,
    CameraSpec,
    FingertipSpec,
    RobotModel,
    SiteSpec,
    build_model,
)

# world attachment frames (the jointless prefix bodies of each env MJCF)
_SOLO_BASE_R = [((0, 0, 0.5), ch.IDENT), ((0.5, 0.6, 0), ch.IDENT)]  # _env_solo_arm.xml:4-6
_DUAL_BASE_R = [((0, 0, 0.5), ch.IDENT), ((0.5, 0.6, 0), ch.IDENT)]  # _env_dual_arm.xml:5-7
_DUAL_BASE_L = [((0, 0, 0.5), ch.IDENT), ((-0.5, 0.6, 0), ch.IDENT)]  # _env_dual_arm.xml:8-10
# _env_torso.xml:4 + torso_body.xml:2 (root euler 0 0 3.1416)
_TORSO_ROOT = [((0, 0.2, 0.7), ch.IDENT), ((0, 0, 0), None)]  # quat filled below


def _grip_cam(name: str, parent: int, target: str) -> dict:
    # grip cameras: fovy 20, pos (0, 0.05, 0), targeting the EE site
    # (arm_r_body.xml:68, arm_l_body.xml:58, torso_body.xml:106/173)
    return dict(name=name, parent=parent, pos=(0, 0.05, 0), fovy=20, target_site=target)


@lru_cache(maxsize=None)
def solo_arm() -> RobotModel:
    joints = ch.right_arm_joints(_SOLO_BASE_R, 0)
    return build_model(
        name="solo_arm",
        joints=joints,
        sites=[ch.right_arm_site(0)],
        cameras=ch.world_cameras() + [_grip_cam("grip_r", 6, "eer_site")],
        fingertips=ch.right_arm_fingertips(0),
        actuators=ch.right_arm_actuators(),
        home_qpos=k.Q_SOLO_ARM_HOME,
        mocap_pos0=np.array([[0.2, 0.6, 0.6]]),  # hand_r, _env_solo_arm.xml:9
        mocap_quat0=np.array([[1.0, 0, 0, 0]]),
    )


@lru_cache(maxsize=None)
def dual_arm() -> RobotModel:
    joints = ch.right_arm_joints(_DUAL_BASE_R, 0) + ch.left_arm_joints(_DUAL_BASE_L, 10)
    return build_model(
        name="dual_arm",
        joints=joints,
        sites=[ch.right_arm_site(0), ch.left_arm_site(10)],
        cameras=ch.world_cameras()
        + [_grip_cam("grip_r", 6, "eer_site"), _grip_cam("grip_l", 16, "eel_site")],
        fingertips=ch.right_arm_fingertips(0) + ch.left_arm_fingertips(10),
        actuators=ch.right_arm_actuators() + ch.left_arm_actuators(),
        home_qpos=k.Q_DUAL_ARM_HOME,
        # hand_r / hand_l mocap bodies, _env_dual_arm.xml:13-23
        mocap_pos0=np.array([[0.2, 0.6, 0.6], [-0.2, 0.6, 0.6]]),
        mocap_quat0=np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
    )


@lru_cache(maxsize=None)
def torso() -> RobotModel:
    from gym_kmanip_tpu.models.spec import quat_from_euler_xyz_np

    root_frames = [
        ((0, 0.2, 0.7), ch.IDENT),
        ((0, 0, 0), quat_from_euler_xyz_np((0, 0, 3.1416))),
    ]
    joints = ch.torso_joints(root_frames)
    return build_model(
        name="torso",
        joints=joints,
        sites=ch.torso_sites(),
        cameras=ch.world_cameras()
        + [_grip_cam("grip_r", 10, "eer_site"), _grip_cam("grip_l", 19, "eel_site")],
        fingertips=ch.torso_fingertips(),
        actuators=ch.torso_actuators(),
        home_qpos=k.Q_TORSO_HOME,
        mocap_pos0=np.array([[0.2, 0.6, 0.6], [-0.2, 0.6, 0.6]]),
        mocap_quat0=np.array([[1.0, 0, 0, 0], [1.0, 0, 0, 0]]),
    )


_REGISTRY = {
    k.SOLO_ARM_MJCF: solo_arm,
    k.DUAL_ARM_MJCF: dual_arm,
    k.TORSO_MJCF: torso,
    "solo_arm": solo_arm,
    "dual_arm": dual_arm,
    "torso": torso,
}


def get_model(key: str) -> RobotModel:
    return _REGISTRY[key]()
