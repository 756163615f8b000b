"""VR teleoperation via Vuer/WebXR.

Analog of /root/reference/gym_kmanip/examples/4_teleop.py:90-285: a Vuer app
streams hand-tracking at ~30 fps; pinch gestures map to EE delta actions,
grip closure, and episode reset; the main session loop steps the env and
upserts the scene (URDF robot, cube, table, hand spheres) at ~60 fps.

vuer is an optional dependency (not shipped in TPU images); the module
degrades to a clear error at launch while remaining importable for tests.

Run, then open the printed URL in a WebXR browser/headset (the reference
README tunnels it with ngrok, README.md:118-124).
"""

import asyncio
import time
from typing import Dict

import numpy as np

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k

try:
    from vuer import Vuer, VuerSession
    from vuer.schemas import Box, Hands, Sphere, Urdf

    HAS_VUER = True
except ImportError:
    HAS_VUER = False

import gymnasium as gym
from scipy.spatial.transform import Rotation as R

ENV_NAME: str = "KManipSoloArm"

# shared teleop state, guarded by a lock exactly like the reference
# (4_teleop.py:50,93-116)
lock = asyncio.Lock()
shared: Dict = {
    "eer_pos_delta": np.zeros(3, dtype=np.float32),
    "eer_orn_delta": np.zeros(3, dtype=np.float32),
    "grip_r": 0.0,
    "reset": False,
}

PINCH_DIST_CLOSED = 0.01  # meters between index tip and thumb tip
HAND_FPS = 30
SESSION_FPS = 60


async def run_env(env, session=None) -> None:
    async with lock:
        if shared["reset"]:
            env.reset()
            shared["reset"] = False
        action = {
            "eer_pos": np.clip(shared["eer_pos_delta"], -1, 1),
            "eer_orn": np.clip(shared["eer_orn_delta"], -1, 1),
            "grip_r": np.asarray([shared["grip_r"]], dtype=np.float32),
        }
    start = time.time()
    env.step(action)
    print(f"env step took {(time.time() - start) * 1000:.1f}ms")


def hand_handler_factory(env):
    async def hand_handler(event, session):
        # right hand landmarks: wrist + 24 joints; index tip 9, thumb tip 4
        hands = event.value.get("rightLandmarks")
        if hands is None:
            return
        lm = np.asarray(hands)
        pinch = np.linalg.norm(lm[9] - lm[4]) < PINCH_DIST_CLOSED
        wrist = k.vuer2mj_pos(lm[0])
        async with lock:
            if pinch:
                prev = shared.get("wrist_prev")
                if prev is not None:
                    shared["eer_pos_delta"] = np.clip(
                        (wrist - prev) / k.EE_POS_DELTA, -1, 1
                    ).astype(np.float32)
                shared["wrist_prev"] = wrist
                shared["grip_r"] = -1.0  # close while pinching
            else:
                shared["wrist_prev"] = None
                shared["eer_pos_delta"] = np.zeros(3, dtype=np.float32)
                shared["grip_r"] = 1.0
            # both-hand double pinch = reset (reference gesture)
            left = event.value.get("leftLandmarks")
            if left is not None:
                llm = np.asarray(left)
                if np.linalg.norm(llm[9] - llm[4]) < PINCH_DIST_CLOSED and pinch:
                    shared["reset"] = True

    return hand_handler


def main():
    if not HAS_VUER:
        raise SystemExit(
            "vuer is not installed in this image; `pip install vuer` on a "
            "machine with network access to run VR teleop."
        )
    env = gym.make(ENV_NAME)
    env.reset(seed=0)
    app = Vuer()
    app.add_handler("HAND_MOVE")(hand_handler_factory(env))

    @app.spawn(start=True)
    async def session_loop(session: VuerSession):
        session.upsert(
            Urdf(src=env.unwrapped.urdf_filename, key="robot"),
            to="bgChildren",
        )
        session.upsert(Hands(fps=HAND_FPS, stream=True, key="hands"), to="bgChildren")
        while True:
            await run_env(env, session)
            state = env.unwrapped.env.state
            session.upsert(
                Box(
                    args=[0.04, 0.04, 0.04],
                    position=k.mj2vuer_pos(np.asarray(state.cube_pos)).tolist(),
                    key="cube",
                    materialType="standard",
                    material=dict(color="#ff2222"),
                ),
                to="bgChildren",
            )
            await asyncio.sleep(1.0 / SESSION_FPS)


if __name__ == "__main__":
    main()
