"""VR teleoperation via Vuer/WebXR.

Analog of /root/reference/gym_kmanip/examples/4_teleop.py: a Vuer app
streams hand tracking at ~30 fps, the gesture mapping in
gym_kmanip_tpu.teleop turns it into EE/grip actions (both hands for
bimanual morphologies, orientation from the wrist rotation matrix, gripper
from the thumb-middle pinch distance, thumb-pinky reset with a 1 s
backoff), and the session loop steps the env and upserts the scene (URDF
robot with live joint values, cube, table plane, hand spheres) at ~60 fps.

vuer is an optional dependency (not shipped in TPU images); this module
stays importable without it (the pure gesture logic lives in
gym_kmanip_tpu.teleop and is tested in tests/test_teleop.py). Run, then
open the printed URL in a WebXR browser/headset (the reference README
tunnels it with ngrok, README.md:118-124).
"""

import asyncio
import time

import gymnasium as gym
import numpy as np

import gym_kmanip_tpu  # noqa: F401  (registers env ids)
from gym_kmanip_tpu import teleop as tp

try:
    from vuer import Vuer, VuerSession
    from vuer.schemas import Box, Hands, Plane, PointLight, Sphere, Urdf

    HAS_VUER = True
except ImportError:
    HAS_VUER = False

# choose your environment (any of the 8 registered ids)
ENV_NAME: str = "KManipSoloArm"

# Vuer needs a web link to the URDF for the headset (reference
# 4_teleop.py:45-47 points at the kscalelabs/webstompy mirror)
URDF_WEB_BASE: str = (
    "https://raw.githubusercontent.com/kscalelabs/webstompy/master/urdf"
)

_SCHEMAS = {}


def _upsert(session, item: dict) -> None:
    kwargs = {kk: v for kk, v in item.items() if kk != "schema"}
    session.upsert(_SCHEMAS[item["schema"]](**kwargs), to="bgChildren")


def main():
    if not HAS_VUER:
        raise SystemExit(
            "vuer is not installed in this image; `pip install vuer` on a "
            "machine with network access to run VR teleop."
        )
    _SCHEMAS.update(
        Box=Box, Hands=Hands, Plane=Plane, PointLight=PointLight,
        Sphere=Sphere, Urdf=Urdf,
    )
    env = gym.make(ENV_NAME)
    env.reset(seed=0)
    bimanual = "eel_pos" in env.action_space.spaces
    teleop = tp.TeleopState(bimanual=bimanual)
    lock = asyncio.Lock()
    last_reset = [time.time()]

    app = Vuer()

    @app.add_handler("HAND_MOVE")
    async def hand_handler(event, _):
        async with lock:
            teleop.handle(event.value)

    async def run_env() -> None:
        async with lock:
            action = teleop.action()
            do_reset = teleop.consume_reset(time.time(), last_reset[0])
        start = time.time()
        env.step(action)
        print(f"env step took {(time.time() - start) * 1000:.2f}ms")
        if do_reset:
            print("environment reset")
            env.reset()
            last_reset[0] = time.time()

    @app.spawn(start=True)
    async def session_loop(session: VuerSession):
        src = f"{URDF_WEB_BASE}/{env.unwrapped.urdf_filename}"
        for item in tp.scene_static(env, src):
            _upsert(session, item)
        await asyncio.sleep(0.1)
        while True:
            await asyncio.gather(run_env(), asyncio.sleep(1 / tp.MAX_FPS))
            async with lock:
                for item in tp.scene_dynamic(env, teleop):
                    _upsert(session, item)


if __name__ == "__main__":
    main()
