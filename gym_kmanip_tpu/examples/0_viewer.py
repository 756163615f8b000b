"""Interactive-style viewer: roll a random policy and save rendered frames.

TPU-native analog of the reference viewer example
(/root/reference/gym_kmanip/examples/0_viewer.py), which launches the
dm_control GUI. Headless TPU hosts have no GUI, so this renders the `top`
camera through the on-device raycaster and writes PNG frames (and an mp4 if
imageio is available).

Choose the env by editing ENV_NAME (same convention as the reference
examples, e.g. examples/1_control.py:9-17).
"""

import os

import gymnasium as gym
import numpy as np

import gym_kmanip_tpu  # noqa: F401

ENV_NAME: str = "KManipSoloArm"
# ENV_NAME: str = "KManipSoloArmQPos"
# ENV_NAME: str = "KManipDualArm"
# ENV_NAME: str = "KManipDualArmQPos"
# ENV_NAME: str = "KManipTorso"
NUM_STEPS: int = 16
OUT_DIR: str = "/tmp/kmanip_viewer"


def main():
    env = gym.make(ENV_NAME)
    env.reset(seed=0)
    os.makedirs(OUT_DIR, exist_ok=True)
    frames = []
    for i in range(NUM_STEPS):
        action = env.action_space.sample()
        obs, reward, terminated, truncated, info = env.step(action)
        frame = env.render()
        frames.append(frame)
        print(f"step {i}: reward={reward:.4f}")
    try:
        import imageio

        try:
            imageio.mimsave(os.path.join(OUT_DIR, "viewer.mp4"), frames, fps=30)
            print(f"wrote {OUT_DIR}/viewer.mp4")
        except Exception:
            imageio.mimsave(os.path.join(OUT_DIR, "viewer.gif"), frames, fps=25, loop=0)
            print(f"no ffmpeg backend; wrote {OUT_DIR}/viewer.gif")
    except ImportError:
        for i, f in enumerate(frames):
            np.save(os.path.join(OUT_DIR, f"frame_{i:03d}.npy"), f)
        print(f"imageio unavailable; wrote npy frames to {OUT_DIR}")
    env.close()


if __name__ == "__main__":
    main()
