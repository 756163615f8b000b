"""Render the `top` camera each step and save an mp4.

Analog of /root/reference/gym_kmanip/examples/3_save_to_video.py.
"""

import gymnasium as gym

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k

ENV_NAME: str = "KManipSoloArm"
VIDEO_PATH: str = "/tmp/kmanip_top.mp4"


def main():
    env = gym.make(ENV_NAME)
    env.reset(seed=0)
    frames = []
    for _ in range(k.MAX_EPISODE_STEPS):
        obs, reward, terminated, truncated, info = env.step(
            env.action_space.sample()
        )
        frames.append(env.render())
        if terminated or truncated:
            break
    env.close()
    import imageio

    try:
        imageio.mimsave(VIDEO_PATH, frames, fps=k.FPS)
        print(f"wrote {VIDEO_PATH}")
    except Exception:
        # images with no ffmpeg backend: fall back to GIF (always available)
        gif = VIDEO_PATH.rsplit(".", 1)[0] + ".gif"
        imageio.mimsave(gif, frames, fps=min(k.FPS, 25), loop=0)
        print(f"no ffmpeg backend; wrote {gif}")


if __name__ == "__main__":
    main()
