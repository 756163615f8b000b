"""Evaluate a policy in the env.

The reference's eval example is an unadapted copy of gym_pusht's LeRobot
DiffusionPolicy script (marked so at
/root/reference/gym_kmanip/examples/7_eval_policy.py:1). This replacement
actually runs: it evaluates either the BC policy trained by
6_train_from_dataset.py or, absent a checkpoint, the reach heuristic from
2_synthetic_data.py, and reports per-episode returns.
"""

import os

import gymnasium as gym
import numpy as np

import gym_kmanip_tpu  # noqa: F401
from gym_kmanip_tpu import constants as k

ENV_NAME: str = "KManipSoloArm"
NUM_EPISODES: int = 3
CKPT_PATH: str = "/tmp/kmanip_bc_policy.npz"


def make_policy(env):
    if os.path.exists(CKPT_PATH):
        import jax
        import jax.numpy as jnp
        from flax import linen as nn

        ckpt = np.load(CKPT_PATH)

        class PolicyMLP(nn.Module):
            act_dim: int

            @nn.compact
            def __call__(self, x):
                x = nn.tanh(nn.Dense(256)(x))
                x = nn.tanh(nn.Dense(256)(x))
                return nn.tanh(nn.Dense(self.act_dim)(x))

        model = PolicyMLP(act_dim=int(ckpt["act_dim"]))
        template = model.init(jax.random.PRNGKey(0), jnp.zeros((1, int(ckpt["obs_dim"]))))
        import jax.flatten_util

        _, unravel = jax.flatten_util.ravel_pytree(template)
        params = unravel(jnp.asarray(ckpt["flat"]))
        apply = jax.jit(model.apply)

        def policy(obs):
            x = np.concatenate([obs["q_pos"], obs["q_vel"]])[None]
            flat_act = np.asarray(apply(params, jnp.asarray(x, dtype=jnp.float32)))[0]
            action, i = {}, 0
            for name, sp in env.action_space.spaces.items():
                d = int(np.prod(sp.shape))
                action[name] = flat_act[i : i + d].astype(sp.dtype)
                i += d
            return action

        print("evaluating BC policy from", CKPT_PATH)
        return policy

    def heuristic(obs):
        from gym_kmanip_tpu.ops import kinematics as kin

        backend = env.unwrapped.env
        state = backend.state
        xpos, xquat, _ = kin.fk(backend.model, state.qpos)
        eer_pos, _ = kin.site_pose(backend.model, xpos, xquat, "eer_site")
        gap = np.asarray(state.cube_pos) - np.asarray(eer_pos)
        return {
            "eer_pos": np.clip(gap / (np.linalg.norm(gap) + 1e-6), -1, 1).astype(np.float32),
            "eer_orn": np.zeros(3, dtype=np.float32),
            "grip_r": np.asarray([1.0], dtype=np.float32),
        }

    print("no checkpoint found; evaluating reach heuristic")
    return heuristic


def main():
    env = gym.make(ENV_NAME)
    policy = make_policy(env)
    returns = []
    for ep in range(NUM_EPISODES):
        obs, info = env.reset(seed=ep)
        total = 0.0
        for _ in range(k.MAX_EPISODE_STEPS):
            obs, reward, terminated, truncated, info = env.step(policy(obs))
            total += reward
            if terminated or truncated:
                break
        returns.append(total)
        print(f"episode {ep}: return {total:.3f} success={info['is_success']}")
    print(f"mean return over {NUM_EPISODES} episodes: {np.mean(returns):.3f}")
    env.close()


if __name__ == "__main__":
    main()
