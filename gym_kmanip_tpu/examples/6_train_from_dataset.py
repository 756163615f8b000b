"""Train a policy from recorded HDF5 episodes (behavior cloning, JAX).

The reference's training example is a non-functional REINFORCE skeleton
(marked "TODO: WIP - DOES NOT WORK",
/root/reference/gym_kmanip/examples/6_train_from_dataset.py:1, referencing
an undefined REINFORCE class). This replacement actually runs: a flax MLP
policy behavior-cloned on (qpos, qvel) -> action from the ACT-layout
episode files that 2_log_with_h5py.py / 2_synthetic_data.py write.
"""

import glob
import os
from typing import List, Tuple

import h5py
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

from gym_kmanip_tpu import constants as k

DATA_DIR: str = os.environ.get("KMANIP_DATA_DIR", k.DATA_DIR)
BATCH_SIZE: int = 256
NUM_STEPS: int = 2000
LR: float = 3e-4
CKPT_PATH: str = "/tmp/kmanip_bc_policy.npz"


class PolicyMLP(nn.Module):
    act_dim: int

    @nn.compact
    def __call__(self, x):
        x = nn.tanh(nn.Dense(256)(x))
        x = nn.tanh(nn.Dense(256)(x))
        return nn.tanh(nn.Dense(self.act_dim)(x))


def load_episodes(data_dir: str) -> Tuple[np.ndarray, np.ndarray]:
    obs_list: List[np.ndarray] = []
    act_list: List[np.ndarray] = []
    for path in sorted(glob.glob(os.path.join(data_dir, "*", "episode_*.hdf5"))):
        with h5py.File(path, "r") as f:
            qpos = f["observations/qpos"][:]
            qvel = f["observations/qvel"][:]
            action = f["action"][:]
            obs_list.append(np.concatenate([qpos, qvel], axis=1))
            act_list.append(action)
    if not obs_list:
        raise SystemExit(
            f"no episode_*.hdf5 under {data_dir}; run "
            "examples/2_synthetic_data.py first"
        )
    return np.concatenate(obs_list), np.concatenate(act_list)


def main():
    obs, act = load_episodes(DATA_DIR)
    print(f"dataset: {obs.shape[0]} transitions, obs {obs.shape[1]}, act {act.shape[1]}")
    model = PolicyMLP(act_dim=act.shape[1])
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, jnp.zeros((1, obs.shape[1])))
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, ob, ac):
        def loss_fn(p):
            pred = model.apply(p, ob)
            return jnp.mean((pred - ac) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    obs_j = jnp.asarray(obs, dtype=jnp.float32)
    act_j = jnp.asarray(act, dtype=jnp.float32)
    n = obs.shape[0]
    for step in range(NUM_STEPS):
        rng, sub = jax.random.split(rng)
        idx = jax.random.randint(sub, (min(BATCH_SIZE, n),), 0, n)
        params, opt_state, loss = train_step(params, opt_state, obs_j[idx], act_j[idx])
        if step % 200 == 0:
            print(f"step {step}: bc loss {float(loss):.6f}")

    flat, _ = jax.flatten_util.ravel_pytree(params)
    np.savez(CKPT_PATH, flat=np.asarray(flat), obs_dim=obs.shape[1], act_dim=act.shape[1])
    print(f"saved policy to {CKPT_PATH}")


if __name__ == "__main__":
    main()
