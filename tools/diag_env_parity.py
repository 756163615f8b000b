"""Teacher-forced attribution of env-parity deviation.

Replays each golden step FROM THE REFERENCE'S OWN pre-step state, so
deviations don't compound: per step we separately measure

  decode : our _decode_action (incl. ik_trf) vs the reference's recorded
           post-before_step ctrl            -> IK/decode parity, per step
  dynamics: our control_step driven by the REFERENCE ctrl from the
           reference pre-state vs its recorded post-step qpos
           -> physics parity with limits/frictionloss/contacts live

Run: JAX_PLATFORMS=cpu PYTHONPATH=. python tools/diag_env_parity.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics.engine import control_step
from gym_kmanip_tpu.dynamics.state import SimState
from gym_kmanip_tpu.env.config import CONFIGS
from gym_kmanip_tpu.env.task import _decode_action
from gym_kmanip_tpu.models import get_model

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

CASES = [
    ("solo_arm_env_trace.npz", "KManipSoloArm", ("eer",)),
    ("dual_arm_env_trace.npz", "KManipDualArm", ("eer", "eel")),
    ("torso_env_trace.npz", "KManipTorso", ("eer", "eel")),
]


def main():
    f = jnp.float32
    for trace, env_id, arms in CASES:
        d = np.load(os.path.join(GOLDEN, trace))
        cfg = CONFIGS[env_id]
        model = get_model(cfg.mjcf_filename)
        nq = model.nq

        decode = jax.jit(lambda s, a: _decode_action(model, cfg, s, a)[:2])
        stepper = jax.jit(
            lambda s, c, qf: control_step(model, s, c, qpos_force=qf)[0]
        )

        arm_idx = list(cfg.q_id_r_mask) + (
            list(cfg.q_id_l_mask) if cfg.q_id_l_mask is not None else []
        )
        slider_idx = [i for i in range(nq) if i not in arm_idx]

        dev_ctrl_arm, dev_ctrl_all = [], []
        dev_dyn_arm, dev_dyn_slider, dev_cube = [], [], []
        for t in range(d["actions"].shape[0]):
            qpos = d["raw_qpos_pre"][t]
            qvel = d["raw_qvel_pre"][t]
            prev_ctrl = d["raw_ctrl"][t - 1] if t > 0 else model.home_qpos[: model.nu]
            state = SimState(
                qpos=jnp.asarray(qpos[:nq], f),
                qvel=jnp.asarray(qvel[:nq], f),
                ctrl=jnp.asarray(prev_ctrl, f),
                cube_pos=jnp.asarray(qpos[nq : nq + 3], f),
                cube_quat=jnp.asarray(qpos[nq + 3 : nq + 7], f),
                cube_linvel=jnp.asarray(qvel[nq : nq + 3], f),
                cube_angvel=jnp.asarray(qvel[nq + 3 : nq + 6], f),
                time=jnp.asarray(0.0, f),
            )
            a = d["actions"][t]
            action = {}
            for i, side in enumerate(arms):
                action[f"{side}_pos"] = jnp.asarray(a[3 * i : 3 * i + 3], f)
                action[f"{side}_orn"] = jnp.zeros(3, f)
                action[f"grip_{side[-1]}"] = jnp.zeros(1, f)

            ctrl_j, qpos_ik = decode(state, action)
            ctrl = np.asarray(ctrl_j, np.float64)
            dc = np.abs(ctrl - d["raw_ctrl"][t])
            dev_ctrl_arm.append(dc[arm_idx].max())
            dev_ctrl_all.append(dc.max())

            # dynamics: integrate from the reference's decode outputs as we
            # model them (IK-teleported qpos + recorded ctrl)
            post_state = stepper(
                state._replace(qpos=qpos_ik),
                jnp.asarray(d["raw_ctrl"][t], f),
                state.qpos,
            )
            post = np.asarray(post_state.qpos, np.float64)
            dq = np.abs(post - d["raw_qpos_post"][t][:nq])
            dev_dyn_arm.append(dq[arm_idx].max())
            dev_dyn_slider.append(max(dq[slider_idx].max(), 0) if slider_idx else 0.0)
            dev_cube.append(
                np.abs(
                    np.asarray(post_state.cube_pos, np.float64)
                    - d["raw_qpos_post"][t][nq : nq + 3]
                ).max()
            )

        print(f"\n{env_id} (per-step, teacher-forced):")
        print(f"  decode/IK ctrl dev  arm joints: max {max(dev_ctrl_arm):.2e}  "
              f"median {np.median(dev_ctrl_arm):.2e}  (all {max(dev_ctrl_all):.2e})")
        print(f"  dynamics qpos dev   arm joints: max {max(dev_dyn_arm):.2e}  "
              f"median {np.median(dev_dyn_arm):.2e}")
        print(f"  dynamics qpos dev   sliders   : max {max(dev_dyn_slider):.2e}")
        print(f"  dynamics cube pos dev         : max {max(dev_cube):.2e}")


if __name__ == "__main__":
    main()
