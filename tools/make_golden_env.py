"""Generate an env-level golden trace by RUNNING the actual reference env.

dm_control + mujoco are installed, so the reference package itself
(/root/reference/gym_kmanip) can execute here -- the only blocker is its
.gitignored STL meshes. This tool builds mesh-free assets (tools/
make_golden.py pipeline + a primitive box standing in for the mesh
tabletop, dimensions from our constants) with inertials/damping matched to
the engine's estimates, points the reference at them, runs KManipSoloArm
with a fixed EE-delta action sequence, and records per-step observations.

tests/test_env_parity.py then replays the identical actions through OUR env
and compares the full pipeline end to end (action decode -> IK -> physics
-> obs normalization -> reward). The stripped reference has no finger geoms
(true upstream too -- its touch reward never fires), and contact-model
differences only matter if the gripper hits the cube, which the scripted
sequence avoids.

Run:  python tools/make_golden_env.py
"""

import os
import sys
import tempfile
import xml.etree.ElementTree as ET

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from tools.make_golden import build_xml  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
N_STEPS = 20
SEED = 11

# name -> (builtin model, env xml, arms, clamp_home_into_range)
# The 4th torso case re-records the SAME env with the home pose clamped
# INTO joint range: the stock torso home parks three joints OUTSIDE their
# ranges, making the reference skip IK (scipy raises out-of-bounds) until
# a chaotic re-entry step — the clamped variant pins solver parity in the
# regime where the <1e-3 rad band is meaningful (VERDICT r2 next #2).
ENVS = {
    "KManipSoloArm": ("solo_arm", "_env_solo_arm.xml", ("eer",), False),
    "KManipDualArm": ("dual_arm", "_env_dual_arm.xml", ("eer", "eel"), False),
    "KManipTorso": ("torso", "_env_torso.xml", ("eer", "eel"), False),
    "KManipTorso#inrange": ("torso_inrange", "_env_torso.xml", ("eer", "eel"), True),
}
CLAMP_MARGIN = 0.25  # rad inside the range, away from the limit-spring kink
# The in-range trace also uses gentler EE deltas (full-scale random deltas
# drive IK-masked joints INTO their limits within a few steps, recreating
# the boundary bifurcation the clamp exists to avoid)
INRANGE_ACTION_SCALE = 0.3


def build_env_xml(builtin: str, xml_name: str) -> str:
    from gym_kmanip_tpu import constants as k
    from gym_kmanip_tpu.models import get_model

    model = get_model(builtin)
    root = ET.fromstring(build_xml(xml_name))

    name2id = {n: i for i, n in enumerate(model.joint_names)}

    def visit(body):
        j = body.find("joint")
        if j is not None and j.get("name") in name2id:
            i = name2id[j.get("name")]
            j.set("damping", str(k.JOINT_DAMPING))
            j.set("armature", str(model.armature[i]))
            ine = body.find("inertial")
            if ine is None:
                ine = ET.SubElement(body, "inertial")
            ine.set("pos", " ".join(str(x) for x in model.body_com[i]))
            ine.set("mass", str(model.body_mass[i]))
            ine.set("diaginertia", " ".join(str(x) for x in model.body_inertia[i]))
        for ch in body.findall("body"):
            visit(ch)

    for wb in root.findall("worldbody"):
        for b in wb.findall("body"):
            visit(b)
        # primitive tabletop replacing the stripped mesh (top surface at
        # TABLE_TOP_Z, extents from our constants)
        for body in wb.findall("body"):
            if body.get("name") == "table":
                half_z = (k.TABLE_TOP_Z - 0.5) / 2.0
                ET.SubElement(
                    body, "geom",
                    dict(
                        name="table", type="box",
                        size=f"{k.TABLE_HALF_X} {k.TABLE_HALF_Y} {half_z}",
                        pos=f"0 0 {half_z}",
                        contype="1", conaffinity="1",
                    ),
                )
    return ET.tostring(root, encoding="unicode")


def main():
    assets = tempfile.mkdtemp(prefix="kmanip_ref_assets_")
    # build ALL xmls first: build_env_xml imports gym_kmanip_tpu, which
    # registers OUR env ids -- the reference import below must come after so
    # its registrations win and gym.make returns the reference implementation
    from gym_kmanip_tpu.models import get_model as _get_model

    for env_id, (builtin, xml_name, arms, _clamp) in ENVS.items():
        with open(os.path.join(assets, xml_name), "w") as f:
            f.write(build_env_xml(builtin.split("_inrange")[0], xml_name))
    # jnt_range per builtin for home clamping (our loader's table is
    # validated against the reference trees in tests/test_mjcf_loader.py)
    jnt_ranges = {
        b.split("_inrange")[0]: _get_model(b.split("_inrange")[0]).jnt_range
        for b, _x, _a, _c in ENVS.values()
    }

    sys.path.insert(0, "/root/reference")
    import gym_kmanip as ref_k

    ref_k.ASSETS_DIR = assets
    import gymnasium as gym

    for env_id, (builtin, xml_name, arms, clamp) in ENVS.items():
        try:
            env = gym.make(env_id.split("#")[0])
            q_home_used = np.asarray(env.unwrapped.q_pos_home, np.float64).copy()
            if clamp:
                rng_tab = jnt_ranges[builtin.split("_inrange")[0]]
                lo, hi = rng_tab[:, 0], rng_tab[:, 1]
                outside = (q_home_used < lo) | (q_home_used > hi)
                q_home_used = np.where(
                    outside,
                    np.clip(q_home_used, lo + CLAMP_MARGIN, hi - CLAMP_MARGIN),
                    q_home_used,
                )
                print(f"{env_id}: clamped {int(outside.sum())} home joints "
                      f"into range")
                # the reference reads self.q_pos_home at every reset AND as
                # the IK home regularizer (env_sim.py:26-27,77,97)
                env.unwrapped.q_pos_home = q_home_used
            np.random.seed(SEED)  # the reference cube spawn uses np.random
            obs, info = env.reset(seed=SEED)
        except Exception as e:
            print(f"{env_id}: SKIPPED ({type(e).__name__}: {str(e)[:120]})")
            continue
        cube_spawn = env.unwrapped.env._physics.data.qpos[-7:-4].copy()

        rng = np.random.RandomState(SEED)
        phys = env.unwrapped.env._physics
        actions, qpos_obs, qvel_obs, cube_obs, rewards = [], [], [], [], []
        # raw per-step internals for component-wise parity attribution
        # (tests/test_env_parity.py + tools/diag_env_parity.py):
        raw_qpos_pre, raw_qvel_pre = [], []  # full MuJoCo qpos/qvel BEFORE step
        raw_ctrl, raw_mocap = [], []  # ctrl after before_step (IK output); mocap goals
        raw_qpos_post, raw_qvel_post = [], []
        raw_warmstart = []  # qacc_warmstart BEFORE step (solver hidden state)
        for t in range(N_STEPS):
            act = {}
            scale = INRANGE_ACTION_SCALE if clamp else 1.0
            for side in arms:
                act[f"{side}_pos"] = (
                    scale * rng.uniform(-1, 1, 3)
                ).astype(np.float32)
                act[f"{side}_orn"] = np.zeros(3, dtype=np.float32)
                act[f"grip_{side[-1]}"] = np.zeros(1, dtype=np.float32)
            raw_qpos_pre.append(phys.data.qpos.copy())
            raw_qvel_pre.append(phys.data.qvel.copy())
            raw_warmstart.append(phys.data.qacc_warmstart.copy())
            obs, reward, term, trunc, info = env.step(act)
            raw_ctrl.append(phys.data.ctrl.copy())
            raw_mocap.append(
                np.concatenate([phys.data.mocap_pos.ravel(),
                                phys.data.mocap_quat.ravel()])
            )
            raw_qpos_post.append(phys.data.qpos.copy())
            raw_qvel_post.append(phys.data.qvel.copy())
            actions.append(
                np.concatenate([act[f"{s}_pos"] for s in arms])
            )
            qpos_obs.append(obs["q_pos"])
            qvel_obs.append(obs["q_vel"])
            cube_obs.append(obs["cube_pos"])
            rewards.append(reward)
        env.close()

        np.savez(
            os.path.join(OUT, f"{builtin}_env_trace.npz"),
            q_pos_home=q_home_used,
            cube_spawn=cube_spawn,
            actions=np.stack(actions),
            q_pos=np.stack(qpos_obs),
            q_vel=np.stack(qvel_obs),
            cube_pos=np.stack(cube_obs),
            reward=np.asarray(rewards),
            raw_qpos_pre=np.stack(raw_qpos_pre),
            raw_qvel_pre=np.stack(raw_qvel_pre),
            raw_ctrl=np.stack(raw_ctrl),
            raw_mocap=np.stack(raw_mocap),
            raw_qpos_post=np.stack(raw_qpos_post),
            raw_qvel_post=np.stack(raw_qvel_post),
            raw_warmstart=np.stack(raw_warmstart),
        )
        print(f"wrote {builtin}_env_trace.npz: {N_STEPS} steps, cube {cube_spawn.round(3)}")


if __name__ == "__main__":
    main()
