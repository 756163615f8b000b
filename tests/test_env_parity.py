"""End-to-end env parity vs the ACTUAL reference implementation.

tools/make_golden_env.py executes the reference gym-kmanip env (dm_control +
real MuJoCo + scipy IK) against mesh-free assets with matched inertials and
records a 20-step KManipSoloArm trace. This test replays the identical
action sequence through OUR jitted task core from the same cube spawn and
compares the full pipeline -- EE-delta action decode, IK, 10x2ms physics,
obs normalization, reward shaping.

Tolerances: the two IK solvers find slightly different minima of the same
residual each step (scipy adaptive TRF vs fixed-budget LM) and the arm
integrates those differences forward, so q_pos obs (range-normalized) get
a few-percent band; the cube is untouched by the scripted sequence so its
obs should match tightly.
"""

import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "solo_arm_env_trace.npz")


@pytest.mark.skipif(not os.path.exists(GOLDEN), reason="golden env trace missing")
def test_env_trace_matches_reference():
    import jax.numpy as jnp

    from gym_kmanip_tpu.env.config import CONFIGS
    from gym_kmanip_tpu.env.task import make_task

    data = np.load(GOLDEN)
    reset_fn, step_fn, model = make_task(CONFIGS["KManipSoloArm"])
    out = reset_fn(jnp.asarray(data["cube_spawn"], dtype=jnp.float32))
    state = out.state

    n = data["actions"].shape[0]
    q_pos_dev, cube_dev, reward_dev = [], [], []
    for t in range(n):
        a = data["actions"][t]
        action = {
            "eer_pos": jnp.asarray(a[:3], dtype=jnp.float32),
            "eer_orn": jnp.asarray(a[3:6], dtype=jnp.float32),
            "grip_r": jnp.asarray(a[6:7], dtype=jnp.float32),
        }
        out = step_fn(state, action)
        state = out.state
        q_pos_dev.append(np.abs(np.asarray(out.obs["q_pos"]) - data["q_pos"][t]))
        cube_dev.append(np.abs(np.asarray(out.obs["cube_pos"]) - data["cube_pos"][t]))
        reward_dev.append(abs(float(out.reward) - float(data["reward"][t])))

    q_pos_dev = np.stack(q_pos_dev)
    cube_dev = np.stack(cube_dev)
    print(f"max q_pos obs dev: {q_pos_dev.max():.4f} (range-normalized)")
    print(f"max cube obs dev:  {cube_dev.max():.4f}")
    print(f"max reward dev:    {max(reward_dev):.4f}")

    # arm joints: a few percent of joint range over 20 accumulated steps
    assert q_pos_dev[:, :7].max() < 0.05
    # cube: the spawn drops ~2.6 cm onto the table and the two soft-contact
    # models (MuJoCo solref/solimp vs penalty) ring differently during the
    # settling transient; what must agree is the steady state
    assert cube_dev[-1].max() < 0.01, "settled cube position diverged"
    assert cube_dev.max() < 0.2  # transient band
    # reward (vel penalty + inverse-distance shaping): same ballpark
    assert max(reward_dev) < 0.25
