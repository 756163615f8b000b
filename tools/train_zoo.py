"""Train and ship the policy-zoo artifacts (gym_kmanip_tpu/zoo/*.npz).

Runs the examples/13_bc_pick.py pipeline (MPPI expert -> ACT hdf5 -> BC
train -> closed-loop eval on the real plant) and saves the trained policy
into the zoo with its provenance + eval numbers in the artifact meta.
Re-run to refresh artifacts after dynamics/cost changes.

Run: python tools/train_zoo.py [--episodes N] [--evals N]
"""

import argparse
import importlib
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--episodes", type=int, default=12)
    ap.add_argument("--ep-len", type=int, default=100)
    ap.add_argument("--train-steps", type=int, default=4000)
    ap.add_argument("--evals", type=int, default=12)
    ap.add_argument("--noise-p", type=float, default=0.25,
                    help="DART recovery-coverage kick probability")
    args = ap.parse_args()

    bc = importlib.import_module("gym_kmanip_tpu.examples.13_bc_pick")
    from gym_kmanip_tpu import zoo

    data_dir = tempfile.mkdtemp(prefix="kmanip_zoo_bc_")
    expert_rate = bc.record(
        data_dir, n_episodes=args.episodes, ep_len=args.ep_len,
        noise_p=args.noise_p,
    )
    policy, params, stats = bc.train(data_dir, n_steps=args.train_steps)
    rate = bc.evaluate(policy, n_evals=args.evals,
                       ep_len=int(args.ep_len * 1.2))
    out = os.path.join(os.path.dirname(zoo.__file__), "bc_pick_solo.npz")
    zoo.save_policy(
        out, params, stats,
        meta=dict(
            arch="bc_mlp", model="solo_arm", hidden=256,
            trained_by="tools/train_zoo.py",
            n_expert_episodes=args.episodes,
            expert_success_rate=float(expert_rate),
            eval_success_rate=float(rate),
            spawn_center=list(map(float, bc.SPAWN_CENTER)),
            spawn_half=list(map(float, bc.SPAWN_HALF)),
            lift_dz=float(bc.LIFT_DZ),
        ),
    )
    print(f"saved {out}: expert {expert_rate:.2f}, bc {rate:.2f}")
    # reload check: the shipped artifact must reproduce the live policy
    import numpy as np

    from gym_kmanip_tpu.dynamics import init_state
    from gym_kmanip_tpu.models import get_model

    pol2, meta = zoo.load_policy("bc_pick_solo")
    s = init_state(get_model("solo_arm"),
                   cube_pos=np.asarray(bc.SPAWN_CENTER))
    np.testing.assert_allclose(
        np.asarray(policy(s)), np.asarray(pol2(s)), atol=1e-6
    )
    print(f"reload check OK (meta: {meta['eval_success_rate']=})")


if __name__ == "__main__":
    main()
