"""Train and ship the pixels-BC zoo artifact (bc_pixels_solo.npz).

Reuses the state pipeline's dataset (expert episodes + DAgger labels from
tools/train_zoo.py), re-renders the frames, trains the CNN policy
(examples/15_bc_pixels.py), evals closed-loop over the full spawn range,
and ships the artifact with its provenance.

Run: python tools/train_zoo_pixels.py --data-dir <13_bc_pick data dir>
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--train-steps", type=int, default=8000)
    ap.add_argument("--evals", type=int, default=16)
    args = ap.parse_args()

    px = importlib.import_module("gym_kmanip_tpu.examples.15_bc_pixels")
    bc = importlib.import_module("gym_kmanip_tpu.examples.13_bc_pick")
    from gym_kmanip_tpu import zoo
    from gym_kmanip_tpu.dynamics import init_state
    from gym_kmanip_tpu.models import get_model

    policy, params, stats = px.train(args.data_dir,
                                     n_steps=args.train_steps)
    rate = bc.evaluate(policy, n_evals=args.evals, ep_len=120,
                       spawn_range=bc.SPAWN_RANGE)
    out = os.path.join(os.path.dirname(zoo.__file__), "bc_pixels_solo.npz")
    zoo.save_policy(
        out, params, stats,
        meta=dict(
            arch="bc_pixels_cnn", model="solo_arm", hidden=256,
            cam=px.CAM, img_h=px.H_PX, img_w=px.W_PX,
            trained_by="tools/train_zoo_pixels.py",
            data_dir_episodes=True,
            eval_success_rate=float(rate),
            eval_episodes=int(args.evals),
            spawn_range=[list(map(float, r)) for r in bc.SPAWN_RANGE],
            lift_dz=float(bc.LIFT_DZ),
        ),
    )
    print(f"saved {out}: pixels bc {rate:.2f}")
    pol2, meta = zoo.load_policy("bc_pixels_solo")
    s = init_state(get_model("solo_arm"),
                   cube_pos=np.asarray(bc.SPAWN_RANGE.mean(axis=1)))
    np.testing.assert_allclose(
        np.asarray(policy(s)), np.asarray(pol2(s)), atol=1e-5
    )
    print(f"reload check OK ({meta['eval_success_rate']=})")


if __name__ == "__main__":
    main()
