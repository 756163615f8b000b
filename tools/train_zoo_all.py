"""Record + train + ship the dual-arm and torso zoo artifacts.

Same recipe that won for the solo artifact (expert episodes with DART
kicks, success-filtered BC at 512x3 + cosine LR, NO DAgger — measured
net-harmful) with per-model spawn ranges:

  * dual_arm — the full reference CUBE_SPAWN_RANGE (the right arm covers
    it; the per-arm-min expert cost sends the closest arm).
  * torso    — y clipped to [0.50, 0.54]: the torso's arms PHYSICALLY
    cannot reach most of the reference spawn range (measured min
    tip-cube distance 0.15-0.21 m for y > 0.55 even under the expert;
    the reference env has the same geometry — its reward's touch/lift
    simply never fires upstream). The artifact documents its honest
    envelope in meta.

Run: python tools/train_zoo_all.py [--models dual_arm,torso]
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ARTIFACT_NAME = {"dual_arm": "bc_pick_dual", "torso": "bc_pick_torso"}


def spawn_range_for(model_name, bc):
    r = np.asarray(bc.SPAWN_RANGE, np.float64).copy()
    if model_name == "torso":
        r[1] = [0.50, 0.54]
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", default="dual_arm,torso")
    ap.add_argument("--episodes", type=int, default=48)
    ap.add_argument("--ep-len", type=int, default=110)
    ap.add_argument("--train-steps", type=int, default=12000)
    ap.add_argument("--evals", type=int, default=24)
    ap.add_argument("--data-root", default="/tmp/kmanip_zoo")
    args = ap.parse_args()

    bc = importlib.import_module("gym_kmanip_tpu.examples.13_bc_pick")
    from gym_kmanip_tpu import zoo
    from gym_kmanip_tpu.dynamics import init_state
    from gym_kmanip_tpu.models import get_model

    for model_name in args.models.split(","):
        rng = spawn_range_for(model_name, bc)
        data_dir = os.path.join(args.data_root, model_name)
        os.makedirs(data_dir, exist_ok=True)
        have = len([f for f in os.listdir(data_dir)
                    if f.startswith("episode_")])
        if have < args.episodes:
            expert_rate = bc.record(
                data_dir, n_episodes=args.episodes - have,
                ep_len=args.ep_len, noise_p=0.25, model_name=model_name,
                spawn_range=rng, ep0=have, n_samples=384,
            )
        else:
            expert_rate = -1.0
        policy, params, stats = bc.train(
            data_dir, n_steps=args.train_steps, model_name=model_name,
            hidden=512, depth=3, log=lambda *a: None,
        )
        rate = bc.evaluate(policy, n_evals=args.evals, ep_len=160,
                           model_name=model_name, spawn_range=rng,
                           seed=4242, log=lambda *a: None)
        name = ARTIFACT_NAME[model_name]
        out = os.path.join(os.path.dirname(zoo.__file__), f"{name}.npz")
        zoo.save_policy(
            out, params, stats,
            meta=dict(
                arch="bc_mlp", model=model_name, hidden=512, depth=3,
                trained_by="tools/train_zoo_all.py",
                n_expert_episodes=args.episodes,
                expert_success_rate=float(expert_rate),
                eval_success_rate=float(rate),
                eval_episodes=int(args.evals), eval_ep_len=160,
                eval_seed=4242,
                spawn_range=[list(map(float, row)) for row in rng],
                spawn_note=("y clipped to the torso's measured reachable "
                            "band" if model_name == "torso" else
                            "full reference CUBE_SPAWN_RANGE"),
                lift_dz=float(bc.LIFT_DZ),
            ),
        )
        print(f"{name}: expert {expert_rate:.2f}, bc {rate:.2f} -> {out}",
              flush=True)
        pol2, meta = zoo.load_policy(name)
        s = init_state(get_model(model_name),
                       cube_pos=np.asarray(rng.mean(axis=1)))
        np.testing.assert_allclose(np.asarray(policy(s)),
                                   np.asarray(pol2(s)), atol=1e-5)
        print(f"{name}: reload check OK", flush=True)


if __name__ == "__main__":
    main()
