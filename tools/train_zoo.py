"""Train and ship the policy-zoo artifacts (gym_kmanip_tpu/zoo/*.npz).

Runs the examples/13_bc_pick.py pipeline (MPPI expert -> ACT hdf5 -> BC
train -> closed-loop eval on the real plant) over the FULL reference
spawn randomization (constants.CUBE_SPAWN_RANGE) and saves the trained
policy into the zoo with its provenance + eval numbers in the artifact
meta. Re-run to refresh artifacts after dynamics/cost changes.

Run: python tools/train_zoo.py [--model solo_arm] [--episodes N] ...
"""

import argparse
import importlib
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

ARTIFACT_NAME = {
    "solo_arm": "bc_pick_solo",
    "dual_arm": "bc_pick_dual",
    "torso": "bc_pick_torso",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="solo_arm",
                    choices=sorted(ARTIFACT_NAME))
    ap.add_argument("--episodes", type=int, default=64)
    ap.add_argument("--ep-len", type=int, default=100)
    ap.add_argument("--train-steps", type=int, default=8000)
    ap.add_argument("--evals", type=int, default=16)
    ap.add_argument("--noise-p", type=float, default=0.25,
                    help="DART recovery-coverage kick probability")
    ap.add_argument("--dagger-rounds", type=int, default=3)
    ap.add_argument("--dagger-episodes", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=256)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--data-dir", default=None,
                    help="reuse a recorded dataset instead of re-recording")
    args = ap.parse_args()

    bc = importlib.import_module("gym_kmanip_tpu.examples.13_bc_pick")
    from gym_kmanip_tpu import zoo

    data_dir = args.data_dir or tempfile.mkdtemp(
        prefix=f"kmanip_zoo_bc_{args.model}_"
    )
    if args.data_dir and os.path.isdir(args.data_dir) and os.listdir(
            args.data_dir):
        expert_rate = -1.0  # reused dataset: rate recorded at record time
    else:
        expert_rate = bc.record(
            data_dir, n_episodes=args.episodes, ep_len=args.ep_len,
            noise_p=args.noise_p, model_name=args.model,
            spawn_range=bc.SPAWN_RANGE,
        )
    # previously-collected DAgger labels (saved below) seed this run, so
    # successive invocations accumulate instead of starting over
    dagger_path = os.path.join(data_dir, "dagger_labels.npz")
    extra = None
    if os.path.exists(dagger_path):
        d = np.load(dagger_path)
        extra = (d["X"], d["Y"])
        print(f"resuming with {extra[0].shape[0]} saved dagger labels")
    policy, params, stats = bc.train(
        data_dir, n_steps=args.train_steps, model_name=args.model,
        extra_data=extra, hidden=args.hidden, depth=args.depth,
    )
    # DAgger rounds: label the learner's own trajectories with the expert
    # and retrain on everything (pure BC plateaued at 0.25 full-range vs
    # the expert's 0.78 — covariate shift; see bc.dagger_collect)
    # Ship the BEST policy across rounds, not the last: retraining is
    # stochastic (fresh minibatch order on a grown dataset) and measured
    # round-to-round closed-loop swings are +-0.2 — selection uses a
    # fixed-seed 12-episode eval, the shipped number a fresh 24-episode
    # one.
    r0 = bc.evaluate(policy, n_evals=12, ep_len=int(args.ep_len * 1.2),
                      model_name=args.model, spawn_range=bc.SPAWN_RANGE,
                      seed=7777, log=lambda *a: None)
    print(f"initial policy: selection eval {r0:.2f}", flush=True)
    best = (r0, params, stats, policy)
    rnd0 = 0 if extra is None else extra[0].shape[0] // 1600  # round count
    for rnd in range(rnd0, rnd0 + args.dagger_rounds):
        Xd, Yd = bc.dagger_collect(
            policy, n_episodes=args.dagger_episodes, ep_len=args.ep_len,
            seed=1000 + 97 * rnd, model_name=args.model,
            spawn_range=bc.SPAWN_RANGE,
        )
        if extra is None:
            extra = (Xd, Yd)
        else:
            extra = (np.concatenate([extra[0], Xd]),
                     np.concatenate([extra[1], Yd]))
        np.savez(dagger_path, X=extra[0], Y=extra[1])
        policy, params, stats = bc.train(
            data_dir, n_steps=args.train_steps, model_name=args.model,
            extra_data=extra, hidden=args.hidden, depth=args.depth,
        )
        r = bc.evaluate(policy, n_evals=12, ep_len=int(args.ep_len * 1.2),
                        model_name=args.model, spawn_range=bc.SPAWN_RANGE,
                        seed=7777, log=lambda *a: None)
        print(f"dagger round {rnd}: selection eval {r:.2f} "
              f"({extra[0].shape[0]} dagger labels)", flush=True)
        if r > best[0]:
            best = (r, params, stats, policy)
    if best[0] >= 0.0:
        _selrate, params, stats, policy = best
        print(f"shipping the best round (selection eval {_selrate:.2f})")
    rate = bc.evaluate(policy, n_evals=args.evals,
                       ep_len=int(args.ep_len * 1.2),
                       model_name=args.model, spawn_range=bc.SPAWN_RANGE)
    name = ARTIFACT_NAME[args.model]
    out = os.path.join(os.path.dirname(zoo.__file__), f"{name}.npz")
    if os.path.exists(out):
        prev = zoo.load_artifact(name).meta.get("eval_success_rate", 0.0)
        if rate < float(prev):
            print(f"NOT shipping: {rate:.2f} < shipped artifact's "
                  f"{prev:.2f} (re-run to draw again; labels are saved)")
            return
    zoo.save_policy(
        out, params, stats,
        meta=dict(
            arch="bc_mlp", model=args.model, hidden=args.hidden,
            depth=args.depth,
            trained_by="tools/train_zoo.py",
            n_expert_episodes=args.episodes,
            dagger_rounds=int(args.dagger_rounds),
            dagger_episodes_per_round=int(args.dagger_episodes),
            expert_success_rate=float(expert_rate),
            eval_success_rate=float(rate),
            eval_episodes=int(args.evals),
            spawn_range=[list(map(float, r)) for r in bc.SPAWN_RANGE],
            lift_dz=float(bc.LIFT_DZ),
        ),
    )
    print(f"saved {out}: expert {expert_rate:.2f}, bc {rate:.2f}")
    # reload check: the shipped artifact must reproduce the live policy
    from gym_kmanip_tpu.dynamics import init_state
    from gym_kmanip_tpu.models import get_model

    pol2, meta = zoo.load_policy(name)
    s = init_state(get_model(args.model),
                   cube_pos=np.asarray(bc.SPAWN_RANGE.mean(axis=1)))
    np.testing.assert_allclose(
        np.asarray(policy(s)), np.asarray(pol2(s)), atol=1e-6
    )
    print(f"reload check OK (meta: {meta['eval_success_rate']=})")


if __name__ == "__main__":
    main()
