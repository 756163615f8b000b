"""Best-of-N training draws on the FIXED current dataset.

BC retraining is a stochastic draw (measured closed-loop spread ~+-0.1 at
identical data); this tool trains `--seeds` networks, selects on a
24-episode eval, re-evals the winner on a fresh 24-episode set, and ships
it through the same never-regress guard as tools/train_zoo.py.

Run: python tools/select_zoo.py --data-dir <dir> [--seeds 5]
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="solo_arm")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--seeds", type=int, default=5)
    ap.add_argument("--train-steps", type=int, default=15000)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--ep-len", type=int, default=160)
    ap.add_argument("--force", action="store_true",
                    help="ship even if below the recorded rate (use when "
                         "the new eval protocol is stricter than the old)")
    ap.add_argument("--dagger-slice", default=":",
                    help="numpy slice of the saved dagger buffer, e.g. "
                         "'7200:14400' or '0:0' for none")
    args = ap.parse_args()

    bc = importlib.import_module("gym_kmanip_tpu.examples.13_bc_pick")
    from gym_kmanip_tpu import zoo

    ARTIFACT_NAME = {"solo_arm": "bc_pick_solo", "dual_arm": "bc_pick_dual",
                     "torso": "bc_pick_torso"}

    dagger_path = os.path.join(args.data_dir, "dagger_labels.npz")
    extra = None
    if os.path.exists(dagger_path):
        d = np.load(dagger_path)
        lo, _, hi = args.dagger_slice.partition(":")
        sl = slice(int(lo) if lo else None, int(hi) if hi else None)
        X, Y = d["X"][sl], d["Y"][sl]
        extra = (X, Y) if X.shape[0] else None
        print(f"{X.shape[0]} dagger labels (slice {args.dagger_slice}) "
              f"+ expert episodes")

    best = (-1.0, None)
    for seed in range(args.seeds):
        policy, params, stats = bc.train(
            args.data_dir, n_steps=args.train_steps, model_name=args.model,
            extra_data=extra, hidden=args.hidden, depth=args.depth,
            seed=seed, log=lambda *a: None,
        )
        r = bc.evaluate(policy, n_evals=24, ep_len=args.ep_len,
                        model_name=args.model, spawn_range=bc.SPAWN_RANGE,
                        seed=7777, log=lambda *a: None)
        print(f"seed {seed}: selection eval {r:.2f}", flush=True)
        if r > best[0]:
            best = (r, (policy, params, stats))
    sel, (policy, params, stats) = best
    # the SHIPPED number comes from a large fresh eval on a seed never
    # used for selection (48 episodes, ~0.07 binomial sigma): selection
    # on one 24-episode set and reporting on another measured a +-0.1
    # spread between seed sets, so a selection-seed number would carry
    # winner's-curse bias
    rate = bc.evaluate(policy, n_evals=48, ep_len=args.ep_len,
                       model_name=args.model, spawn_range=bc.SPAWN_RANGE,
                       seed=4242, log=lambda *a: None)
    print(f"winner: selection {sel:.2f}, fresh 48-ep eval {rate:.2f}")

    name = ARTIFACT_NAME[args.model]
    out = os.path.join(os.path.dirname(zoo.__file__), f"{name}.npz")
    if os.path.exists(out) and not args.force:
        prev = zoo.load_artifact(name).meta.get("eval_success_rate", 0.0)
        if rate < float(prev):
            print(f"NOT shipping: {rate:.2f} < shipped {prev:.2f} "
                  f"(--force to override, e.g. when the eval protocol "
                  f"changed)")
            return
    zoo.save_policy(
        out, params, stats,
        meta=dict(
            arch="bc_mlp", model=args.model, hidden=args.hidden,
            depth=args.depth, trained_by="tools/select_zoo.py",
            selection_seeds=int(args.seeds),
            eval_success_rate=float(rate),
            eval_episodes=48, eval_ep_len=int(args.ep_len),
            spawn_range=[list(map(float, r_)) for r_ in bc.SPAWN_RANGE],
            lift_dz=float(bc.LIFT_DZ),
        ),
    )
    print(f"saved {out}: bc {rate:.2f}")


if __name__ == "__main__":
    main()
