"""Ablation timing of the REAL fused torso H=100 iLQR solve.

Times solve_fused for config variants by chained dependent solves
(us_in = previous result), 2-point slope over n_iters where applicable:

  * base n_iters=10 vs n_iters=4  -> true per-iteration cost in-program
  * alphas=(1.0,)                 -> line-search width ablation
  * fb_kernel=True                -> megakernel forward passes

Run: python tools/exp_ilqr_ablate.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.solvers.ilqr import (
    ILQRConfig,
    _pieces,
    _zero_final,
    flatten_state,
    unflatten_state,
)


def main():
    model = get_model("torso")
    state0 = init_state(model)
    xp, xq, _ = kin.fk(model, state0.qpos)
    p, _ = kin.site_pose(model, xp, xq, "eer_site")
    goal = p + jnp.asarray([0.0, 0.05, -0.05])

    def cost_xu(x, u):
        s = unflatten_state(model, x, state0)
        xp2, xq2, _ = kin.fk(model, s.qpos)
        pp, _ = kin.site_pose(model, xp2, xq2, "eer_site")
        return (
            50.0 * jnp.sum((pp - goal) ** 2)
            + 0.01 * jnp.sum(s.qvel**2)
            + 0.001 * jnp.sum(u**2)
        )

    H = 100
    us = jnp.tile(
        jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (H, 1)
    )

    def timed(cfg, label):
        pieces = _pieces(model, cfg, state0, cost_xu, _zero_final, jnp.float32)
        solve_fused = pieces[5]
        x0 = flatten_state(state0, reduced=cfg.reduced_state)

        def chain(k, seed):
            us_in = us + np.float32(1e-6 * seed)
            out = None
            for _ in range(k):
                out = solve_fused(x0, us_in)
                us_in = out[1]
            return out[1]

        np.asarray(chain(1, 99))  # compile
        def t(k):
            best = np.inf
            for s in range(3):
                t0 = time.time()
                np.asarray(chain(k, s))
                best = min(best, time.time() - t0)
            return best

        t1, t5 = t(1), t(5)
        per = (t5 - t1) / 4
        print(f"{label:28s} {per*1e3:8.3f} ms/solve  trace_last="
              f"{float(np.asarray(solve_fused(x0, us)[3])[-1]):.4f}")
        return per

    import os
    base = ILQRConfig(horizon=H, n_iters=10, contact=False,
                      reduced_state=True)
    which = os.environ.get("ABLATE", "base,slope").split(",")
    if "base" in which:
        p10 = timed(base, "base n_iters=10")
    if "slope" in which:
        p4 = timed(base._replace(n_iters=4), "base n_iters=4")
        print(f"{'per-iteration (slope)':28s} {(p10 - p4) / 6 * 1e3:8.3f} ms")
    if "alpha1" in which:
        timed(base._replace(alphas=(1.0,)), "alphas=(1.0,)")
    if "fb" in which:
        timed(base._replace(fb_kernel=True), "fb_kernel=True")


if __name__ == "__main__":
    main()
