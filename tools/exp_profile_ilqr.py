"""Profile the fused iLQR solve's pieces on the real TPU.

Times each piece (derivs, backward, linesearch, rollout0, full fused solve)
by slope between 1 and 5 chained executions (cancels the ~25 ms tunnel
round-trip; varies inputs per call to defeat the tunnel's value cache).

Run: python tools/exp_profile_ilqr.py
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

    import os

    H = 100
    reduced = os.environ.get("PROFILE_REDUCED", "1") != "0"
    par = os.environ.get("PROFILE_PARALLEL", "0") != "0"
    cfg = ILQRConfig(
        horizon=H, n_iters=10, contact=False, reduced_state=reduced,
        parallel_backward=par,
    )
    print(f"reduced_state={reduced} parallel_backward={par}")
    us = jnp.tile(
        jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (H, 1)
    )
    x0 = flatten_state(state0, reduced=cfg.reduced_state)
    n = x0.shape[0]
    print(f"torso: nq={model.nq} nu={model.nu} state n={n} H={H}")

    rollout0, derivs, backward, linesearch, iteration, solve_fused = _pieces(
        model, cfg, state0, cost_xu, _zero_final, jnp.float32
    )

    xs, cost = rollout0(x0, us)
    np.asarray(xs)
    d = derivs(xs, us)
    lam0 = np.float32(0.0)
    ks, Ks = backward(*d, lam0)
    np.asarray(ks)

    def slope(chain, reps=2):
        """chain(k, seed) runs k chained ops and returns something syncable.
        Returns s/op by the slope between 1 and 5 chained calls."""
        def timed(k, seed):
            t0 = time.time()
            out = chain(k, seed)
            np.asarray(out)
            return time.time() - t0

        t1 = min(timed(1, s) for s in range(reps))
        t5 = min(timed(5, s + 10) for s in range(reps))
        return (t5 - t1) / 4

    # warm everything
    def chain_derivs(k, seed):
        out = None
        xs_in = xs + np.float32(1e-6 * seed)
        for i in range(k):
            out = derivs(xs_in, us)
            xs_in = xs_in + out[1][0, 0, 0] * np.float32(1e-9)
        return out[0]

    def chain_backward(k, seed):
        dd = derivs(xs + np.float32(1e-6 * seed), us)
        out = None
        dd = list(dd)
        for i in range(k):
            out = backward(*dd, lam0)
            dd[1] = dd[1] + out[0][0, 0] * np.float32(1e-9)
        return out[0]

    def chain_ls(k, seed):
        out = None
        ks_in = ks + np.float32(1e-6 * seed)
        for i in range(k):
            out = linesearch(x0, xs, us, ks_in, Ks)
            ks_in = ks_in + out[2] * np.float32(1e-9)
        return out[1]

    def chain_roll(k, seed):
        out = None
        us_in = us + np.float32(1e-6 * seed)
        for i in range(k):
            out = rollout0(x0, us_in)
            us_in = us_in + out[1] * np.float32(1e-9)
        return out[0]

    def chain_iter(k, seed):
        xs_in, us_in, c = xs + np.float32(1e-6 * seed), us, cost
        lam = np.float32(0.0)
        for i in range(k):
            xs_in, us_in, c, lam = iteration(x0, xs_in, us_in, c, lam)
        return us_in

    def chain_solve(k, seed):
        us_in = us + np.float32(1e-6 * seed)
        out = None
        for i in range(k):
            out = solve_fused(x0, us_in)
            us_in = out[1]
        return out[1]

    for name, ch in [
        ("rollout0", chain_roll),
        ("derivs", chain_derivs),
        ("backward", chain_backward),
        ("linesearch", chain_ls),
        ("iteration", chain_iter),
        ("solve_fused(10it)", chain_solve),
    ]:
        ch(1, 99)  # warm/compile
        dt = slope(ch)
        print(f"{name:20s} {dt*1e3:8.3f} ms/op")


if __name__ == "__main__":
    main()
