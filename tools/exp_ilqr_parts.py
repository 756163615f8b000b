"""Decompose the fused torso H=100 iLQR iteration into its parts on-chip.

Times each part as a jitted chain of REPS dependent executions (one
dispatch, immune to the ~23 ms tunnel RTT and its value cache):

  * fd_batch   — the H x (2n+2m) finite-difference dynamics probes
  * quad_cost  — grad/hessian cost quadratization (the rest of derivs)
  * sweep      — the Pallas Riccati backward kernel
  * linesearch — 6-alpha forward pass (scan over H through the fused kernel)

Run: python tools/exp_ilqr_parts.py
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

REPS = 30


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
    cfg = ILQRConfig(horizon=H, n_iters=10, contact=False, reduced_state=True)
    us = jnp.tile(
        jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (H, 1)
    )
    x0 = flatten_state(state0, reduced=True)
    n = x0.shape[0]
    nu = model.nu
    print(f"torso: nq={model.nq} nu={nu} n={n} H={H} reps={REPS}")

    pieces = _pieces(model, cfg, state0, cost_xu, _zero_final, jnp.float32)
    rollout0, derivs, backward, linesearch, iteration, solve_fused = pieces
    xs, cost = rollout0(x0, us)
    d = derivs(xs, us)
    lam0 = np.float32(0.0)
    ks, Ks = backward(*d, lam0)
    np.asarray(ks)

    # ---- part programs -------------------------------------------------
    from gym_kmanip_tpu.mpc.rollout import mpc_step
    from gym_kmanip_tpu.ops.pallas_riccati import riccati_sweep_pallas

    template = state0
    lo = jnp.asarray(model.ctrl_range[:, 0], jnp.float32)
    hi = jnp.asarray(model.ctrl_range[:, 1], jnp.float32)

    def f_fast(x, u):
        s = unflatten_state(model, x, template)
        s2, _ = mpc_step(model, s, u, cfg.n_substeps, cfg.dt,
                         contact=False, unrolled_solve=True)
        return flatten_state(s2, reduced=True)

    nb = 2 * (n + nu)  # probe batch per step

    @jax.jit
    def chain_fd(xs_in):
        def body(c, _):
            X = c[:-1]
            Xp = jnp.broadcast_to(X[:, None, :], (H, nb, n)).reshape(-1, n)
            Up = jnp.broadcast_to(us[:, None, :], (H, nb, nu)).reshape(-1, nu)
            Y = jax.vmap(f_fast)(Xp, Up).reshape(H, nb, n)
            return c + 1e-9 * Y[0, 0, 0], None

        out, _ = jax.lax.scan(body, xs_in, None, length=REPS)
        return out

    @jax.jit
    def chain_quad(xs_in):
        def body(c, _):
            X, U = c[:-1], us
            cx = jax.vmap(jax.grad(cost_xu, argnums=0))(X, U)
            cxx = jax.vmap(jax.hessian(cost_xu, argnums=0))(X, U)
            cuu = jax.vmap(jax.hessian(cost_xu, argnums=1))(X, U)
            cux = jax.vmap(
                jax.jacfwd(jax.grad(cost_xu, argnums=1), argnums=0)
            )(X, U)
            return c + 1e-9 * (cx[0, 0] + cxx[0, 0, 0] + cuu[0, 0, 0]
                               + cux[0, 0, 0]), None

        out, _ = jax.lax.scan(body, xs_in, None, length=REPS)
        return out

    A, B, cx, cu, cxx, cuu, cux, VxT, VxxT = d

    @jax.jit
    def chain_sweep(cx_in):
        def body(c, _):
            ks2, _Ks = riccati_sweep_pallas(
                A, B, c, cu, cxx, cuu, cux, VxT, VxxT, cfg.reg,
                lam_extra=0.0,
            )
            return c + 1e-9 * jnp.sum(ks2), None

        out, _ = jax.lax.scan(body, cx_in, None, length=REPS)
        return out

    @jax.jit
    def chain_ls(ks_in):
        def body(c, _):
            _xs, _us, cbest = _ls_inline(x0, xs, us, c, Ks)
            return c + 1e-9 * cbest, None

        out, _ = jax.lax.scan(body, ks_in, None, length=REPS)
        return out

    def total_cost(xs_, us_):
        return jax.vmap(cost_xu)(xs_[:-1], us_).sum()

    def _ls_inline(x0_, xs_, us_, ks_, Ks_):
        alphas = jnp.asarray(cfg.alphas, jnp.float32)

        def forward(alpha):
            def body(x, inp):
                x_nom, u_nom, kff, K = inp
                u = jnp.clip(u_nom + alpha * kff + K @ (x - x_nom), lo, hi)
                x2 = f_fast(x, u)
                return x2, (x2, u)

            _, (xs_tail, us_new) = jax.lax.scan(
                body, x0_, (xs_[:-1], us_, ks_, Ks_))
            xs_new = jnp.concatenate([x0_[None], xs_tail], axis=0)
            return xs_new, us_new, total_cost(xs_new, us_new)

        xs_c, us_c, costs_c = jax.vmap(forward)(alphas)
        best = jnp.argmin(costs_c)
        return xs_c[best], us_c[best], costs_c[best]

    def run(name, fn, arg):
        out = fn(arg)  # compile
        np.asarray(out)
        best = np.inf
        for rep in range(3):
            a = arg + np.float32(1e-6 * (rep + 1))
            t0 = time.time()
            np.asarray(fn(a))
            best = min(best, time.time() - t0)
        print(f"{name:12s} {best / REPS * 1e3:8.3f} ms/op")

    run("fd_batch", chain_fd, xs)
    run("quad_cost", chain_quad, xs)
    run("sweep", chain_sweep, cx)
    run("linesearch", chain_ls, ks)


if __name__ == "__main__":
    main()
