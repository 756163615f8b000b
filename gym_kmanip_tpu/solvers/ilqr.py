"""iLQR trajectory optimization over the full manipulation state.

TPU-first gradient-based counterpart to MPPI (no reference analog; the
BASELINE north star asks for "batched damped-LS IK -> SQP/iLQR" on these
dynamics). Everything is one jitted program:

  * dynamics linearization: `vmap(jacfwd(f))` over the whole trajectory --
    H small Jacobians computed as one batched pass instead of a Python loop
  * cost quadratization: vmapped grad/hessian of the running cost
  * backward pass: Riccati recursion as `lax.scan` (reversed), with
    Levenberg-style regularization on Quu
  * forward pass: line search over a fixed alpha schedule, all candidates
    rolled out under `vmap`, best improvement selected with `argmin` --
    XLA-friendly control flow, no host round-trips

State layout x = [qpos, qvel, cube_pos, cube_quat, cube_linvel,
cube_angvel] (2*nq + 13). The quaternion is treated ambiently; at MPC step
sizes the drift is negligible and the dynamics renormalize each step.

Costs must be smooth (use mpc.cost.ee_tracking_cost or a smooth pick cost);
the discontinuous touch/lift bonuses belong to MPPI.
"""

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.dynamics.state import SimState
from gym_kmanip_tpu.models.spec import RobotModel
from gym_kmanip_tpu.mpc.rollout import mpc_step


class ILQRConfig(NamedTuple):
    horizon: int = 50
    n_iters: int = 10
    reg: float = 1e-6
    alphas: Tuple[float, ...] = (1.0, 0.6, 0.3, 0.1, 0.03, 0.01)
    n_substeps: int = 1
    dt: float = k.CONTROL_TIMESTEP


def flatten_state(s: SimState) -> jax.Array:
    return jnp.concatenate(
        [s.qpos, s.qvel, s.cube_pos, s.cube_quat, s.cube_linvel, s.cube_angvel]
    )


def unflatten_state(model: RobotModel, x: jax.Array, template: SimState) -> SimState:
    nq = model.nq
    return SimState(
        qpos=x[:nq],
        qvel=x[nq : 2 * nq],
        ctrl=template.ctrl,
        cube_pos=x[2 * nq : 2 * nq + 3],
        cube_quat=x[2 * nq + 3 : 2 * nq + 7],
        cube_linvel=x[2 * nq + 7 : 2 * nq + 10],
        cube_angvel=x[2 * nq + 10 : 2 * nq + 13],
        time=template.time,
    )


class ILQRResult(NamedTuple):
    us: jax.Array  # (H, nu) optimized controls
    xs: jax.Array  # (H+1, n) optimized trajectory
    cost: jax.Array  # () final total cost
    cost_trace: jax.Array  # (n_iters,) cost after each iteration


def ilqr_solve(
    model: RobotModel,
    cfg: ILQRConfig,
    state0: SimState,
    u_init: jax.Array,  # (H, nu)
    cost_xu: Callable,  # (x, u) -> scalar running cost
    cost_final: Optional[Callable] = None,  # (x) -> scalar
) -> ILQRResult:
    if cost_final is None:
        cost_final = lambda x: jnp.asarray(0.0, dtype=u_init.dtype)

    template = state0
    n = 2 * model.nq + 13
    nu = model.nu

    def f(x, u):
        s = unflatten_state(model, x, template)
        s2, _ = mpc_step(model, s, u, cfg.n_substeps, cfg.dt)
        return flatten_state(s2)

    def traj_rollout(x0, us):
        def body(x, u):
            x2 = f(x, u)
            return x2, x2

        _, xs_tail = jax.lax.scan(body, x0, us)
        return jnp.concatenate([x0[None], xs_tail], axis=0)  # (H+1, n)

    def total_cost(xs, us):
        run = jax.vmap(cost_xu)(xs[:-1], us).sum()
        return run + cost_final(xs[-1])

    x0 = flatten_state(state0)

    # derivative builders, vmapped over the horizon
    fx_fn = jax.vmap(jax.jacfwd(f, argnums=0))
    fu_fn = jax.vmap(jax.jacfwd(f, argnums=1))
    cx_fn = jax.vmap(jax.grad(cost_xu, argnums=0))
    cu_fn = jax.vmap(jax.grad(cost_xu, argnums=1))
    cxx_fn = jax.vmap(jax.hessian(cost_xu, argnums=0))
    cuu_fn = jax.vmap(jax.hessian(cost_xu, argnums=1))
    cux_fn = jax.vmap(jax.jacfwd(jax.grad(cost_xu, argnums=1), argnums=0))

    eye_u = jnp.eye(nu, dtype=u_init.dtype)

    def backward(xs, us):
        A = fx_fn(xs[:-1], us)  # (H,n,n)
        B = fu_fn(xs[:-1], us)  # (H,n,nu)
        cx = cx_fn(xs[:-1], us)
        cu = cu_fn(xs[:-1], us)
        cxx = cxx_fn(xs[:-1], us)
        cuu = cuu_fn(xs[:-1], us)
        cux = cux_fn(xs[:-1], us)

        Vx_T = jax.grad(cost_final)(xs[-1])
        Vxx_T = jax.hessian(cost_final)(xs[-1])

        def step(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
            Qx = cx_t + A_t.T @ Vx
            Qu = cu_t + B_t.T @ Vx
            Qxx = cxx_t + A_t.T @ Vxx @ A_t
            Quu = cuu_t + B_t.T @ Vxx @ B_t + cfg.reg * eye_u
            Qux = cux_t + B_t.T @ Vxx @ A_t
            # symmetrize + solve
            Quu = 0.5 * (Quu + Quu.T)
            Kk = -jnp.linalg.solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
            kff = Kk[:, 0]
            K = Kk[:, 1:]
            Vx_n = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n), (kff, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            step, (Vx_T, Vxx_T), (A, B, cx, cu, cxx, cuu, cux), reverse=True
        )
        return ks, Ks  # (H,nu), (H,nu,n)

    lo = jnp.asarray(model.ctrl_range[:, 0], dtype=u_init.dtype)
    hi = jnp.asarray(model.ctrl_range[:, 1], dtype=u_init.dtype)

    def forward(xs, us, ks, Ks, alpha):
        def body(x, inp):
            x_nom, u_nom, kff, K = inp
            u = jnp.clip(u_nom + alpha * kff + K @ (x - x_nom), lo, hi)
            x2 = f(x, u)
            return x2, (x2, u)

        _, (xs_tail, us_new) = jax.lax.scan(body, x0, (xs[:-1], us, ks, Ks))
        xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs_new, us_new, total_cost(xs_new, us_new)

    def iteration(carry, _):
        xs, us, cost = carry
        ks, Ks = backward(xs, us)
        alphas = jnp.asarray(cfg.alphas, dtype=u_init.dtype)
        xs_c, us_c, costs_c = jax.vmap(lambda a: forward(xs, us, ks, Ks, a))(alphas)
        best = jnp.argmin(costs_c)
        improved = costs_c[best] < cost
        xs = jnp.where(improved, xs_c[best], xs)
        us = jnp.where(improved, us_c[best], us)
        cost = jnp.where(improved, costs_c[best], cost)
        return (xs, us, cost), cost

    xs0 = traj_rollout(x0, u_init)
    c0 = total_cost(xs0, u_init)
    (xs, us, cost), trace = jax.lax.scan(
        iteration, (xs0, u_init, c0), None, length=cfg.n_iters
    )
    return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=trace)


def make_ilqr_solver(model: RobotModel, cfg: ILQRConfig, cost_xu, cost_final=None):
    return jax.jit(
        partial(ilqr_solve, model, cfg, cost_xu=cost_xu, cost_final=cost_final)
    )
