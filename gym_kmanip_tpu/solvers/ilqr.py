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
    # True: O(log H)-depth associative-scan Riccati (solvers/parallel_lqr),
    # the long-horizon sequence-parallel path; False: serial lax.scan sweep
    parallel_backward: bool = False


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


def _build_pieces(model, cfg, state0, cost_xu, cost_final, dtype):
    """Separately-jitted iLQR building blocks.

    One fused jit of the whole solve (derivs + backward + line search,
    scanned over iterations) produces a graph XLA takes tens of minutes to
    compile for 30-50 dim states; splitting into four moderate programs with
    a host-side iteration loop compiles in seconds and costs only a few
    dispatches per iteration.
    """
    template = state0
    n = 2 * model.nq + 13
    nu = model.nu
    eye_u = jnp.eye(nu, dtype=dtype)
    lo = jnp.asarray(model.ctrl_range[:, 0], dtype=dtype)
    hi = jnp.asarray(model.ctrl_range[:, 1], dtype=dtype)

    def f(x, u):
        s = unflatten_state(model, x, template)
        # lapack-style solve keeps the jacfwd graph ~10x smaller; iLQR wall
        # time is dominated by the linearization, not the rollout solve
        s2, _ = mpc_step(model, s, u, cfg.n_substeps, cfg.dt, unrolled_solve=False)
        return flatten_state(s2)

    def total_cost(xs, us):
        return jax.vmap(cost_xu)(xs[:-1], us).sum() + cost_final(xs[-1])

    @jax.jit
    def rollout0(x0, us):
        def body(x, u):
            x2 = f(x, u)
            return x2, x2

        _, xs_tail = jax.lax.scan(body, x0, us)
        xs = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs, total_cost(xs, us)

    @jax.jit
    def derivs(xs, us):
        A = jax.vmap(jax.jacfwd(f, argnums=0))(xs[:-1], us)
        B = jax.vmap(jax.jacfwd(f, argnums=1))(xs[:-1], us)
        cx = jax.vmap(jax.grad(cost_xu, argnums=0))(xs[:-1], us)
        cu = jax.vmap(jax.grad(cost_xu, argnums=1))(xs[:-1], us)
        cxx = jax.vmap(jax.hessian(cost_xu, argnums=0))(xs[:-1], us)
        cuu = jax.vmap(jax.hessian(cost_xu, argnums=1))(xs[:-1], us)
        cux = jax.vmap(jax.jacfwd(jax.grad(cost_xu, argnums=1), argnums=0))(
            xs[:-1], us
        )
        Vx_T = jax.grad(cost_final)(xs[-1])
        Vxx_T = jax.hessian(cost_final)(xs[-1])
        return A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T

    @jax.jit
    def backward(A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T):
        if cfg.parallel_backward:
            from gym_kmanip_tpu.solvers.parallel_lqr import (
                LQRProblem,
                backward_associative,
            )

            H = A.shape[0]
            prob = LQRProblem(
                A=A, B=B, d=jnp.zeros((H, n), dtype=A.dtype),
                Q=cxx, q=cx, R=cuu + cfg.reg * eye_u[None], r=cu, L=cux,
                Qf=Vxx_T, qf=Vx_T,
            )
            Ks, ks = backward_associative(prob)
            return ks, Ks

        def step(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
            Qx = cx_t + A_t.T @ Vx
            Qu = cu_t + B_t.T @ Vx
            Qxx = cxx_t + A_t.T @ Vxx @ A_t
            Quu = cuu_t + B_t.T @ Vxx @ B_t + cfg.reg * eye_u
            Qux = cux_t + B_t.T @ Vxx @ A_t
            Quu = 0.5 * (Quu + Quu.T)
            Kk = -jnp.linalg.solve(Quu, jnp.concatenate([Qu[:, None], Qux], axis=1))
            kff, K = Kk[:, 0], Kk[:, 1:]
            Vx_n = Qx + K.T @ Quu @ kff + K.T @ Qu + Qux.T @ kff
            Vxx_n = Qxx + K.T @ Quu @ K + K.T @ Qux + Qux.T @ K
            Vxx_n = 0.5 * (Vxx_n + Vxx_n.T)
            return (Vx_n, Vxx_n), (kff, K)

        (_, _), (ks, Ks) = jax.lax.scan(
            step, (Vx_T, Vxx_T), (A, B, cx, cu, cxx, cuu, cux), reverse=True
        )
        return ks, Ks

    @jax.jit
    def linesearch(x0, xs, us, ks, Ks):
        alphas = jnp.asarray(cfg.alphas, dtype=dtype)

        def forward(alpha):
            def body(x, inp):
                x_nom, u_nom, kff, K = inp
                u = jnp.clip(u_nom + alpha * kff + K @ (x - x_nom), lo, hi)
                x2 = f(x, u)
                return x2, (x2, u)

            _, (xs_tail, us_new) = jax.lax.scan(body, x0, (xs[:-1], us, ks, Ks))
            xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
            return xs_new, us_new, total_cost(xs_new, us_new)

        xs_c, us_c, costs_c = jax.vmap(forward)(alphas)
        best = jnp.argmin(costs_c)
        return xs_c[best], us_c[best], costs_c[best]

    return rollout0, derivs, backward, linesearch


_PIECES_CACHE = {}


def _pieces(model, cfg, state0, cost_xu, cost_final, dtype):
    key = (id(model), cfg, id(cost_xu), id(cost_final), str(dtype))
    if key not in _PIECES_CACHE:
        _PIECES_CACHE[key] = _build_pieces(
            model, cfg, state0, cost_xu, cost_final, dtype
        )
    return _PIECES_CACHE[key]


def ilqr_solve(
    model: RobotModel,
    cfg: ILQRConfig,
    state0: SimState,
    u_init: jax.Array,  # (H, nu)
    cost_xu: Callable,  # (x, u) -> scalar running cost
    cost_final: Optional[Callable] = None,  # (x) -> scalar
) -> ILQRResult:
    """iLQR with a host-side iteration loop over jitted pieces.

    Not itself jittable (by design -- see _build_pieces); each call reuses
    the compiled pieces, so per-iteration overhead is a handful of device
    dispatches.
    """
    if cost_final is None:
        cost_final = _zero_final
    rollout0, derivs, backward, linesearch = _pieces(
        model, cfg, state0, cost_xu, cost_final, u_init.dtype
    )
    x0 = flatten_state(state0)
    xs, cost = rollout0(x0, u_init)
    us = u_init
    trace = []
    for _ in range(cfg.n_iters):
        ks, Ks = backward(*derivs(xs, us))
        xs_c, us_c, cost_c = linesearch(x0, xs, us, ks, Ks)
        if bool(cost_c < cost):
            xs, us, cost = xs_c, us_c, cost_c
        trace.append(float(cost))
    return ILQRResult(
        us=us, xs=xs, cost=cost, cost_trace=jnp.asarray(trace, dtype=u_init.dtype)
    )


def _zero_final(x):
    return jnp.asarray(0.0, dtype=x.dtype)


def make_ilqr_solver(model: RobotModel, cfg: ILQRConfig, cost_xu, cost_final=None):
    """Solver handle: (state0, u_init) -> ILQRResult (host-loop driver)."""
    return partial(ilqr_solve, model, cfg, cost_xu=cost_xu, cost_final=cost_final)
