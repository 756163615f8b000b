"""Decompose the headline MPPI solve's wall time on the real chip.

Times, at H=50 K=256 (the bench shapes):
  1. full solve            (bench.open_loop replica)
  2. noise sampling only   (AR(1) filtered draws)
  3. rollouts, trivial cost (no FK/site_pose in cost)
  4. rollouts, real cost
  5. bare scanned substeps (no aux/site machinery)

Methodology (see tools/exp_closure_capture.py for the why): each
component is compiled at TWO scan lengths (N1, N2) and the per-iteration
time is the SLOPE (t2-t1)/(N2-N1) — this cancels the fixed ~27 ms tunnel
round-trip that a single synced execution pays. Completion is forced by
host transfer (block_until_ready does not block on axon); inputs vary
per rep (identical executions are value-cached by the tunnel).

Run on TPU:  python tools/exp_profile_mppi.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import substep
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.mppi import (
    MPPIConfig, init_mppi, mppi_solve, sample_noise, sigma_per_actuator,
)
from gym_kmanip_tpu.mpc.rollout import rollout
from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost

H, K = 50, 256
N1, N2 = 100, 500


def slope_bench(name, make_run, *args):
    """make_run(n) -> jitted fn(*args, rep) scanning n iterations."""
    times = {}
    for n in (N1, N2):
        run = make_run(n)
        out = run(*args, 0)
        np.asarray(jax.tree.leaves(out)[-1])
        best = 1e9
        for rep in (1, 2, 3):
            t0 = time.time()
            out = run(*args, rep)
            np.asarray(jax.tree.leaves(out)[-1])
            best = min(best, time.time() - t0)
        times[n] = best
    per = (times[N2] - times[N1]) / (N2 - N1) * 1e3
    print(f"{name:34s} {per:7.4f} ms/iter   "
          f"(N{N1}={times[N1]*1e3:6.1f} ms, N{N2}={times[N2]*1e3:6.1f} ms)")
    return per


def main():
    model = get_model("solo_arm")
    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(model, s, aux, u, params)
    cfg = MPPIConfig(horizon=H, n_samples=K, n_iters=1, n_substeps=1)
    ms0 = init_mppi(model, cfg)
    s0 = init_state(model)
    sigma = sigma_per_actuator(model, cfg.sigma)  # numpy (host)

    def make_full(n):
        @jax.jit
        def f(ms, s, rep):
            ms = ms._replace(rng=jax.random.fold_in(ms.rng, rep))
            def body(c, _):
                c2, u0, J = mppi_solve(model, cfg, c, s, cost_fn)
                return c2, J
            return jax.lax.scan(body, ms, None, length=n)
        return f

    def make_noise(n):
        @jax.jit
        def f(key, rep):
            key = jax.random.fold_in(key, rep)
            def body(k_, _):
                k_, sub = jax.random.split(k_)
                eps = sample_noise(sub, K, H, model.nu, sigma, cfg.noise_beta)
                return k_, jnp.sum(eps)
            return jax.lax.scan(body, key, None, length=n)
        return f

    def triv_cost(s, aux, u):
        return jnp.sum(s.qvel ** 2)

    def make_rollouts(cf):
        def mk(n):
            @jax.jit
            def f(U, s, rep):
                U = U + 1e-6 * rep
                def body(c, _):
                    costs = jax.vmap(lambda u: rollout(
                        model, s, u, cf, n_substeps=1, dt=cfg.dt,
                        contact=True)[0])(c)
                    return c * 0.9999, jnp.min(costs)
                return jax.lax.scan(body, U, None, length=n)
            return f
        return mk

    def make_bare(n):
        @jax.jit
        def f(batch, s, rep):
            batch = jax.tree.map(
                lambda x: x if x.dtype.kind != "f" else x + 1e-6 * rep, batch
            )
            # carry the stepped states so the scan body is NOT
            # loop-invariant (XLA hoists an invariant body out of the
            # scan entirely and the slope reads zero)
            def body(c, _):
                def one(sub_s):
                    def inner(ss, _):
                        ss2, _aux = substep(model, ss, cfg.dt, contact=True,
                                            unrolled_solve=True)
                        return ss2, None
                    ss, _ = jax.lax.scan(inner, sub_s, None, length=H)
                    return ss
                c2 = jax.vmap(one)(c)
                return c2, jnp.sum(c2.qpos)
            return jax.lax.scan(body, batch, None, length=n)
        return f

    U = jnp.tile(jnp.asarray(model.home_qpos[: model.nu], jnp.float32), (K, H, 1))
    batch_states = jax.tree.map(lambda x: jnp.broadcast_to(x, (K,) + x.shape), s0)

    slope_bench("full solve", make_full, ms0, s0)
    slope_bench("noise sampling only", make_noise, jax.random.PRNGKey(0))
    slope_bench("rollouts trivial cost", make_rollouts(triv_cost), U, s0)
    slope_bench("rollouts real cost", make_rollouts(cost_fn), U, s0)
    slope_bench("bare scanned substeps", make_bare, batch_states, s0)


if __name__ == "__main__":
    main()
