"""Headline benchmarks. Prints one JSON line per metric
({"metric", "value", "unit", "vs_baseline"}); the HEADLINE metric
(open-loop MPPI solves/s/chip at H=50 K=256) is printed LAST.

Metrics:
  * closed_loop_mpc_hz          — receding-horizon rate with the plant
    advanced by the env's full-fidelity 10x2ms contact step between
    solves (the examples/8_mpc_mppi.py production loop). vs the 50 Hz
    real-time control bar.
  * mppi_solves_per_sec_chip_H100_K256 — BASELINE.md's long-horizon row.
  * substep_flops / substep_rate / substep_mfu_pct — analytic FLOP count
    of one fused dynamics substep (XLA cost analysis of the jnp oracle
    path, backend-independent), the substep throughput implied by the
    H=50 bench, and the resulting model-FLOP utilization against f32
    peak. The substep is latency/HBM-bound (40-dim states, not GEMMs),
    so MFU is honest context for "speed of light", not a target.
  * mppi_solves_per_sec_chip_H50_K256 — headline (north star: >50/s).

The reference publishes no benchmarks (BASELINE.md); vs_baseline uses the
north-star bars noted per metric.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from gym_kmanip_tpu import constants as k
from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.dynamics.engine import make_control_step
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost
from gym_kmanip_tpu.mpc.mppi import (
    MPPIConfig,
    init_mppi,
    make_mppi_solver,
    mppi_solve,
)

N_SAMPLES = 256
N_SOLVES = 20

# f32 peak per chip for MFU context (TPU MXU peak is quoted in bf16; the
# substep kernel runs f32 vector ops, so use the f32 figure)
_F32_PEAK_BY_KIND = {
    "TPU v4": 137e12 / 2,
    "TPU v5 lite": 197e12 / 4,
    "TPU v5e": 197e12 / 4,
    "TPU v5p": 459e12 / 2,
    "TPU v6 lite": 918e12 / 4,
}


def _emit(metric, value, unit, vs):
    print(
        json.dumps(
            {"metric": metric, "value": round(value, 2), "unit": unit,
             "vs_baseline": round(vs, 3)}
        ),
        flush=True,
    )


def open_loop(model, cost_fn, horizon):
    """Throughput: N receding-horizon solves as one scanned on-device
    program against a frozen state (kernel throughput, not control)."""
    cfg = MPPIConfig(horizon=horizon, n_samples=N_SAMPLES, n_iters=1, n_substeps=1)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model)

    @jax.jit
    def run_solves(mppi_state, sim_state):
        def body(ms, _):
            ms2, u0, J = mppi_solve(model, cfg, ms, sim_state, cost_fn)
            return ms2, J

        return jax.lax.scan(body, mppi_state, None, length=N_SOLVES)

    ms, Js = run_solves(mppi_state, sim_state)  # compile
    jax.block_until_ready(Js)
    t0 = time.time()
    ms, Js = run_solves(mppi_state, sim_state)
    jax.block_until_ready(Js)
    return N_SOLVES / (time.time() - t0)


def closed_loop(model):
    """Receding-horizon MPC with the plant advanced by the full-fidelity
    env step between solves (examples/8_mpc_mppi.py recipe)."""
    def cost_fn(s, aux, u):
        d2 = jnp.sum((aux.tip_pos - s.cube_pos[None, :]) ** 2, axis=-1)
        touched = aux.touch_r | aux.touch_l
        return (
            50.0 * jnp.mean(d2)
            + 0.01 * jnp.sum(s.qvel**2)
            - jnp.where(touched, 5.0, 0.0)
            - jnp.where(touched & ~aux.touch_table, 10.0, 0.0)
        )

    cfg = MPPIConfig(
        horizon=20, n_samples=N_SAMPLES, n_iters=2, sigma=0.15,
        n_substeps=10, dt=k.PHYSICS_TIMESTEP, noise_beta=0.9,
    )
    solver = make_mppi_solver(model, cfg, cost_fn)
    plant_step = make_control_step(model)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model, cube_pos=np.array([0.15, 0.58, 0.62]))

    mppi_state, u0, J = solver(mppi_state, sim_state)  # compile
    sim_state2, aux = plant_step(sim_state, u0)
    jax.block_until_ready(sim_state2.qpos)

    n = 30
    t0 = time.time()
    for _ in range(n):
        mppi_state, u0, J = solver(mppi_state, sim_state)
        sim_state, aux = plant_step(sim_state, u0)
    jax.block_until_ready(sim_state.qpos)
    return n / (time.time() - t0)


def substep_flops(model):
    """Analytic FLOPs of ONE dynamics substep: XLA cost analysis of the
    jnp oracle path (dynamics/engine._substep_jnp), which computes the
    identical math the fused Pallas kernel executes."""
    from gym_kmanip_tpu.dynamics import engine

    state = init_state(model)
    state = state._replace(
        ctrl=jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32)
    )

    def one(state):
        new, _ = engine.substep(model, state, k.PHYSICS_TIMESTEP)
        return new

    try:
        an = jax.jit(one).lower(state).compile().cost_analysis()
        if isinstance(an, list):
            an = an[0]
        return float(an.get("flops", 0.0))
    except Exception:
        return 0.0


def ilqr_rate():
    """Fused single-dispatch iLQR (torso H=100, n_iters=10): solves/s.
    vs the 50 Hz real-time bar; r1 measured 0.33 s/solve (3 Hz)."""
    from gym_kmanip_tpu.ops import kinematics as kin
    from gym_kmanip_tpu.solvers.ilqr import (
        ILQRConfig, ilqr_solve, unflatten_state,
    )

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
    cfg = ILQRConfig(horizon=H, n_iters=10, contact=False)
    us = jnp.tile(
        jnp.asarray(model.home_qpos[: model.nu], dtype=jnp.float32), (H, 1)
    )
    r = ilqr_solve(model, cfg, state0, us, cost_xu)  # compile (~90 s)
    jax.block_until_ready(r.us)
    n = 5
    t0 = time.time()
    for _ in range(n):
        r = ilqr_solve(model, cfg, state0, us, cost_xu)
    jax.block_until_ready(r.us)
    return n / (time.time() - t0)


def main():
    model = get_model("solo_arm")
    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(model, s, aux, u, params)

    # the fused iLQR solve's one-time compile is minutes cold through the
    # AOT tunnel — opt-in so it can never sink the headline metrics
    # (tools/bench_suite.py carries the iLQR timing by default)
    if os.environ.get("BENCH_ILQR"):
        rate = ilqr_rate()
        _emit("ilqr_solves_per_sec_torso_H100_10iter", rate, "solves/s", rate / 50.0)

    cl_hz = closed_loop(model)
    _emit("closed_loop_mpc_hz_H20_K256_fullfidelity", cl_hz, "Hz", cl_hz / 50.0)

    s100 = open_loop(model, cost_fn, 100)
    _emit("mppi_solves_per_sec_chip_H100_K256", s100, "solves/s", s100 / 50.0)

    s50 = open_loop(model, cost_fn, 50)

    fl = substep_flops(model)
    if fl > 0:
        substep_rate = s50 * N_SAMPLES * 50  # substeps/s implied by H=50 bench
        kind = jax.devices()[0].device_kind
        peak = _F32_PEAK_BY_KIND.get(kind, 197e12 / 4)
        mfu = 100.0 * fl * substep_rate / peak
        _emit("substep_flops_analytic", fl, "flops", fl / 1e6)
        _emit(f"substep_mfu_pct_f32peak[{kind}]", mfu, "%", mfu / 100.0)

    _emit(f"mppi_solves_per_sec_chip_H50_K{N_SAMPLES}", s50, "solves/s", s50 / 50.0)


if __name__ == "__main__":
    main()
