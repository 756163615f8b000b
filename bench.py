"""Headline benchmark: MPC solves/sec/chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Metric: SoloArm cube-pick MPPI solves per second on one chip at horizon
H=50 with K=256 rollouts per solve (each rollout = 50 full articulated
dynamics steps with contacts). The reference publishes no benchmarks
(BASELINE.md); the north-star target is >50 solves/sec at H=50, so
vs_baseline is value/50.
"""

import json
import time

import jax
import jax.numpy as jnp

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.cost import CostParams, cube_pick_cost
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi, make_mppi_solver

HORIZON = 50
N_SAMPLES = 256
N_SOLVES = 20


def main():
    from gym_kmanip_tpu.mpc.mppi import mppi_solve

    model = get_model("solo_arm")
    params = CostParams()
    cost_fn = lambda s, aux, u: cube_pick_cost(model, s, aux, u, params)
    cfg = MPPIConfig(horizon=HORIZON, n_samples=N_SAMPLES, n_iters=1, n_substeps=1)
    mppi_state = init_mppi(model, cfg)
    sim_state = init_state(model)

    # the production MPC loop lives on-device: N receding-horizon solves as
    # one scanned program (no host round-trip per solve)
    @jax.jit
    def run_solves(mppi_state, sim_state):
        def body(ms, _):
            ms2, u0, J = mppi_solve(model, cfg, ms, sim_state, cost_fn)
            return ms2, J

        ms, Js = jax.lax.scan(body, mppi_state, None, length=N_SOLVES)
        return ms, Js

    ms, Js = run_solves(mppi_state, sim_state)  # compile
    jax.block_until_ready(Js)

    t0 = time.time()
    ms, Js = run_solves(mppi_state, sim_state)
    jax.block_until_ready(Js)
    dt = (time.time() - t0) / N_SOLVES
    solves_per_sec = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": f"mppi_solves_per_sec_chip_H{HORIZON}_K{N_SAMPLES}",
                "value": round(solves_per_sec, 2),
                "unit": "solves/s",
                "vs_baseline": round(solves_per_sec / 50.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
