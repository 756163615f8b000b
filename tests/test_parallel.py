"""Distributed tests on the virtual 8-device CPU mesh (conftest.py).

The standard fake-multihost pattern (SURVEY.md §4): shard_map fan-out must
run, reduce across devices, and improve over the unoptimized nominal just
like the single-device solver.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gym_kmanip_tpu.dynamics import init_state
from gym_kmanip_tpu.models import get_model
from gym_kmanip_tpu.mpc.cost import ee_tracking_cost
from gym_kmanip_tpu.mpc.mppi import MPPIConfig, init_mppi
from gym_kmanip_tpu.mpc.rollout import rollout
from gym_kmanip_tpu.ops import kinematics as kin
from gym_kmanip_tpu.parallel.mesh import make_mesh, make_sharded_mppi_solver


@pytest.fixture(scope="module")
def setup():
    solo = get_model("solo_arm")
    sim0 = init_state(solo)
    xpos, xquat, _ = kin.fk(solo, sim0.qpos)
    p, _ = kin.site_pose(solo, xpos, xquat, "eer_site")
    goal = p + jnp.asarray([0.0, 0.03, -0.03])
    cost_fn = lambda s, aux, u: ee_tracking_cost(solo, s, aux, u, goal)
    return solo, sim0, cost_fn


def test_mesh_spans_devices():
    mesh = make_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("rollout",)


def test_sharded_mppi_improves(setup):
    solo, sim0, cost_fn = setup
    n_dev = len(jax.devices())
    cfg = MPPIConfig(
        horizon=4, n_samples=2 * n_dev, n_iters=1, sigma=0.08, contact=False
    )
    mesh = make_mesh()
    solver = make_sharded_mppi_solver(solo, cfg, cost_fn, mesh)
    st = init_mppi(solo, cfg)
    J_hold, _ = rollout(solo, sim0, st.nominal, cost_fn, contact=False)
    st2, u0, J = solver(st, sim0)
    assert np.isfinite(float(J))
    assert not np.any(np.isnan(np.asarray(u0)))
    J_opt, _ = rollout(
        solo, sim0,
        jnp.concatenate([u0[None], st2.nominal[:-1]], axis=0),
        cost_fn, contact=False,
    )
    assert float(J_opt) <= float(J_hold) + 1e-6


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))
